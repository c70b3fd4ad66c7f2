"""run_many overlap A/B (VERDICT r2 #8): what does the clip-overlap thread
pool actually buy in directory/batch serving mode?

Runs the SAME 4 synthetic clips through Pipeline.run_many with overlap=1
(strictly serial, the reference's structure) and overlap=2/3, wall-clock
timed after a warm-up pass that pays all compile costs. On this 1-core
relay host the decode+upload stage dominates and threads contend for the
single core, so the honest expectation is modest; the number is recorded
either way (BENCH_NOTES).

Usage: python experiments/exp_run_many_ab.py [--profile balanced]
Results append to experiments/exp_r6_results.jsonl as run_many_* records.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "exp_r6_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def make_clips(n: int, seconds: float = 8.0) -> list[str]:
    sys.path.insert(0, ROOT)
    from bench import make_clip

    paths = []
    for i in range(n):
        v = f"/tmp/ab_clip{i}.avi"
        w = f"/tmp/ab_clip{i}.wav"
        make_clip(v, w, seconds=seconds)
        paths.append(v)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="balanced")
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    from bench import ForceTopFace

    from avcer_tpu.core.config import pipeline_config_from_args
    from avcer_tpu.pipeline.builder import build_pipeline

    cfg, _, _, _ = pipeline_config_from_args(
        ["--path_video", "/tmp", "--path_save", "/tmp/ab_out",
         "--serving_profile", args.profile]
    )
    import dataclasses

    cfg = dataclasses.replace(
        cfg, save_probs=False, save_plot=False,
        weights_dir="/tmp/ab_no_weights",
    )
    pipe = build_pipeline(cfg)
    # random weights never clear the 0.8 threshold: force the top candidate
    # so the visual path does representative work (same trick as bench.py)
    h, w = (256, 448) if cfg.detector.long_side == 448 else (360, 640)
    pipe.detect = ForceTopFace(pipe.detect, h, w)
    paths = make_clips(args.clips, args.seconds)
    total_video_sec = args.clips * args.seconds

    save = "/tmp/ab_out"
    # warm-up: pays every compile + autotune cost once
    shutil.rmtree(save, ignore_errors=True)
    pipe.run_many(paths[:2], save, overlap=2)

    emit({"name": "run_many_ab_start", "profile": args.profile,
          "clips": args.clips, "clip_seconds": args.seconds})
    for overlap in (1, 2, 3):
        shutil.rmtree(save, ignore_errors=True)
        t0 = time.perf_counter()
        results = pipe.run_many(paths, save, overlap=overlap)
        dt = time.perf_counter() - t0
        assert len(results) == args.clips
        emit({"name": f"run_many_overlap{overlap}",
              "wall_s": round(dt, 2),
              "video_sec_per_sec": round(total_video_sec / dt, 3)})


if __name__ == "__main__":
    main()
