"""Add profiles to an existing profile_drift.json (re-runs parity as the
diff base — ClipResults aren't persisted across runs).

Round-3 use: measure `int8_s2` (int8 r50@640 + detect stride 2 with box
interpolation, ~100+ modelled video-sec/sec) — the candidate for the
"parity-quality at >=100 v-s/s" serving point.

Usage: python experiments/exp_profile_drift_extra.py int8_s2 [more...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["AVCER_INT8_CPU_F32_ACCUM"] = "1"

import exp_profile_drift as base  # noqa: E402


def main() -> None:
    extra = sys.argv[1:] or ["int8_s2"]
    det_mnet = base.synth_detector("mobilenet0.25")
    det_r50 = base.synth_detector("resnet50")
    base.log("converting twin weights...")
    cnn_v, lstm_v, expr_v = base.twin_weights()
    clips, wavs = [], []
    for i in range(base.N_CLIPS):
        path = os.path.join("/tmp", f"drift_clip{i}.avi")
        wavs.append(base.write_clip(path, seed=10 + i))
        clips.append(path)
    base.log(f"{base.N_CLIPS} clips rendered")

    pipe = base.build_pipeline("parity", det_r50, det_mnet,
                               cnn_v, lstm_v, expr_v)
    parity_runs = [pipe.run(p, wav=w) for p, w in zip(clips, wavs)]
    base.log("parity base: done")

    with open(base.OUT) as f:
        doc = json.load(f)
    for profile in extra:
        pipe = base.build_pipeline(profile, det_r50, det_mnet,
                                   cnn_v, lstm_v, expr_v)
        recs = [base.compare(ref, pipe.run(p, wav=w))
                for ref, p, w in zip(parity_runs, clips, wavs)]
        base.log(f"profile {profile}: done")
        doc["per_clip"][profile] = recs
        doc["summary"][profile] = base.summarize(recs)
        with open(base.OUT, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({p: doc["summary"][p] for p in extra}, indent=1))


if __name__ == "__main__":
    main()
