"""CLI entry point: ``python -m avcer_tpu.cli.run --path_video V --path_save S``.

Public-surface parity with /root/reference/src/run.py:13-22 (same two core
flags, same outputs, same final real-time-factor printout, run.py:306-308)
plus framework knobs (detector bucket, mesh size, weight dir).
"""

from __future__ import annotations

import logging
import sys

from avcer_tpu.core.config import PipelineConfig, pipeline_config_from_args
from avcer_tpu.pipeline.builder import build_pipeline

log = logging.getLogger("avcer_tpu")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    # AVCER_PLATFORM=cpu|tpu forces the JAX backend (must happen before
    # backend init). Plain JAX_PLATFORMS also works unless a site plugin
    # overrides it, hence the dedicated knob.
    import os as _os

    from avcer_tpu.core.tpuenv import ensure_scoped_vmem

    ensure_scoped_vmem()  # fused Pallas chains need >16MiB scoped VMEM
    _plat = _os.environ.get("AVCER_PLATFORM")
    if _plat:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    cfg, path_video, path_save, profile_dir = pipeline_config_from_args(argv)
    # flagship defaults match the reference __main__ (run.py:346-355):
    # published Dirichlet weights + Rule 1 masking
    pipe = build_pipeline(cfg)

    import glob
    import os

    if os.path.isdir(path_video):  # batch serving over a directory of clips
        paths = sorted(
            p for p in glob.glob(os.path.join(path_video, "*"))
            if p.lower().endswith((".mp4", ".avi", ".mkv", ".mov", ".webm"))
        )
        if not paths:
            print(f"no videos found under {path_video}")
            return 1
        import time

        t0 = time.perf_counter()
        clips = pipe.run_many(paths, path_save)
        # actual elapsed time: per-clip walls overlap under run_many, and
        # the timings dict carries 'wall'/'audio_concurrent' entries that
        # must not be summed with the stage entries
        total_wall = time.perf_counter() - t0
        total_video = sum(c.total_frames / max(c.fps, 1) for c in clips)
        print(f"Processed {len(clips)} clips: "
              f"{total_video / max(total_wall, 1e-9):.2f} video-sec/sec")
        return 0

    print(f"Face images detection in video: {path_video}")
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            clip = pipe.run(path_video, path_save)
        print(f"Profiler trace written to {profile_dir}")
    else:
        clip = pipe.run(path_video, path_save)
    print("Compound expression prediction")
    rtf = clip.rtf
    for stage, sec in clip.timings.items():
        print(f"  {stage}: {sec:.3f}s")
    print(f"Real-time factor for compound expression prediction: {rtf:.2f}")
    wall = clip.timings.get("wall") or sum(
        v for k, v in clip.timings.items() if k not in ("wall", "audio_concurrent")
    )
    print(
        f"Throughput: {clip.total_frames / max(clip.fps, 1) / max(wall, 1e-9):.2f} video-sec/sec"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
