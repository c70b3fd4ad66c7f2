"""Face-detection demo CLI — the face_detection_test.py equivalent
(/root/reference/src/data/face_detection/face_detection_test.py:10-40):
runs a chosen detector (RetinaFace resnet50/mobilenet0.25, or S3FD) over a
video, prints per-frame face counts + fps, and optionally writes an
annotated copy.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="avcer-tpu face detection demo")
    p.add_argument("--input", "-i", required=True, help="video path")
    p.add_argument("--output", "-o", default="", help="annotated output video")
    p.add_argument("--method", "-m", default="retinaface",
                   choices=["retinaface", "s3fd"])
    p.add_argument("--weights", "-w", default="")
    p.add_argument("--benchmark", "-b", default="resnet50",
                   choices=["resnet50", "mobilenet0.25"])
    p.add_argument("--threshold", "-t", type=float, default=0.8)
    p.add_argument("--long_side", type=int, default=640)
    p.add_argument("--weights_dir", default="weights")
    a = p.parse_args(argv)
    from avcer_tpu.core.tpuenv import enable_compile_cache

    enable_compile_cache()  # persistent XLA cache (AVCER_COMPILE_CACHE=0 disables)

    import jax.numpy as jnp

    from avcer_tpu.core import checkpoint, convert
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.pipeline import media
    from avcer_tpu.pipeline.detect import DetectStage
    from avcer_tpu.pipeline.tracker import IoUTracker

    if a.method == "s3fd":
        from avcer_tpu.models.s3fd import S3FDNet
        from avcer_tpu.pipeline.detect_s3fd import S3FDStage

        cfg = DetectorConfig(threshold=a.threshold, long_side=a.long_side)
        variables = checkpoint.resolve(
            a.weights_dir, "s3fd", convert.convert_s3fd,
            S3FDNet(), (jnp.zeros((1, 64, 64, 3), jnp.float32),),
            torch_file=a.weights or "s3fd_weights.pth",
        )
        stage = S3FDStage(cfg, variables)
    else:
        cfg = DetectorConfig(backbone=a.benchmark, threshold=a.threshold,
                             long_side=a.long_side)
        variables = checkpoint.resolve(
            a.weights_dir, "retinaface", convert.convert_retinaface,
            RetinaFace(backbone=cfg.backbone),
            (jnp.zeros((1, 64, 64, 3), jnp.float32),),
            torch_file=a.weights or None,
            backbone=cfg.backbone,
        )
        stage = DetectStage(cfg, variables)
    tracker = IoUTracker(iou_threshold=cfg.tracker_iou)
    reader = media.VideoReader(a.input)

    boxes_per_frame = []
    t0 = time.perf_counter()
    n = 0
    for frames, n_valid in reader.batches(cfg.batch_size):
        det = stage(frames)
        for i in range(n_valid):
            kept = det.keep[i]
            rows = np.concatenate(
                [det.boxes[i][kept], det.scores[i][kept][:, None]], axis=1
            )
            tracker(rows)
            boxes_per_frame.append(rows[0] if len(rows) else None)
            n += 1
    wall = time.perf_counter() - t0
    found = sum(1 for b in boxes_per_frame if b is not None)
    print(f"{n} frames, faces on {found}, {n / max(wall, 1e-9):.1f} fps")

    if a.output:
        from avcer_tpu.utils.overlay import render_overlay_video

        probs = np.zeros((n, 7), np.float32)  # no emotion model in the demo
        render_overlay_video(a.input, a.output, boxes_per_frame, probs)
        print(f"annotated video written to {a.output}")
    reader.release()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
