"""Bucket-vs-native detection-quality study (SURVEY §7 hard part #3,
VERDICT r1 item 4).

Trains a small synthetic-face detector (mobilenet0.25 RetinaFace, CPU),
then measures per-face-size recall + localization IoU of the full detect
stage at native resolution vs the 640/512/448 letterbox buckets on
1280x704 scenes. Writes JSON to experiments/bucket_quality.json; the table
is published in PARITY.md.

This measures the ARCHITECTURE-level drift (anchor coverage after
downscale + resize interpolation), which is what the bucket changes; it
does not measure the published checkpoint's learned scale robustness
(weights unavailable in this image).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from avcer_tpu.train import detection  # noqa: E402


def main() -> None:
    t0 = time.time()
    variables, losses = detection.train_synthetic_detector(
        steps=400, image_size=256, batch=4, face_size_range=(12, 160), seed=0
    )
    print(f"trained: loss {np.mean(losses[:10]):.3f} -> "
          f"{np.mean(losses[-10:]):.3f} in {time.time() - t0:.0f}s", flush=True)

    res = detection.evaluate_bucket_recall(
        variables,
        scene_hw=(704, 1280),
        buckets=[0, 640, 512, 448],
        size_bins=[16, 24, 32, 48, 96, 192],
        n_scenes=16,
        threshold=0.5,
    )
    out = {
        "loss_first10": float(np.mean(losses[:10])),
        "loss_last10": float(np.mean(losses[-10:])),
        "scene_hw": [704, 1280],
        "recall_by_bucket": {str(k): v for k, v in res.items()},
        "minutes": round((time.time() - t0) / 60, 1),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bucket_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["recall_by_bucket"], indent=1))


if __name__ == "__main__":
    main()
