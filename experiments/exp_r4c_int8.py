"""Round-4c: int8 detector end-to-end device timing (full jitted programs).

Full detect programs are large enough (>=5 ms/dispatch) for the slope
method; cross-checked r50@640 bf16 at 0.611 (slope) vs 0.543+overhead
(in-loop). Times the quantized path against it on both backbones.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r4c_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def barrier(x) -> None:
    np.asarray(jax.tree.leaves(x)[0])


def time_slope(fn, n1: int = 6, n2: int = 30) -> float:
    barrier(fn())
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n1):
            out = fn()
        barrier(out)
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n2):
            out = fn()
        barrier(out)
        tb = time.perf_counter() - t0
        vals.append((tb - ta) / (n2 - n1))
    return float(np.median(vals))


def main() -> None:
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.pipeline.detect import DetectStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})
    frames = rng.integers(0, 255, (32, 360, 640, 3), np.uint8)

    for backbone, buckets in (("resnet50", (640, 448)), ("mobilenet0.25", (640, 448))):
        vars_ = RetinaFace(backbone=backbone, dtype=jnp.bfloat16).init(
            key, jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        for bucket in buckets:
            for quant in ("none", "int8"):
                name = f"detect_{backbone.split('.')[0]}_{bucket}_{quant}"
                try:
                    cfg = DetectorConfig(
                        long_side=bucket, batch_size=32, backbone=backbone,
                        quant=quant,
                    )
                    stage = DetectStage(cfg, vars_, dtype=jnp.bfloat16)
                    wire_np, _ = stage.prepare_wire(frames)
                    wire = jnp.asarray(wire_np)
                    barrier(wire)
                    sec = time_slope(
                        lambda: stage._jit_forward(stage.variables, wire)
                    )
                    emit({"name": name,
                          "ms_per_frame": round(sec / 32 * 1e3, 4)})
                except Exception as e:  # noqa: BLE001
                    emit({"name": name, "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
