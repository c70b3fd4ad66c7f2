"""Round-4d: int8 emotion-CNN device timing (crop-batch program, slope ok:
the batch-256 program is ~20 ms/dispatch)."""

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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r4d_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def barrier(x) -> None:
    np.asarray(jax.tree.leaves(x)[0])


def time_slope(fn, n1: int = 4, n2: int = 20) -> float:
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
    from avcer_tpu.models.emotion_resnet import EmotionResNet50
    from avcer_tpu.models.temporal_lstm import TemporalLSTM
    from avcer_tpu.pipeline.visual import VisualStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    static_vars = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    lstm_vars = TemporalLSTM(num_classes=7, dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 10, 512), jnp.float32)
    )
    frames = jnp.asarray(
        rng.integers(0, 255, (32, 360, 640, 3), np.uint8)
    )
    barrier(frames)
    bs = 256
    idx = jnp.asarray((np.arange(bs) % 32).astype(np.int32))
    boxes = jnp.asarray(
        np.tile(np.array([[160, 90, 480, 270]], np.int32), (bs, 1))
    )
    for quant in ("none", "int8"):
        try:
            stage = VisualStage(
                static_vars, lstm_vars, dtype=jnp.bfloat16, batch_size=bs,
                quant=quant,
            )
            sec = time_slope(
                lambda: stage._jit_static_from_frames(
                    stage.static_variables, frames, idx, boxes
                )
            )
            emit({"name": f"cnn_crop_b256_{quant}",
                  "ms_per_frame": round(sec / bs * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"cnn_{quant}", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
