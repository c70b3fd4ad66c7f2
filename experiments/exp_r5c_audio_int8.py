"""Round-5c: int8 wav2vec2 stage end-to-end device timing (b16 windows,
full forward-from-wav program — large enough for slope timing)."""

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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r5c_results.jsonl")


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
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    variables = ExprModel(
        variant="v3", num_classes=8, wav2vec2_config=Wav2Vec2Config(),
        dtype=jnp.bfloat16,
    ).init(key, jnp.zeros((1, 4000), jnp.float32))

    wav_dev = jnp.asarray(
        rng.normal(size=200_001).astype(np.float32)
    )
    starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)
    wl = jnp.asarray(136_000, jnp.int32)
    barrier(wav_dev)

    for quant in ("none", "int8"):
        try:
            stage = AudioStage(
                variables, AudioConfig(quant=quant), dtype=jnp.bfloat16
            )
            sec = time_slope(
                lambda: stage._jit_forward_from_wav(
                    stage.variables, wav_dev, wl, starts, padding="mean"
                )
            )
            emit({"name": f"audio_b16_{quant}",
                  "ms_per_window": round(sec / 16 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"audio_{quant}", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
