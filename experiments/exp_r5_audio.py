"""Round-5: where does the wav2vec2 window cost go? (in-loop method)

Splits the 1.0-1.4 ms/window (b16) audio stage: feature extractor conv
stack, transformer encoder, per-sublayer (MHA vs FFN), and the ExprModelV3
head; probes an int8 Dense on the dominant matmul shapes.
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r5_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def time_looped(fn, x, iters: int) -> float:
    def body(i, acc):
        if jnp.issubdtype(x.dtype, jnp.floating):
            xi = x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-7, x.dtype))
        else:
            xi = x + (i % 2).astype(x.dtype)
        y = fn(xi)
        return acc + sum(
            l.astype(jnp.float32).sum() for l in jax.tree.leaves(y)
        ) * 1e-12

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from avcer_tpu.models.wav2vec2 import (
        EncoderLayerStableLN, FeatureEncoder, Wav2Vec2Config, Wav2Vec2Encoder,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    c = Wav2Vec2Config()
    wav16 = jnp.asarray(rng.standard_normal((16, 64000)).astype(np.float32))
    np.asarray(wav16[0, 0])

    # feature extractor
    try:
        fe = FeatureEncoder(c, dtype=jnp.bfloat16)
        fev = jax.device_put(fe.init(key, jnp.zeros((1, 4000), jnp.float32)))
        sec = time_looped(lambda x: fe.apply(fev, x), wav16, 100)
        emit({"name": "loop_feature_extractor_b16",
              "ms_per_window": round(sec / 16 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_feature_extractor", "error": repr(e)[:300]})

    # full encoder (extractor + 12 layers)
    try:
        enc = Wav2Vec2Encoder(c, dtype=jnp.bfloat16)
        ev = jax.device_put(enc.init(key, jnp.zeros((1, 4000), jnp.float32)))
        sec = time_looped(lambda x: enc.apply(ev, x), wav16, 60)
        emit({"name": "loop_encoder_full_b16",
              "ms_per_window": round(sec / 16 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_encoder_full", "error": repr(e)[:300]})

    # one transformer layer at the token shape (199 frames/window)
    h = jnp.asarray(rng.standard_normal((16, 199, 1024)), jnp.bfloat16)
    np.asarray(h[0, 0, 0])
    try:
        layer = EncoderLayerStableLN(c, dtype=jnp.bfloat16)
        lv = jax.device_put(
            layer.init(key, jnp.zeros((1, 199, 1024), jnp.float32), True)
        )
        sec = time_looped(lambda x: layer.apply(lv, x, True), h, 400)
        emit({"name": "loop_encoder_layer",
              "ms_per_window_12l": round(sec * 12 / 16 * 1e3, 4),
              "ms_per_call": round(sec * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_encoder_layer", "error": repr(e)[:300]})

    # dominant matmul: [3184, 1024] x [1024, 4096] bf16 vs int8
    try:
        a = jnp.asarray(rng.standard_normal((3184, 1024)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16)
        np.asarray(a[0, 0])
        sec_b = time_looped(lambda x: x @ w, a, 1500)
        ai = jnp.asarray(rng.integers(-127, 127, (3184, 1024)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (1024, 4096)), jnp.int8)

        def mm_i8(x):
            return jax.lax.dot_general(
                x, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        sec_i = time_looped(mm_i8, ai, 1500)
        emit({"name": "loop_mm_3184x1024x4096",
              "bf16_ms": round(sec_b * 1e3, 4),
              "int8_ms": round(sec_i * 1e3, 4),
              "speedup": round(sec_b / sec_i, 3)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_mm_int8", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
