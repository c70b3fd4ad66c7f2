"""Round-6c: batch-size MFU ladders for the EXACT-math serving path.

The balanced profile (exact r50@448 + exact audio) models ~94 v-s/s with
the batch sizes the presets currently use (detect b32, audio windows b16).
Both programs are below-peak MFU (audio encoder ~11% at b16), so the
cheapest remaining exact-math lever is batch: larger batches amortize
weight traffic and fill the MXU without touching any math per sample.

Ladders (in-loop method, experiments/exp_r4b_device.py provenance):
- r50@448 bf16: b16 / b32 / b64 / b128;
- r50@640 bf16: b32 / b64 (parity profile);
- exact audio window stack (extractor + 12-layer encoder + V3 head):
  b8 / b16 / b32 / b64;
- emotion CNN: b128 / b256 / b512.

Results append to exp_r6_results.jsonl as loop_batch_* records; serving
presets adopt any winner (pipeline/calibrate.py already probes for OOM
safety, so only the preset defaults move).
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "exp_r6_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def time_looped(fn, x, iters: int) -> float:
    """One dispatch, `iters` in-program executions (anti-LICM input perturb,
    anti-DCE output sum); returns seconds per execution."""

    def body(i, acc):
        xi = x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-7, x.dtype))
        y = fn(xi)
        s = sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(y))
        return acc + s * 1e-12

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    run()  # compile + warm
    t0 = time.perf_counter()
    float(run())
    return (time.perf_counter() - t0) / iters


def main() -> None:
    emit({"name": "start_r6c", "backend": jax.default_backend()})
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from avcer_tpu.models.retinaface import RetinaFace

    # ---- detector @448 / @640 batch ladder (exact bf16) --------------------
    for h, w, batches, iters in ((256, 448, (16, 32, 64, 128), 200),
                                 (360, 640, (32, 64), 100)):
        rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16)
        rv = jax.device_put(
            rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32)))
        for b in batches:
            try:
                x = jnp.asarray(
                    rng.standard_normal((b, h, w, 3)), jnp.bfloat16)
                np.asarray(x[0, 0, 0])
                sec = time_looped(
                    lambda t: rf.apply(rv, t), x, max(iters * 32 // b, 25))
                emit({"name": f"loop_batch_r50_{w}_b{b}",
                      "ms_per_frame": round(sec / b * 1e3, 4)})
            except Exception as e:  # noqa: BLE001
                emit({"name": f"loop_batch_r50_{w}_b{b}",
                      "error": repr(e)[:300]})

    # ---- exact audio window stack batch ladder ------------------------------
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config

    model = ExprModel(variant="v3", num_classes=8,
                      wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16)
    av = jax.device_put(
        model.init(key, jnp.zeros((1, 64000), jnp.float32)))
    for b in (8, 16, 32, 64):
        try:
            wav = jnp.asarray(
                rng.standard_normal((b, 64000)) * 0.1, jnp.float32)
            np.asarray(wav[0, 0])
            sec = time_looped(
                lambda t: model.apply(av, t), wav, max(320 // b, 4))
            emit({"name": f"loop_batch_audio_b{b}",
                  "ms_per_window": round(sec / b * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_batch_audio_b{b}", "error": repr(e)[:300]})

    # ---- emotion CNN batch ladder -------------------------------------------
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    cnn = EmotionResNet50(dtype=jnp.bfloat16)
    cv = jax.device_put(
        cnn.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32)))
    for b in (128, 256, 512):
        try:
            x = jnp.asarray(
                rng.standard_normal((b, 224, 224, 3)), jnp.bfloat16)
            np.asarray(x[0, 0, 0])
            sec = time_looped(
                lambda t: cnn.apply(cv, t, train=False), x,
                max(256 * 40 // b, 10))
            emit({"name": f"loop_batch_cnn_b{b}",
                  "ms_per_frame": round(sec / b * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_batch_cnn_b{b}", "error": repr(e)[:300]})

    emit({"name": "done_r6c"})


if __name__ == "__main__":
    main()
