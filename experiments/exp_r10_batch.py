"""Round-10: batch-fill probes for the post-ladder turbo budget.

After round-9's measured ladder, turbo's cost is dominated by the
emotion CNN (0.067 ms/frame at b256 int8) and the shared-audio head
(0.623 ms/window at 64 windows/dispatch). Both are batch-dimension
programs — probe whether larger batches buy more MXU fill the way
b32->b64 bought 1.44x on the mnet@448 detector:

  - emotion CNN int8, crop-gather path, b256 vs b512 (in-loop);
  - int8 audio head (shared-extractor mode) at 64 vs 128 windows/dispatch
    (slope — the in-loop wav2vec2 graph kills the relay compiler);
  - mnet@448 int8 detect at b128 (does the b64 win extend?).

Results append to experiments/exp_r9_results.jsonl (same session family).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "exp_r9_results.jsonl")


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
        s = sum(l.astype(jnp.float32).sum() for l in jax.tree.leaves(y))
        return acc + s * 1e-12

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters


def slope(call, n1, n2):
    jax.block_until_ready(call())
    t0 = time.perf_counter()
    out = None
    for _ in range(n1):
        out = call()
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = call()
    jax.block_until_ready(out)
    return ((time.perf_counter() - t0) - ta) / (n2 - n1)


def main() -> None:
    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import AudioConfig, DetectorConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.emotion_resnet import EmotionResNet50
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.models.temporal_lstm import TemporalLSTM
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage
    from avcer_tpu.pipeline.detect import DetectStage
    from avcer_tpu.pipeline.visual import VisualStage

    rng = np.random.default_rng(0)
    emit({"name": "start_r10", "backend": jax.default_backend()})
    frames = rng.integers(0, 255, (128, 360, 640, 3), np.uint8)

    # ---- CNN int8 batch sweep --------------------------------------------
    sv = init_variables(EmotionResNet50(num_classes=7, dtype=jnp.bfloat16),
                        (jnp.zeros((1, 224, 224, 3), jnp.float32),))
    lv = init_variables(TemporalLSTM(num_classes=7, dtype=jnp.bfloat16),
                        (jnp.zeros((1, 10, 512), jnp.float32),))
    frames_dev = jnp.asarray(frames[:32])
    jax.block_until_ready(frames_dev)
    for bs, iters in ((256, 30), (384, 20), (512, 15)):
        try:
            idx_b = jnp.asarray((np.arange(bs) % 32).astype(np.int32))
            boxes_b = jnp.asarray(
                np.tile(np.array([[160, 90, 480, 270]], np.int32), (bs, 1)))
            vs = VisualStage(sv, lv, dtype=jnp.bfloat16, batch_size=bs,
                             quant="int8")
            vs.calibrate(rng.integers(0, 255, (8, 224, 224, 3), np.uint8))
            sec = time_looped(
                lambda f, v=vs, i=idx_b, b=boxes_b:
                v._static_from_frames_impl(v.static_variables, f, i, b),
                frames_dev, iters)
            emit({"name": f"serve_cnn_int8_b{bs}",
                  "ms_per_frame": round(sec / bs * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"serve_cnn_int8_b{bs}", "error": repr(e)[:300]})

    # ---- audio head windows/dispatch sweep -------------------------------
    try:
        av = init_variables(
            ExprModel(variant="v3", num_classes=8,
                      wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16),
            (jnp.zeros((1, 64000), jnp.float32),))
        aq = AudioStage(av, AudioConfig(num_classes=8, head="v3",
                                        quant="int8", shared_extractor=True,
                                        batch_size=16),
                        Wav2Vec2Config(), dtype=jnp.bfloat16)
        wav60 = jnp.asarray(
            rng.standard_normal(960_000 + 64_001).astype(np.float32))
        wl60 = jnp.asarray(960_000, jnp.int32)
        feats60 = aq._jit_shared_features(aq.variables, wav60, wl60)
        jax.block_until_ready(feats60)
        for nw, (n1, n2) in ((64, (4, 20)), (113, (4, 16)), (32, (6, 30))):
            starts_h = jnp.asarray(np.arange(nw, dtype=np.int32) * 8000)
            sec = slope(
                lambda s=starts_h: aq._jit_from_features(
                    aq.variables, feats60, s), n1, n2)
            emit({"name": f"serve_audio_head_w{nw}",
                  "ms_per_window": round(sec / nw * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "serve_audio_head_sweep", "error": repr(e)[:300]})

    # ---- mnet@448 int8 b128 ----------------------------------------------
    try:
        mnet_vars = init_variables(
            RetinaFace(backbone="mobilenet0.25", dtype=jnp.bfloat16),
            (jnp.zeros((1, 64, 64, 3), jnp.float32),))
        stage = DetectStage(
            DetectorConfig(long_side=448, batch_size=128,
                           backbone="mobilenet0.25", quant="int8"),
            mnet_vars)
        stage.calibrate(frames[:8])
        wire_np, _s = stage.prepare_wire(frames)
        wire = jnp.asarray(wire_np)
        jax.block_until_ready(wire)
        sec = time_looped(
            lambda w, s=stage: s._forward_impl(s.variables, w), wire, 150)
        emit({"name": "serve_mnet_448_int8_b128",
              "ms_per_frame": round(sec / 128 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "serve_mnet_448_int8_b128", "error": repr(e)[:300]})

    emit({"name": "done_r10"})


if __name__ == "__main__":
    main()
