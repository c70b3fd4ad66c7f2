"""Round-9 (build round 4): the MEASURED serving ladder.

The round-3 verdict's core complaint: key serving rows were projections
(post-stem-fix int8 r50 full programs never recorded — the r6b session
died at a relay disconnect before the `*_bf16stem` rows ran), and bench
timed out before printing the device ladder. This session measures every
row the ladder serves, as the FULL serving programs (DetectStage wire ->
normalize -> net -> decode -> NMS; VisualStage frame-gather -> crop ->
CNN; AudioStage wav-gather -> normalize -> wav2vec2 -> head), with the
trustworthy in-loop method (BENCH_NOTES round-4), in priority order so a
relay death still leaves the important rows recorded.

Rows:
  1. detect full-program: r50@640 bf16/int8, r50@448 bf16/int8 (the
     post-stem-fix int8 rows the verdict asked to measure, ref workload
     /root/reference/src/retina_face/retina_face_predictor.py:59-109)
  2. mnet@640/@448 int8 (fast/turbo profiles)
  3. b64 @448 probe: does doubling batch across clips buy MXU fill at
     the small bucket (run_many multi-clip batching lever)?
  4. emotion CNN b256 bf16/int8 (crop-gather path)
  5. audio full from-wav bf16/int8; shared-extractor turbo decomposition
  6. composite profile ladder from the measured rows only

Results append to experiments/exp_r9_results.jsonl.

POST-MORTEM (do not re-run sections 5+ as written): the in-loop
(fori_loop-wrapped) FULL 12-layer wav2vec2 graph is the one program the
relay's remote compiler has never survived — it broke the pipe here
(t=47 min) exactly as it killed the r6b session. exp_r9b_audio.py
re-measured the audio rows with the slope method (valid: >5 ms/dispatch)
and emitted the final ladder; bench.py uses slope for audio for the same
reason. Detect/CNN sections 1-4 are fine to re-run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

from avcer_tpu.core.tpuenv import ensure_scoped_vmem  # noqa: E402

ensure_scoped_vmem()

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
    """Per-call seconds: ONE dispatch of a jitted fori_loop running the
    program ``iters`` times on device (anti-LICM input perturbation,
    anti-DCE scalar reduction) — the only method this relay can't lie to
    for sub-5 ms programs (BENCH_NOTES round-4)."""

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


def main() -> None:
    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import AudioConfig, DetectorConfig
    from avcer_tpu.models.retinaface import RetinaFace
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.detect import DetectStage

    rng = np.random.default_rng(0)
    emit({"name": "start_r9", "backend": jax.default_backend(),
          "n_dev": jax.device_count()})
    try:
        blob = rng.standard_normal(22 * 1024 * 1024 // 4).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(blob)
        d.block_until_ready()
        emit({"name": "link_probe_r9",
              "h2d_MBps": round(22 / (time.perf_counter() - t0), 1)})
        del d, blob
    except Exception as e:  # noqa: BLE001
        emit({"name": "link_probe_r9", "error": repr(e)[:300]})

    frames640 = rng.integers(0, 255, (64, 360, 640, 3), np.uint8)
    ms = {}  # measured rows for the composite ladder

    # host-side init once per backbone (CPU backend — checkpoint.init_variables)
    r50_vars = init_variables(
        RetinaFace(backbone="resnet50", dtype=jnp.bfloat16),
        (jnp.zeros((1, 64, 64, 3), jnp.float32),))
    mnet_vars = init_variables(
        RetinaFace(backbone="mobilenet0.25", dtype=jnp.bfloat16),
        (jnp.zeros((1, 64, 64, 3), jnp.float32),))

    # ---- 1-3. full detect serving programs --------------------------------
    for tag, backbone, bucket, quant, bs, iters in (
        ("r50_640_int8", "resnet50", 640, "int8", 32, 150),
        ("r50_640_bf16", "resnet50", 640, "none", 32, 150),
        ("r50_448_int8", "resnet50", 448, "int8", 32, 300),
        ("r50_448_bf16", "resnet50", 448, "none", 32, 300),
        ("mnet_640_int8", "mobilenet0.25", 640, "int8", 32, 300),
        ("mnet_448_int8", "mobilenet0.25", 448, "int8", 32, 600),
        ("r50_448_int8_b64", "resnet50", 448, "int8", 64, 150),
        ("mnet_448_int8_b64", "mobilenet0.25", 448, "int8", 64, 300),
    ):
        try:
            stage = DetectStage(
                DetectorConfig(long_side=bucket, batch_size=bs,
                               backbone=backbone, quant=quant),
                r50_vars if backbone == "resnet50" else mnet_vars,
            )
            if quant == "int8":
                stage.calibrate(frames640[:8])
            wire_np, _scale = stage.prepare_wire(frames640[:bs])
            wire = jnp.asarray(wire_np)
            jax.block_until_ready(wire)
            sec = time_looped(
                lambda w, s=stage: s._forward_impl(s.variables, w),
                wire, iters)
            ms[tag] = sec / bs * 1e3
            emit({"name": f"serve_{tag}", "batch": bs,
                  "ms_per_frame": round(ms[tag], 4)})
            del stage, wire
        except Exception as e:  # noqa: BLE001
            emit({"name": f"serve_{tag}", "error": repr(e)[:300]})

    # ---- 4. emotion CNN b256, crop-gather path ----------------------------
    from avcer_tpu.models.emotion_resnet import EmotionResNet50
    from avcer_tpu.models.temporal_lstm import TemporalLSTM
    from avcer_tpu.pipeline.visual import VisualStage

    sv = init_variables(EmotionResNet50(num_classes=7, dtype=jnp.bfloat16),
                        (jnp.zeros((1, 224, 224, 3), jnp.float32),))
    lv = init_variables(TemporalLSTM(num_classes=7, dtype=jnp.bfloat16),
                        (jnp.zeros((1, 10, 512), jnp.float32),))
    frames_dev = jnp.asarray(frames640[:32])
    jax.block_until_ready(frames_dev)
    idx_b = jnp.asarray((np.arange(256) % 32).astype(np.int32))
    boxes_b = jnp.asarray(
        np.tile(np.array([[160, 90, 480, 270]], np.int32), (256, 1)))
    for quant in ("none", "int8"):
        try:
            vs = VisualStage(sv, lv, dtype=jnp.bfloat16, batch_size=256,
                             quant=quant)
            if quant == "int8":
                crops = rng.integers(0, 255, (8, 224, 224, 3), np.uint8)
                vs.calibrate(crops)

            def fn(f, v=vs):
                return v._static_from_frames_impl(
                    v.static_variables, f, idx_b, boxes_b)

            sec = time_looped(fn, frames_dev, 30)
            ms[f"cnn_{quant}"] = sec / 256 * 1e3
            emit({"name": f"serve_cnn_{quant}", "batch": 256,
                  "ms_per_frame": round(ms[f"cnn_{quant}"], 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"serve_cnn_{quant}", "error": repr(e)[:300]})

    # ---- 5. audio full from-wav + shared-extractor turbo ------------------
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.pipeline.audio_stage import AudioStage

    av = init_variables(
        ExprModel(variant="v3", num_classes=8,
                  wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16),
        (jnp.zeros((1, 64000), jnp.float32),))
    wav = jnp.asarray(rng.standard_normal(200_001), jnp.float32)
    wl = jnp.asarray(136_000, jnp.int32)
    starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)
    for quant in ("none", "int8"):
        try:
            stage = AudioStage(
                av, AudioConfig(num_classes=8, head="v3", quant=quant,
                                batch_size=16),
                Wav2Vec2Config(), dtype=jnp.bfloat16)

            def body(i, acc, s=stage):
                wi = wav * (1.0 + i.astype(jnp.float32) * 1e-7)
                y = s._forward_from_wav_impl(
                    s.variables, wi, wl, starts, padding="mean")
                return acc + y.sum() * 1e-12

            @jax.jit
            def run():
                return jax.lax.fori_loop(0, 40, body,
                                         jnp.zeros((), jnp.float32))

            np.asarray(run())
            t0 = time.perf_counter()
            np.asarray(run())
            sec = (time.perf_counter() - t0) / 40
            ms[f"audio_{quant}"] = sec / 16 * 1e3
            emit({"name": f"serve_audio_{quant}", "windows": 16,
                  "ms_per_window": round(ms[f"audio_{quant}"], 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"serve_audio_{quant}", "error": repr(e)[:300]})

    # shared-extractor turbo: conv features once per clip + int8 head per
    # window; amortized over a 60 s wav (113 windows)
    try:
        aq = AudioStage(av, AudioConfig(num_classes=8, head="v3", quant="int8",
                                        shared_extractor=True, batch_size=16),
                        Wav2Vec2Config(), dtype=jnp.bfloat16)
        wav60 = jnp.asarray(
            rng.standard_normal(960_000 + 64_001).astype(np.float32))
        wl60 = jnp.asarray(960_000, jnp.int32)
        n_win60 = (960_000 - 64_000) // 8_000 + 1

        def shared(w, a=aq):
            return a._shared_features_impl(a.variables, w, wl60)

        sec_shared = time_looped(shared, wav60, 10)
        feats60 = aq._jit_shared_features(aq.variables, wav60, wl60)
        jax.block_until_ready(feats60)

        def head(f, a=aq):
            return a._from_features_impl(a.variables, f, starts)

        sec_head = time_looped(head, feats60, 300)
        ms["audio_turbo"] = (sec_shared / n_win60 + sec_head / 16) * 1e3
        emit({"name": "serve_audio_turbo",
              "shared_ms_per_window": round(sec_shared / n_win60 * 1e3, 4),
              "head_ms_per_window": round(sec_head / 16 * 1e3, 4),
              "ms_per_window": round(ms["audio_turbo"], 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "serve_audio_turbo", "error": repr(e)[:300]})

    # ---- 6. composite ladder from measured rows only ----------------------
    fps = 25.0

    def vss(det_key, stride=1, cnn="cnn_none", audio="audio_none"):
        if det_key not in ms or cnn not in ms or audio not in ms:
            return None
        per_sec = ((ms[det_key] / stride + ms[cnn]) / 1e3 * fps
                   + ms[audio] / 1e3 * 2)
        return round(1.0 / per_sec, 1)

    ladder = {
        "parity_r50_640": vss("r50_640_bf16"),
        "balanced_r50_448": vss("r50_448_bf16"),
        "int8_r50_640": vss("r50_640_int8", 1, "cnn_int8", "audio_int8"),
        "int8_r50_640_s2": vss("r50_640_int8", 2, "cnn_int8", "audio_int8"),
        "int8_r50_448": vss("r50_448_int8", 1, "cnn_int8", "audio_int8"),
        "int8_r50_448_s2": vss("r50_448_int8", 2, "cnn_int8", "audio_int8"),
        "fast_mnet_640_int8": vss("mnet_640_int8", 1, "cnn_int8",
                                  "audio_int8"),
        "turbo_mnet_448_int8_s2": vss("mnet_448_int8", 2, "cnn_int8",
                                      "audio_turbo"),
    }
    emit({"name": "ladder_r9", "video_sec_per_sec": ladder,
          "rows_ms": {k: round(v, 4) for k, v in ms.items()}})
    emit({"name": "done_r9"})


if __name__ == "__main__":
    main()
