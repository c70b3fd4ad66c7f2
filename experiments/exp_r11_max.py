"""Round-11 (build round 5): the `max` preset rows + audio-head knee.

The round-4 measured turbo composite (234.9-268 v-s/s) is no longer
detector-bound: at mnet@448 b128 the detector is 0.44 ms/video-sec while
the per-frame emotion CNN is 1.66 and the shared+int8 audio path 1.63.
Round 5 adds the `max` preset (turbo + static CNN at the dynamic step
cadence — cnn_stride=0, dynamic stream bit-exact, held static rows
between; core/config.py) which cuts the CNN term 5x, making audio ~68%
of the remaining budget. This session measures:

  1. the shared-extractor int8 audio HEAD at 64/128/256 windows per
     dispatch (slope method — the >5 ms programs where slope is valid;
     the in-loop fori wav2vec2 graph kills this relay's remote compiler,
     see exp_r9 post-mortem) — is there a batch knee like the mnet
     detector's b128?
  2. the crop-gather emotion CNN int8 at b256 (reference) and b512
     (plateau probe) — in-loop method;
  3. the composite `max` ladder row from measured rows only, plus the
     documented --audio_step 1.0 variant (window step within the
     reference's own sweep space, get_prob_audio_8_cl.py:141-172 `step`).

Results append to experiments/exp_r11_results.jsonl.
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
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "exp_r11_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def slope(call, n1: int, n2: int) -> float:
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
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1)


def time_looped(fn, x, iters: int) -> float:
    """In-loop method (BENCH_NOTES round-4) — safe for the CNN graph."""

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
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    rng = np.random.default_rng(0)
    emit({"name": "start_r11", "backend": jax.default_backend()})
    ms: dict[str, float] = {}

    # ---- 1. audio head batch knee (shared-extractor int8 path) -----------
    try:
        av = init_variables(
            ExprModel(variant="v3", num_classes=8,
                      wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16),
            (jnp.zeros((1, 64000), jnp.float32),))
        aq = AudioStage(av, AudioConfig(num_classes=8, head="v3",
                                        quant="int8", shared_extractor=True,
                                        batch_size=16),
                        Wav2Vec2Config(), dtype=jnp.bfloat16)
        clip_s = 960_000  # 60 s
        wav60 = jnp.asarray(
            rng.standard_normal(clip_s + 64_001).astype(np.float32))
        wl60 = jnp.asarray(clip_s, jnp.int32)
        n_win60 = (clip_s - 64_000) // 8_000 + 1  # 113
        sec_shared = slope(
            lambda: aq._jit_shared_features(aq.variables, wav60, wl60), 3, 12)
        ms["audio_shared_feats"] = sec_shared / n_win60 * 1e3
        emit({"name": "audio_shared_feats", "method": "slope",
              "ms_per_window": round(ms["audio_shared_feats"], 4)})
        feats60 = aq._jit_shared_features(aq.variables, wav60, wl60)
        jax.block_until_ready(feats60)
        for bw in (64, 128, 256):
            starts_h = jnp.asarray(
                ((np.arange(bw) % n_win60) * 8000).astype(np.int32))
            sec_head = slope(
                lambda s=starts_h: aq._jit_from_features(
                    aq.variables, feats60, s),
                3, 12)
            ms[f"audio_head_b{bw}"] = sec_head / bw * 1e3
            emit({"name": f"audio_head_b{bw}", "method": "slope",
                  "windows": bw,
                  "ms_per_window": round(ms[f"audio_head_b{bw}"], 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "audio_head_knee", "error": repr(e)[:300]})

    # ---- 2. emotion CNN int8 b256 vs b512 (crop-gather program) ----------
    try:
        from avcer_tpu.models.emotion_resnet import EmotionResNet50
        from avcer_tpu.models.temporal_lstm import TemporalLSTM
        from avcer_tpu.pipeline.visual import VisualStage

        sv = init_variables(
            EmotionResNet50(num_classes=7, dtype=jnp.bfloat16),
            (jnp.zeros((1, 224, 224, 3), jnp.float32),))
        lv = init_variables(
            TemporalLSTM(num_classes=7, dtype=jnp.bfloat16),
            (jnp.zeros((1, 10, 512), jnp.float32),))
        frames = rng.integers(0, 255, (32, 360, 640, 3), np.uint8)
        frames_dev = jnp.asarray(frames)
        jax.block_until_ready(frames_dev)
        for bc in (256, 512):
            vs = VisualStage(sv, lv, dtype=jnp.bfloat16, batch_size=bc,
                             quant="int8")
            vs.calibrate(rng.integers(0, 255, (8, 224, 224, 3), np.uint8))
            idx_b = jnp.asarray((np.arange(bc) % 32).astype(np.int32))
            boxes_b = jnp.asarray(
                np.tile(np.array([[160, 90, 480, 270]], np.int32), (bc, 1)))

            def fn(f, v=vs, i=idx_b, b=boxes_b):
                return v._static_from_frames_impl(v.static_variables, f, i, b)

            sec = time_looped(fn, frames_dev, 30)
            ms[f"cnn_int8_b{bc}"] = sec / bc * 1e3
            emit({"name": f"cnn_int8_b{bc}", "batch": bc,
                  "ms_per_frame": round(ms[f"cnn_int8_b{bc}"], 4)})
            del vs
    except Exception as e:  # noqa: BLE001
        emit({"name": "cnn_b512", "error": repr(e)[:300]})

    # ---- 3. composite max rows from measured numbers ----------------------
    # detector row from r9/r10 (mnet@448 int8 b128) read out of the r9 file
    det = None
    r9 = os.path.join(HERE, "exp_r9_results.jsonl")
    if os.path.exists(r9):
        for line in open(r9):
            r = json.loads(line)
            if r.get("name") == "serve_mnet_448_int8_b128" and \
                    "ms_per_frame" in r:
                det = r["ms_per_frame"]
    # fall back to the BENCH_r04 value if the row is absent locally
    det = det if det is not None else 0.0352
    head_best = min(
        (v for k, v in ms.items() if k.startswith("audio_head_b")),
        default=None)
    if head_best is not None and "audio_shared_feats" in ms:
        audio = ms["audio_shared_feats"] + head_best
        cnn = ms.get("cnn_int8_b256")
        if cnn is not None:
            fps = 25.0

            def comp(stride, cnn_frac, win_per_sec):
                per_sec = ((det / stride + cnn * cnn_frac) / 1e3 * fps
                           + audio / 1e3 * win_per_sec)
                return round(1.0 / per_sec, 1)

            emit({"name": "ladder_r11", "video_sec_per_sec": {
                "turbo_mnet_448_int8_s2": comp(2, 1.0, 2),
                "max_mnet_448_int8_s2_cs": comp(2, 0.2, 2),
                "max_plus_audio_step1": comp(2, 0.2, 1),
            }, "rows_ms": {k: round(v, 4) for k, v in ms.items()},
                "det_ms": det})
    emit({"name": "done_r11"})


if __name__ == "__main__":
    main()
