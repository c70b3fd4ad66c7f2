"""Round-2 device experiments (VERDICT.md item 1): find the detector wall.

Measures, on the real chip, with the fetch-barrier slope method (the relay's
block_until_ready is unreliable — see memory notes):

- RetinaFace full program at buckets 640/512/448, batch 32/64, r50 + mnet
- ablations: stem-only, backbone-only, decode+NMS-only
- int8 vs bf16 conv probe (is int8 conv supported + faster on this chip?)
- crop-CNN batch 256/512 and plain (pre-cropped) CNN
- audio window batch 16/32
- Pallas kernels vs XLA twins (NMS, MHA) + the bf16 LSTM compile attempt

One process = one compile session (remote compiles are never cached across
processes here). Appends JSON lines to experiments/exp_r2_results.jsonl as
each result lands, so a crash keeps partial data.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp

T0 = time.time()
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r2_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def barrier(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf)


def time_slope(fn, n1: int = 3, n2: int = 15) -> float:
    """Per-dispatch seconds: run n1 then n2 dispatches, each followed by one
    fetch barrier; the slope cancels the constant fetch latency."""
    barrier(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n1):
        out = fn()
    barrier(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = fn()
    barrier(out)
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1)


class Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise Timeout()


def main() -> None:
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import (
        ResNet50Backbone, RetinaFace,
    )
    from avcer_tpu.pipeline.detect import DetectStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    # shared random weights per backbone (init once at a tiny shape)
    r50_vars = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    mnet_vars = RetinaFace(backbone="mobilenet0.25", dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    frames_native = rng.integers(0, 255, (64, 360, 640, 3), np.uint8)

    # ---- detector variants ------------------------------------------------
    for name, backbone, bucket, b, variables in [
        ("detect_r50_640_b32", "resnet50", 640, 32, r50_vars),
        ("detect_r50_512_b32", "resnet50", 512, 32, r50_vars),
        ("detect_r50_448_b32", "resnet50", 448, 32, r50_vars),
        ("detect_r50_640_b64", "resnet50", 640, 64, r50_vars),
        ("detect_mnet_640_b32", "mobilenet0.25", 640, 32, mnet_vars),
    ]:
        try:
            cfg = DetectorConfig(backbone=backbone, long_side=bucket, batch_size=b)
            stage = DetectStage(cfg, variables, dtype=jnp.bfloat16)
            wire_np, scale = stage.prepare_wire(frames_native[:b])
            wire = jnp.asarray(wire_np)
            barrier(wire)
            sec = time_slope(lambda: stage._jit_forward(stage.variables, wire))
            emit({"name": name, "ms_per_frame": round(sec / b * 1e3, 4),
                  "wire_shape": list(wire_np.shape)})
        except Exception as e:  # keep going
            emit({"name": name, "error": repr(e)[:300]})

    # ---- ablations at the 640 bucket, batch 32 ----------------------------
    import flax.linen as nn

    from avcer_tpu.models.layers import TorchBatchNorm

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=jnp.bfloat16, name="conv1")(x)
            h = TorchBatchNorm(dtype=jnp.bfloat16, name="bn1")(h, True)
            h = nn.relu(h)
            return nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    x640 = jnp.asarray(
        rng.standard_normal((32, 360, 640, 3)).astype(np.float32), jnp.bfloat16
    )
    barrier(x640)
    try:
        stem = StemOnly()
        sv = stem.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
        f = jax.jit(lambda v, x: stem.apply(v, x))
        sec = time_slope(lambda: f(sv, x640))
        emit({"name": "ablate_stem_640_b32", "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:
        emit({"name": "ablate_stem_640_b32", "error": repr(e)[:300]})

    try:
        bb = ResNet50Backbone(dtype=jnp.bfloat16)
        bv = bb.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
        f = jax.jit(lambda v, x: bb.apply(v, x))
        sec = time_slope(lambda: f(bv, x640))
        emit({"name": "ablate_backbone_640_b32", "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:
        emit({"name": "ablate_backbone_640_b32", "error": repr(e)[:300]})

    # decode + topk + NMS only, at 640-bucket anchor count
    from avcer_tpu.ops import boxes as box_ops
    from avcer_tpu.ops import nms as nms_ops

    priors_np = box_ops.prior_boxes((360, 640))
    a = priors_np.shape[0]
    loc = jnp.asarray(rng.standard_normal((32, a, 4)).astype(np.float32))
    conf = jnp.asarray(rng.random((32, a)).astype(np.float32))
    landms_r = jnp.asarray(rng.standard_normal((32, a, 10)).astype(np.float32))
    priors = jnp.asarray(priors_np)

    def decode_nms(loc, conf, landms):
        scale = jnp.asarray([640, 360, 640, 360], jnp.float32)
        boxes = box_ops.decode_boxes(loc, priors) * scale
        lscale = jnp.tile(jnp.asarray([640, 360], jnp.float32), 5)
        lm = box_ops.decode_landmarks(landms, priors) * lscale
        cb, cs, valid, idx = nms_ops.topk_candidates(boxes, conf, 64, 0.8)
        keep = nms_ops.nms_mask(cb, valid, 0.4)
        clm = jnp.take_along_axis(lm, idx[..., None], axis=1)
        return jnp.concatenate(
            [cb, cs[..., None], keep.astype(jnp.float32)[..., None], clm], axis=-1
        )

    try:
        f = jax.jit(decode_nms)
        sec = time_slope(lambda: f(loc, conf, landms_r))
        emit({"name": "ablate_decode_nms_640_b32", "anchors": int(a),
              "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:
        emit({"name": "ablate_decode_nms_640_b32", "error": repr(e)[:300]})

    # ---- int8 vs bf16 conv probe ------------------------------------------
    # layer3-ish shape: [32, 45, 80, 512] x 3x3x512x512
    xi8 = jnp.asarray(rng.integers(-127, 127, (32, 45, 80, 512), np.int8))
    wi8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 512, 512), np.int8))
    xbf = xi8.astype(jnp.bfloat16)
    wbf = wi8.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(xi8.shape, wi8.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, ptype):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=ptype,
        )

    try:
        f = jax.jit(lambda x, w: conv(x, w, jnp.bfloat16))
        sec_bf = time_slope(lambda: f(xbf, wbf))
        emit({"name": "probe_conv_bf16", "ms": round(sec_bf * 1e3, 4)})
        f8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
        sec_i8 = time_slope(lambda: f8(xi8, wi8))
        emit({"name": "probe_conv_int8", "ms": round(sec_i8 * 1e3, 4),
              "speedup_vs_bf16": round(sec_bf / sec_i8, 2)})
    except Exception as e:
        emit({"name": "probe_conv_int8", "error": repr(e)[:300]})

    # ---- CNN batch scaling --------------------------------------------------
    from avcer_tpu.models.emotion_resnet import EmotionResNet50
    from avcer_tpu.ops.image import crop_and_resize_onehot, vggface_normalize

    cnn = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16)
    cnn_vars = cnn.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
    frames_dev = jnp.asarray(frames_native[:32])
    barrier(frames_dev)

    def crop_cnn(v, frames, idx, boxes):
        crops = crop_and_resize_onehot(frames, idx, boxes, 224)
        logits, feats = cnn.apply(v, vggface_normalize(crops))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.concatenate([probs, feats.astype(jnp.float32)], axis=-1)

    jf = jax.jit(crop_cnn)
    for bs in (256, 512):
        try:
            idx = jnp.asarray((np.arange(bs) % 32).astype(np.int32))
            bxs = jnp.asarray(np.tile(np.array([[160, 90, 480, 270]], np.int32), (bs, 1)))
            sec = time_slope(lambda: jf(cnn_vars, frames_dev, idx, bxs), n1=2, n2=8)
            emit({"name": f"cnn_crop_b{bs}", "ms_per_frame": round(sec / bs * 1e3, 4)})
        except Exception as e:
            emit({"name": f"cnn_crop_b{bs}", "error": repr(e)[:300]})

    try:
        crops256 = jnp.asarray(rng.integers(0, 255, (256, 224, 224, 3), np.uint8))
        barrier(crops256)

        def plain_cnn(v, c):
            logits, feats = cnn.apply(v, vggface_normalize(c))
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        jp = jax.jit(plain_cnn)
        sec = time_slope(lambda: jp(cnn_vars, crops256), n1=2, n2=8)
        emit({"name": "cnn_plain_b256", "ms_per_frame": round(sec / 256 * 1e3, 4)})
    except Exception as e:
        emit({"name": "cnn_plain_b256", "error": repr(e)[:300]})

    # ---- audio batch scaling ------------------------------------------------
    try:
        from avcer_tpu.core.config import AudioConfig
        from avcer_tpu.models.audio_heads import ExprModel
        from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
        from avcer_tpu.pipeline.audio_stage import AudioStage

        w2v2 = Wav2Vec2Config()
        am = ExprModel(variant="v3", num_classes=8, wav2vec2_config=w2v2)
        avars = am.init(key, jnp.zeros((1, 64000), jnp.float32))
        astage = AudioStage(avars, AudioConfig(), w2v2, dtype=jnp.bfloat16)
        wav_dev = jnp.asarray(rng.standard_normal(400_001).astype(np.float32))
        barrier(wav_dev)
        for nb in (16, 32):
            starts = jnp.asarray((np.arange(nb) * 8000).astype(np.int32))
            sec = time_slope(
                lambda: astage._jit_forward_from_wav(
                    astage.variables, wav_dev, jnp.asarray(16_000, jnp.int32),
                    starts, padding="mean",
                ),
                n1=2, n2=8,
            )
            emit({"name": f"audio_b{nb}", "ms_per_window": round(sec / nb * 1e3, 4)})
    except Exception as e:
        emit({"name": "audio_batch", "error": repr(e)[:300]})

    # ---- Pallas kernels vs XLA twins ---------------------------------------
    try:
        from avcer_tpu.ops.pallas.nms_kernel import pallas_nms_mask

        cb = jnp.asarray(rng.random((32, 64, 4)).astype(np.float32) * 600)
        cb = cb.at[..., 2:].set(cb[..., :2] + 10 + cb[..., 2:] * 0.2)
        valid = jnp.asarray(rng.random((32, 64)) > 0.3)
        sec_x = time_slope(lambda: nms_ops.nms_mask(cb, valid, 0.4))
        sec_p = time_slope(lambda: pallas_nms_mask(cb, valid, 0.4))
        emit({"name": "kernel_nms", "xla_ms": round(sec_x * 1e3, 4),
              "pallas_ms": round(sec_p * 1e3, 4)})
    except Exception as e:
        emit({"name": "kernel_nms", "error": repr(e)[:300]})

    try:
        from avcer_tpu.models.layers import scaled_dot_attention
        from avcer_tpu.ops.pallas.attention_kernel import pallas_mha

        q = jnp.asarray(rng.standard_normal((16, 32, 200, 32)).astype(np.float32),
                        jnp.bfloat16)
        kk = q + 0.1
        v = q - 0.1
        jx = jax.jit(scaled_dot_attention)
        sec_x = time_slope(lambda: jx(q, kk, v))
        jpm = jax.jit(pallas_mha)
        sec_p = time_slope(lambda: jpm(q, kk, v))
        emit({"name": "kernel_mha", "xla_ms": round(sec_x * 1e3, 4),
              "pallas_ms": round(sec_p * 1e3, 4)})
    except Exception as e:
        emit({"name": "kernel_mha", "error": repr(e)[:300]})

    # ---- Pallas LSTM bf16 compile attempt (alarm-guarded, LAST) ------------
    try:
        from avcer_tpu.models.temporal_lstm import TemporalLSTM
        from avcer_tpu.ops.pallas.lstm_kernel import (
            pack_lstm_params, pallas_lstm_forward,
        )

        lm = TemporalLSTM(num_classes=7, dtype=jnp.bfloat16)
        lv = lm.init(key, jnp.zeros((1, 10, 512), jnp.float32))
        packed = tuple(p.astype(jnp.bfloat16) for p in pack_lstm_params(lv))
        wnd = jnp.asarray(
            rng.standard_normal((32, 10, 512)).astype(np.float32), jnp.bfloat16
        )
        jlx = jax.jit(lambda v, x: lm.apply(v, x).astype(jnp.float32))
        sec_x = time_slope(lambda: jlx(lv, wnd))
        emit({"name": "kernel_lstm_xla", "ms": round(sec_x * 1e3, 4)})
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(300)
        try:
            sec_p = time_slope(lambda: pallas_lstm_forward(wnd, *packed))
            emit({"name": "kernel_lstm_pallas_bf16", "ms": round(sec_p * 1e3, 4)})
        finally:
            signal.alarm(0)
    except Timeout:
        emit({"name": "kernel_lstm_pallas_bf16", "error": "compile timeout >300s"})
    except Exception as e:
        emit({"name": "kernel_lstm_pallas_bf16", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
