"""Round-6 (build round 3) device experiments: where do the serving
profiles lose their int8 gains, and what exact transforms are left?

In-loop method (see exp_r4b_device.py): K executions inside one jitted
lax.fori_loop, anti-LICM input perturb, anti-DCE output sum. Results append
to exp_r6_results.jsonl.

Measurements:
1. link probe (h2d MB/s, fetch latency) — varies per round (memory note);
2. detect r50@640: bf16 vs int8 full + INT8 cumulative section ablation
   (the bf16 ablation exists from r4b; int8 full was only measured
   end-to-end: 1.29x where the 3x3/256 kernel alone does 1.85x — find the
   sections that don't convert);
3. r50@448 bf16/int8 (the q448 parity-quality candidate profile);
4. mnet@448 + mnet@640 int8 cross-checks (turbo/fast detect cost);
5. emotion CNN bf16 vs int8 full + int8 cumulative ablation (recorded
   1.12x only);
6. emotion CNN stem: plain vs s2d reformulation (raw conv candidates);
7. audio encoder layer + conv extractor bf16 vs int8; fused-QKV candidate
   (one [1024,3072] matmul vs three [1024,1024] — exact transform).
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r6_results.jsonl")


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


def calibrated(model, variables, x):
    """Static act_scales from one calibration forward (values don't matter
    for speed, only that the quantize fuses against a static scalar)."""
    if "act_scales" not in variables:
        return variables
    _, upd = model.apply(variables, x, mutable=["act_scales"])
    return {**variables, "act_scales": jax.device_put(upd["act_scales"])}


def main() -> None:
    import flax.linen as nn

    from avcer_tpu.models.layers import TorchBatchNorm
    from avcer_tpu.models.retinaface import (
        FPN, SSH, RetinaFace, StemConv, TVBottleneck,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend(),
          "n_dev": jax.device_count()})

    # ---- 1. link probe -----------------------------------------------------
    try:
        blob = rng.standard_normal(22 * 1024 * 1024 // 4).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(blob)
        d.block_until_ready()
        up = 22 / (time.perf_counter() - t0)
        tiny = jax.device_put(np.zeros(8, np.float32))
        np.asarray(tiny + 1)
        t0 = time.perf_counter()
        np.asarray(tiny + 2)
        fetch_ms = (time.perf_counter() - t0) * 1e3
        emit({"name": "link_probe", "h2d_MBps": round(up, 1),
              "fetch_ms": round(fetch_ms, 1)})
        del d, blob
    except Exception as e:  # noqa: BLE001
        emit({"name": "link_probe", "error": repr(e)[:300]})

    x640 = jnp.asarray(rng.standard_normal((32, 360, 640, 3)), jnp.bfloat16)
    x448 = jnp.asarray(rng.standard_normal((32, 256, 448, 3)), jnp.bfloat16)
    np.asarray(x640[0, 0, 0])

    # ---- 2. r50 full: bf16 cross-check + int8 ------------------------------
    for quant, xin, tag in ((False, x640, "r50_640_bf16"),
                            (True, x640, "r50_640_int8"),
                            (False, x448, "r50_448_bf16"),
                            (True, x448, "r50_448_int8")):
        try:
            rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16,
                            quant=quant)
            rv = rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            rv = calibrated(rf, rv, xin[:2])
            rv = jax.device_put(rv)
            sec = time_looped(lambda x: rf.apply(rv, x), xin, 150)
            emit({"name": f"loop_{tag}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_{tag}", "error": repr(e)[:300]})

    # ---- 2b. int8 cumulative section ablation ------------------------------
    class Cumulative(nn.Module):
        upto: str
        quant: bool = True

        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16
            h = StemConv(s2d=False, dtype=dt, quant=self.quant, name="conv1")(x)
            h = TorchBatchNorm(dtype=dt, name="bn1")(h, True)
            h = nn.relu(h)
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            if self.upto == "stem":
                return h
            outs = []
            in_ch = 64
            for li, (blocks, planes) in enumerate(
                zip((3, 4, 6, 3), (64, 128, 256, 512))
            ):
                stride = 1 if li == 0 else 2
                for bi in range(blocks):
                    s = stride if bi == 0 else 1
                    ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                    h = TVBottleneck(planes, stride=s, downsample=ds, dtype=dt,
                                     quant=self.quant,
                                     name=f"layer{li + 1}_{bi}")(h, False)
                    in_ch = planes * 4
                if li >= 1:
                    outs.append(h)
                if self.upto == f"layer{li + 1}":
                    return h
            fpn = FPN(256, dtype=dt, quant=self.quant, name="fpn")(tuple(outs), False)
            if self.upto == "fpn":
                return fpn
            return [SSH(256, dtype=dt, quant=self.quant, name=f"ssh{i + 1}")(f, False)
                    for i, f in enumerate(fpn)]

    prev = 0.0
    for upto in ("stem", "layer1", "layer2", "layer3", "layer4", "fpn", "ssh"):
        try:
            m = Cumulative(upto=upto)
            mv = m.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            mv = calibrated(m, mv, x640[:2])
            mv = jax.device_put(mv)
            sec = time_looped(lambda x: m.apply(mv, x), x640, 150)
            ms = sec / 32 * 1e3
            emit({"name": f"loop_cum_int8_{upto}", "ms_per_frame": round(ms, 4),
                  "delta_ms": round(ms - prev, 4)})
            prev = ms
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_cum_int8_{upto}", "error": repr(e)[:300]})

    # ---- 4. mobilenet cross-checks -----------------------------------------
    for xin, tag in ((x448, "mnet_448_int8"), (x640, "mnet_640_int8")):
        try:
            rf = RetinaFace(backbone="mobilenet0.25", dtype=jnp.bfloat16,
                            quant=True)
            rv = rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            rv = calibrated(rf, rv, xin[:2])
            rv = jax.device_put(rv)
            sec = time_looped(lambda x: rf.apply(rv, x), xin, 300)
            emit({"name": f"loop_{tag}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_{tag}", "error": repr(e)[:300]})

    # ---- 5. emotion CNN bf16/int8 + int8 ablation --------------------------
    from avcer_tpu.models.emotion_resnet import Bottleneck, EmotionResNet50

    xc = jnp.asarray(rng.standard_normal((256, 224, 224, 3)) * 60, jnp.bfloat16)
    np.asarray(xc[0, 0, 0])
    for quant in (False, True):
        try:
            em = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16, quant=quant)
            ev = em.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
            ev = calibrated(em, ev, xc[:2])
            ev = jax.device_put(ev)
            sec = time_looped(lambda x: em.apply(ev, x)[0], xc, 30)
            emit({"name": f"loop_cnn_{'int8' if quant else 'bf16'}",
                  "ms_per_frame": round(sec / 256 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_cnn_{quant}", "error": repr(e)[:300]})

    class CnnCum(nn.Module):
        upto: str
        quant: bool = True

        @nn.compact
        def __call__(self, x):
            from avcer_tpu.models.layers import QConv

            dt = jnp.bfloat16
            stem_cls = QConv if self.quant else nn.Conv
            h = stem_cls(64, (7, 7), strides=(2, 2), padding="SAME",
                         dtype=dt, name="conv_stem")(x)
            h = TorchBatchNorm(dtype=dt, name="bn_stem")(h, True)
            h = nn.relu(h)
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
            if self.upto == "stem":
                return h
            planes = (64, 128, 256, 512)
            in_ch = 64
            for li, (blocks, p) in enumerate(zip((3, 4, 6, 3), planes)):
                stride = 1 if li == 0 else 2
                for bi in range(blocks):
                    s = stride if bi == 0 else 1
                    ds = bi == 0
                    h = Bottleneck(p, stride=s, downsample=ds, dtype=dt,
                                   quant=self.quant,
                                   name=f"layer{li + 1}_{bi}")(h, False)
                    in_ch = p * 4
                if self.upto == f"layer{li + 1}":
                    return h
            return h

    prev = 0.0
    for upto in ("stem", "layer1", "layer2", "layer3", "layer4"):
        try:
            m = CnnCum(upto=upto)
            mv = m.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
            mv = calibrated(m, mv, xc[:2])
            mv = jax.device_put(mv)
            sec = time_looped(lambda x: m.apply(mv, x), xc, 30)
            ms = sec / 256 * 1e3
            emit({"name": f"loop_cnn_cum_int8_{upto}",
                  "ms_per_frame": round(ms, 4),
                  "delta_ms": round(ms - prev, 4)})
            prev = ms
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_cnn_cum_int8_{upto}", "error": repr(e)[:300]})

    # ---- 6. CNN stem: plain vs s2d raw conv candidates ---------------------
    dn = ("NHWC", "HWIO", "NHWC")
    try:
        w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)), jnp.bfloat16)

        def stem_plain(x):
            return jax.lax.conv_general_dilated(
                x, w7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=dn)

        sec_p = time_looped(stem_plain, xc, 60)
        xs = jnp.asarray(rng.standard_normal((256, 112, 112, 12)), jnp.bfloat16)
        w4 = jnp.asarray(rng.standard_normal((4, 4, 12, 64)), jnp.bfloat16)

        def stem_s2d(x):
            return jax.lax.conv_general_dilated(
                x, w4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=dn)

        sec_s = time_looped(stem_s2d, xs, 60)
        emit({"name": "loop_cnn_stem", "plain_ms": round(sec_p / 256 * 1e3, 4),
              "s2d_ms": round(sec_s / 256 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_cnn_stem", "error": repr(e)[:300]})

    # ---- 7. audio: encoder layer + extractor, bf16 vs int8; fused QKV ------
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    for quant in (False, True):
        try:
            cfg = Wav2Vec2Config(num_layers=1, quant=quant)
            enc = Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16)
            xw = jnp.asarray(rng.standard_normal((16, 199, 512)), jnp.float32)
            ev = enc.init(key, jnp.zeros((1, 4000), jnp.float32))
            _, upd = enc.apply(ev, xw[:2], mode="from_features",
                               mutable=["act_scales"]) if "act_scales" in ev else (None, {})
            if upd:
                ev = {**ev, "act_scales": upd["act_scales"]}
            ev = jax.device_put(ev)
            sec = time_looped(
                lambda x: enc.apply(ev, x, mode="from_features"), xw, 300)
            emit({"name": f"loop_w2v2_enc1_{'int8' if quant else 'bf16'}",
                  "ms_per_call": round(sec * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_w2v2_enc1_{quant}", "error": repr(e)[:300]})

    for quant in (False, True):
        try:
            cfg = Wav2Vec2Config(num_layers=1, quant=quant)
            enc = Wav2Vec2Encoder(cfg, dtype=jnp.bfloat16)
            wv = jnp.asarray(rng.standard_normal((16, 64000)), jnp.float32)
            ev = enc.init(key, jnp.zeros((1, 4000), jnp.float32))
            if "act_scales" in ev:
                _, upd = enc.apply(ev, wv[:2], mode="features_only",
                                   mutable=["act_scales"])
                ev = {**ev, "act_scales": upd["act_scales"]}
            ev = jax.device_put(ev)
            sec = time_looped(
                lambda x: enc.apply(ev, x, mode="features_only"), wv, 100)
            emit({"name": f"loop_w2v2_extractor_{'int8' if quant else 'bf16'}",
                  "ms_per_window": round(sec / 16 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_w2v2_extractor_{quant}", "error": repr(e)[:300]})

    try:
        xq = jnp.asarray(rng.standard_normal((16 * 199, 1024)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.bfloat16)
        w3 = jnp.asarray(rng.standard_normal((1024, 3072)), jnp.bfloat16)

        def qkv_three(x):
            return (x @ w1, x @ (w1 * 1.0001), x @ (w1 * 0.9999))

        def qkv_fused(x):
            return x @ w3

        sec3 = time_looped(qkv_three, xq, 600)
        sec1 = time_looped(qkv_fused, xq, 600)
        emit({"name": "loop_qkv", "three_ms": round(sec3 * 1e3, 4),
              "fused_ms": round(sec1 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_qkv", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
