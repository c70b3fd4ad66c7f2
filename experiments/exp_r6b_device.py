"""Round-6b: continuation of exp_r6_device.py after the relay's remote
compile endpoint dropped mid-run (loop_mnet_448_int8 errored at t=56.9m).

Sections already measured by exp_r6 (r50 bf16/int8 @640/448 + the int8
cumulative ablation) are NOT repeated; this script covers the remainder:

4. mnet@448 / mnet@640 int8 cross-checks;
4b. mnet@448/640 int8 with the bf16 first conv (the stem fix landed from
    the r6 ablation finding: 3-channel convs regress under int8) — the
    models were edited between r6 and r6b, so these ARE the new serving
    numbers;
4c. r50@640/448 int8 with the bf16 stem (the fixed serving path);
5. emotion CNN bf16 vs int8 + int8 cumulative ablation (stem decision);
6. CNN stem plain vs s2d raw conv;
7. audio encoder layer + extractor bf16/int8; fused-QKV candidate.

Same in-loop method; results append to exp_r6_results.jsonl with r6b_
prefixes where the model code changed vs r6.
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
    if "act_scales" not in variables:
        return variables
    _, upd = model.apply(variables, x, mutable=["act_scales"])
    return {**variables, "act_scales": jax.device_put(upd["act_scales"])}


def main() -> None:
    import flax.linen as nn

    from avcer_tpu.models.layers import TorchBatchNorm
    from avcer_tpu.models.retinaface import RetinaFace

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start_r6b", "backend": jax.default_backend(),
          "n_dev": jax.device_count()})

    try:
        blob = rng.standard_normal(22 * 1024 * 1024 // 4).astype(np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(blob)
        d.block_until_ready()
        up = 22 / (time.perf_counter() - t0)
        emit({"name": "link_probe_r6b", "h2d_MBps": round(up, 1)})
        del d, blob
    except Exception as e:  # noqa: BLE001
        emit({"name": "link_probe_r6b", "error": repr(e)[:300]})

    x640 = jnp.asarray(rng.standard_normal((32, 360, 640, 3)), jnp.bfloat16)
    x448 = jnp.asarray(rng.standard_normal((32, 256, 448, 3)), jnp.bfloat16)
    np.asarray(x640[0, 0, 0])

    # ---- 4/4b. mnet int8 (now with bf16 first conv) ------------------------
    for xin, tag in ((x448, "mnet_448_int8_bf16stem"),
                     (x640, "mnet_640_int8_bf16stem")):
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

    # ---- 4c. r50 int8 with the bf16 stem (the fixed serving path) ----------
    for xin, tag in ((x640, "r50_640_int8_bf16stem"),
                     (x448, "r50_448_int8_bf16stem")):
        try:
            rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16, quant=True)
            rv = rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            rv = calibrated(rf, rv, xin[:2])
            rv = jax.device_put(rv)
            sec = time_looped(lambda x: rf.apply(rv, x), xin, 150)
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

    # full CNN with the exact s2d stem (models/emotion_resnet.py s2d_stem)
    try:
        em = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16, s2d_stem=True)
        ev = em.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
        ev = jax.device_put(ev)
        sec = time_looped(lambda x: em.apply(ev, x)[0], xc, 30)
        emit({"name": "loop_cnn_bf16_s2d",
              "ms_per_frame": round(sec / 256 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_cnn_bf16_s2d", "error": repr(e)[:300]})

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
            if "act_scales" in ev:
                _, upd = enc.apply(ev, xw[:2], mode="from_features",
                                   mutable=["act_scales"])
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

    # ---- 8. audio full-program breakdown: gather/norm-only + full exact ----
    # The r5 slope numbers leave ~0.5 ms/window unexplained beyond
    # extractor (0.34) + 12x encoder layer (0.59) of the 1.43 total. Time
    # the FULL from-wav program and the gather+normalize prologue alone in
    # the same in-loop method; head cost = full - gather - extractor - 12*L.
    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.pipeline.audio_stage import AudioStage

    def make_stage(quant: str) -> AudioStage:
        model = ExprModel(variant="v3", num_classes=8,
                          wav2vec2_config=Wav2Vec2Config(),
                          dtype=jnp.bfloat16)
        variables = init_variables(
            model, (jnp.zeros((1, 64000), jnp.float32),))
        return AudioStage(
            variables,
            AudioConfig(num_classes=8, head="v3", quant=quant, batch_size=16),
            Wav2Vec2Config(), dtype=jnp.bfloat16,
        )

    for quant in ("none", "int8"):
        try:
            stage = make_stage(quant)
            wav = jnp.asarray(rng.standard_normal(200_001), jnp.float32)
            wl = jnp.asarray(136_000, jnp.int32)
            starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)

            # in-loop: perturb the wav each iteration (anti-LICM)
            def body(i, acc):
                wi = wav * (1.0 + i.astype(jnp.float32) * 1e-7)
                y = stage._forward_from_wav_impl(
                    stage.variables, wi, wl, starts, padding="mean")
                return acc + y.sum() * 1e-12

            @jax.jit
            def run():
                return jax.lax.fori_loop(0, 40, body, jnp.zeros((), jnp.float32))

            np.asarray(run())
            t0 = time.perf_counter()
            np.asarray(run())
            sec = (time.perf_counter() - t0) / 40
            emit({"name": f"loop_audio_full_{quant}",
                  "ms_per_window": round(sec / 16 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_audio_full_{quant}", "error": repr(e)[:300]})

    try:
        from avcer_tpu.ops import audio as audio_ops

        stage = make_stage("none")
        wav = jnp.asarray(rng.standard_normal(200_001), jnp.float32)
        wl = jnp.asarray(136_000, jnp.int32)
        starts = jnp.asarray(np.arange(16, dtype=np.int32) * 8000)

        def body(i, acc):
            wi = wav * (1.0 + i.astype(jnp.float32) * 1e-7)
            out = stage._extract_impl(wi, wl, starts, "mean")
            x = audio_ops.feature_extractor_normalize(out)
            return acc + x.sum() * 1e-12

        @jax.jit
        def run():
            return jax.lax.fori_loop(0, 300, body, jnp.zeros((), jnp.float32))

        np.asarray(run())
        t0 = time.perf_counter()
        np.asarray(run())
        sec = (time.perf_counter() - t0) / 300
        emit({"name": "loop_audio_gather_norm",
              "ms_per_window": round(sec / 16 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_audio_gather_norm", "error": repr(e)[:300]})

    # ---- 9. full r50 detector with the s2d stem (parity-profile lever) -----
    # exact-math reformulation (StemConv s2d=True): A/B against the plain
    # loop_r50_{640,448}_bf16 / *_int8_bf16stem records from r6/4c above
    for xin, quant, iters, tag in (
        (x640, False, 150, "r50_640_bf16_s2d"),
        (x448, False, 300, "r50_448_bf16_s2d"),
        (x640, True, 150, "r50_640_int8_s2d"),
        (x448, True, 300, "r50_448_int8_s2d"),
    ):
        try:
            rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16,
                            quant=quant, s2d_stem=True)
            rv = rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            rv = calibrated(rf, rv, xin[:2])
            rv = jax.device_put(rv)
            sec = time_looped(lambda x: rf.apply(rv, x), xin, iters)
            emit({"name": f"loop_{tag}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_{tag}", "error": repr(e)[:300]})

    emit({"name": "done_r6b"})


if __name__ == "__main__":
    main()
