"""Round-3 device experiments: s2d stem, clean ablations, audio split.

Re-measures the round-2 entries that were corrupted by concurrent CPU load
(ablate_stem / ablate_backbone / probe_conv / kernel_mha came out negative or
nonsensical in exp_r2_results.jsonl) and times the new space-to-depth stem
(models/retinaface.py StemConv) against the plain stem at every bucket.

Run alone on an idle host: the fetch-barrier slope method is CPU-timing
sensitive on this 1-core machine.
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r3_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def barrier(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf)


def time_slope(fn, n1: int = 3, n2: int = 15) -> float:
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


def main() -> None:
    import flax.linen as nn

    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.retinaface import (
        ResNet50Backbone, RetinaFace, StemConv,
    )
    from avcer_tpu.models.layers import TorchBatchNorm
    from avcer_tpu.pipeline.detect import DetectStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    r50_vars = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    frames_native = rng.integers(0, 255, (32, 360, 640, 3), np.uint8)

    # ---- full detector: plain vs s2d stem, per bucket ----------------------
    for bucket in (640, 512, 448):
        for s2d in (False, True):
            name = f"detect_r50_{bucket}_{'s2d' if s2d else 'plain'}"
            try:
                cfg = DetectorConfig(long_side=bucket, batch_size=32, s2d_stem=s2d)
                stage = DetectStage(cfg, r50_vars, dtype=jnp.bfloat16)
                wire_np, _ = stage.prepare_wire(frames_native)
                wire = jnp.asarray(wire_np)
                barrier(wire)
                sec = time_slope(lambda: stage._jit_forward(stage.variables, wire))
                emit({"name": name, "ms_per_frame": round(sec / 32 * 1e3, 4)})
            except Exception as e:
                emit({"name": name, "error": repr(e)[:300]})

    # ---- stem-only + backbone-only ablations (clean re-measure) ------------
    x640 = jnp.asarray(
        rng.standard_normal((32, 360, 640, 3)).astype(np.float32), jnp.bfloat16
    )
    barrier(x640)

    class StemBlock(nn.Module):
        s2d: bool

        @nn.compact
        def __call__(self, x):
            h = StemConv(s2d=self.s2d, dtype=jnp.bfloat16, name="conv1")(x)
            h = TorchBatchNorm(dtype=jnp.bfloat16, name="bn1")(h, True)
            h = nn.relu(h)
            return nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    for s2d in (False, True):
        name = f"ablate_stem_640_{'s2d' if s2d else 'plain'}"
        try:
            stem = StemBlock(s2d=s2d)
            sv = stem.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            f = jax.jit(stem.apply)
            sec = time_slope(lambda: f(sv, x640))
            emit({"name": name, "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:
            emit({"name": name, "error": repr(e)[:300]})

    try:
        bb = ResNet50Backbone(dtype=jnp.bfloat16)
        bv = bb.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
        f = jax.jit(bb.apply)
        sec = time_slope(lambda: f(bv, x640))
        emit({"name": "ablate_backbone_640", "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:
        emit({"name": "ablate_backbone_640", "error": repr(e)[:300]})

    # ---- audio: conv extractor vs encoder split ----------------------------
    try:
        from avcer_tpu.models.wav2vec2 import (
            FeatureEncoder, Wav2Vec2Config, Wav2Vec2Encoder,
        )

        w2v2 = Wav2Vec2Config()
        fe = FeatureEncoder(w2v2, dtype=jnp.bfloat16)
        wav16 = jnp.asarray(rng.standard_normal((16, 64000)).astype(np.float32))
        barrier(wav16)
        fev = fe.init(key, jnp.zeros((1, 4000), jnp.float32))
        f = jax.jit(fe.apply)
        sec = time_slope(lambda: f(fev, wav16))
        emit({"name": "audio_feature_extractor_b16",
              "ms_per_window": round(sec / 16 * 1e3, 4)})

        enc = Wav2Vec2Encoder(w2v2, dtype=jnp.bfloat16)
        ev = enc.init(key, jnp.zeros((1, 4000), jnp.float32))
        f = jax.jit(enc.apply)
        sec = time_slope(lambda: f(ev, wav16))
        emit({"name": "audio_w2v2_full_b16", "ms_per_window": round(sec / 16 * 1e3, 4)})
    except Exception as e:
        emit({"name": "audio_split", "error": repr(e)[:300]})

    # ---- Pallas MHA vs XLA (clean re-measure; r2 numbers were corrupted) ----
    try:
        from avcer_tpu.models.layers import scaled_dot_attention
        from avcer_tpu.ops.pallas.attention_kernel import pallas_mha

        q = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)
        barrier((q, k, v))
        fx = jax.jit(lambda q, k, v: scaled_dot_attention(q, k, v, dtype=jnp.bfloat16))
        sec_x = time_slope(lambda: fx(q, k, v))
        fp = jax.jit(pallas_mha)
        sec_p = time_slope(lambda: fp(q, k, v))
        emit({"name": "kernel_mha", "xla_ms": round(sec_x * 1e3, 4),
              "pallas_ms": round(sec_p * 1e3, 4)})
    except Exception as e:
        emit({"name": "kernel_mha", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
