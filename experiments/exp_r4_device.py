"""Round-4 device experiments: where do the detector's 0.6 ms/frame go?

The r2/r3 sub-stage ablations were unusable (slope windows of ~40 ms against
relay jitter of ~20 ms produced negative times). This harness times every leg
adaptively so each slope window is >= ~2 s of device work, and repeats each
slope 3x taking the median.

Measurements:
 1. full detect r50 @640x360 (baseline re-measure)
 2. cumulative ablation: stem+pool -> +layer1..4 -> +FPN -> +SSH -> full
 3. tiling probe: same network at 640x384 (feature dims divisible by 16)
 4. int8 conv microbench vs bf16 (the MXU runs int8 at 2x)
 5. mobilenet backbone @448 (turbo-profile floor)
 6. audio window batch shapes

Run ALONE on an idle host (1 CPU core; concurrent work corrupts timings).
"""

from __future__ import annotations

import functools
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r4_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def barrier(x) -> None:
    np.asarray(jax.tree.leaves(x)[0])


def time_slope(fn, target_sec: float = 2.0, repeats: int = 3) -> float:
    """Median-of-3 fetch-barrier slope with adaptive rep counts so each
    window holds >= target_sec of dispatches (robust to ~20 ms relay
    jitter)."""
    barrier(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn()
    barrier(out)
    est = max((time.perf_counter() - t0) / 3, 1e-5)
    n1 = max(2, int(target_sec / 3 / est))
    n2 = n1 * 4
    vals = []
    for _ in range(repeats):
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
    import flax.linen as nn

    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.models.layers import TorchBatchNorm
    from avcer_tpu.models.retinaface import (
        FPN, SSH, ResNet50Backbone, RetinaFace, StemConv, TVBottleneck,
    )
    from avcer_tpu.pipeline.detect import DetectStage

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    r50_vars = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16).init(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )

    # ---- 1. full detect baseline + 3. tiling probe at 384 height -----------
    for h_native, tag in ((360, "640x360"), (384, "640x384")):
        try:
            frames = rng.integers(0, 255, (32, h_native, 640, 3), np.uint8)
            cfg = DetectorConfig(long_side=640, batch_size=32)
            stage = DetectStage(cfg, r50_vars, dtype=jnp.bfloat16)
            wire_np, _ = stage.prepare_wire(frames)
            wire = jnp.asarray(wire_np)
            barrier(wire)
            sec = time_slope(lambda: stage._jit_forward(stage.variables, wire))
            emit({"name": f"detect_r50_{tag}", "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"detect_r50_{tag}", "error": repr(e)[:300]})

    # ---- 2. cumulative ablation at 640x360 bf16 ----------------------------
    class Cumulative(nn.Module):
        upto: str  # stem | layer1 | layer2 | layer3 | layer4 | fpn | ssh

        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16
            h = StemConv(s2d=False, dtype=dt, name="conv1")(x)
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
                                     name=f"layer{li + 1}_{bi}")(h, False)
                    in_ch = planes * 4
                if li >= 1:
                    outs.append(h)
                if self.upto == f"layer{li + 1}":
                    return h
            fpn = FPN(256, dtype=dt, name="fpn")(tuple(outs), False)
            if self.upto == "fpn":
                return fpn
            return [SSH(256, dtype=dt, name=f"ssh{i + 1}")(f, False)
                    for i, f in enumerate(fpn)]

    x640 = jnp.asarray(
        rng.standard_normal((32, 360, 640, 3)).astype(np.float32), jnp.bfloat16
    )
    barrier(x640)
    prev = 0.0
    for upto in ("stem", "layer1", "layer2", "layer3", "layer4", "fpn", "ssh"):
        try:
            m = Cumulative(upto=upto)
            mv = m.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            f = jax.jit(m.apply)
            sec = time_slope(lambda: f(mv, x640), target_sec=1.5)
            ms = sec / 32 * 1e3
            emit({"name": f"cum_{upto}", "ms_per_frame": round(ms, 4),
                  "delta_ms": round(ms - prev, 4)})
            prev = ms
        except Exception as e:  # noqa: BLE001
            emit({"name": f"cum_{upto}", "error": repr(e)[:300]})

    # ---- 4. int8 vs bf16 conv microbench -----------------------------------
    # the dominant conv shape class: 3x3, 256ch, stride-8 feature map
    try:
        xa = jnp.asarray(rng.standard_normal((32, 45, 80, 256)), jnp.bfloat16)
        wa = jnp.asarray(rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)
        dn = ("NHWC", "HWIO", "NHWC")
        conv = jax.jit(functools.partial(
            jax.lax.conv_general_dilated, window_strides=(1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=dn,
        ))
        barrier((xa, wa))
        sec_bf16 = time_slope(lambda: conv(xa, wa), target_sec=1.5)
        xi = jnp.asarray(rng.integers(-127, 127, (32, 45, 80, 256)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (3, 3, 256, 256)), jnp.int8)

        def conv_i8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )

        ci = jax.jit(conv_i8)
        barrier((xi, wi))
        sec_i8 = time_slope(lambda: ci(xi, wi), target_sec=1.5)
        emit({"name": "conv3x3_256_45x80", "bf16_ms": round(sec_bf16 * 1e3, 4),
              "int8_ms": round(sec_i8 * 1e3, 4),
              "int8_speedup": round(sec_bf16 / sec_i8, 3)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "conv_int8_probe", "error": repr(e)[:300]})

    # same probe at the 16x-divisible spatial size
    try:
        xb = jnp.asarray(rng.standard_normal((32, 48, 80, 256)), jnp.bfloat16)
        barrier(xb)
        sec = time_slope(lambda: conv(xb, wa), target_sec=1.5)
        emit({"name": "conv3x3_256_48x80_bf16", "ms": round(sec * 1e3, 4),
              "vs_45x80": round(sec / sec_bf16, 3)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "conv_48x80_probe", "error": repr(e)[:300]})

    # ---- 5. mobilenet @448 (turbo floor) -----------------------------------
    try:
        mnet_vars = RetinaFace(backbone="mobilenet0.25", dtype=jnp.bfloat16).init(
            key, jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        frames = rng.integers(0, 255, (32, 360, 640, 3), np.uint8)
        cfg = DetectorConfig(long_side=448, batch_size=32, backbone="mobilenet0.25")
        stage = DetectStage(cfg, mnet_vars, dtype=jnp.bfloat16)
        wire_np, _ = stage.prepare_wire(frames)
        wire = jnp.asarray(wire_np)
        barrier(wire)
        sec = time_slope(lambda: stage._jit_forward(stage.variables, wire))
        emit({"name": "detect_mnet_448", "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "detect_mnet_448", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
