"""Round-4b: in-program loop timing — the only trustworthy microbench here.

Per-dispatch slope timing fails for sub-ms programs on this relay (negative
times, 18 ms standalone convs inside a 19.5 ms full detector). This harness
times K executions INSIDE one jitted lax.fori_loop: one dispatch, one scalar
fetch, device time dominates.

Anti-LICM: each iteration perturbs the input with the loop index so XLA
cannot hoist the body out of the loop. Anti-DCE: the carry accumulates a
scaled sum of every output. A null-body loop measures the perturb+sum
overhead for subtraction.
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_r4b_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def time_looped(fn, x, iters: int, dtype_perturb=True) -> float:
    """Seconds per execution of fn(x), measured as one fori_loop dispatch.
    fn must be a pure function of x (weights captured by closure)."""

    def body(i, acc):
        if dtype_perturb and jnp.issubdtype(x.dtype, jnp.floating):
            xi = x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-7, x.dtype))
        else:
            xi = x + (i % 2).astype(x.dtype)
        y = fn(xi)
        s = sum(
            l.astype(jnp.float32).sum() for l in jax.tree.leaves(y)
        )
        return acc + s * 1e-12

    @jax.jit
    def run():
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    np.asarray(run())  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import flax.linen as nn

    from avcer_tpu.models.layers import TorchBatchNorm
    from avcer_tpu.models.retinaface import (
        FPN, SSH, ResNet50Backbone, RetinaFace, StemConv, TVBottleneck,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start", "backend": jax.default_backend()})

    x640 = jnp.asarray(
        rng.standard_normal((32, 360, 640, 3)).astype(np.float32), jnp.bfloat16
    )
    np.asarray(x640[0, 0, 0])

    # ---- null loop: perturb+sum overhead on the input-sized tensor ---------
    try:
        sec = time_looped(lambda x: x, x640, 200)
        emit({"name": "null_loop_640", "ms": round(sec * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "null_loop_640", "error": repr(e)[:300]})

    # ---- cumulative detector ablation, all inside fori loops ---------------
    class Cumulative(nn.Module):
        upto: str

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

    prev = 0.0
    for upto in ("stem", "layer1", "layer2", "layer3", "layer4", "fpn", "ssh"):
        try:
            m = Cumulative(upto=upto)
            mv = m.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            mv = jax.device_put(mv)
            sec = time_looped(lambda x: m.apply(mv, x), x640, 150)
            ms = sec / 32 * 1e3
            emit({"name": f"loop_cum_{upto}", "ms_per_frame": round(ms, 4),
                  "delta_ms": round(ms - prev, 4)})
            prev = ms
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_cum_{upto}", "error": repr(e)[:300]})

    # ---- full RetinaFace via loop (cross-check vs the slope number) --------
    try:
        rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16)
        rv = jax.device_put(rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32)))
        sec = time_looped(lambda x: rf.apply(rv, x), x640, 150)
        emit({"name": "loop_full_retinaface",
              "ms_per_frame": round(sec / 32 * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_full_retinaface", "error": repr(e)[:300]})

    # ---- int8 vs bf16 conv (3x3 256ch @45x80) ------------------------------
    dn = ("NHWC", "HWIO", "NHWC")
    try:
        xa = jnp.asarray(rng.standard_normal((32, 45, 80, 256)), jnp.bfloat16)
        wa = jnp.asarray(rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)

        def conv_bf16(x):
            return jax.lax.conv_general_dilated(
                x, wa, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=dn)

        sec_b = time_looped(conv_bf16, xa, 1500)
        xi = jnp.asarray(rng.integers(-127, 127, (32, 45, 80, 256)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, (3, 3, 256, 256)), jnp.int8)

        def conv_int8(x):
            return jax.lax.conv_general_dilated(
                x, wi, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=dn, preferred_element_type=jnp.int32)

        sec_i = time_looped(conv_int8, xi, 1500)
        emit({"name": "loop_conv3x3_256_45x80",
              "bf16_ms": round(sec_b * 1e3, 4), "int8_ms": round(sec_i * 1e3, 4),
              "int8_speedup": round(sec_b / sec_i, 3)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_conv_int8", "error": repr(e)[:300]})

    # ---- stem conv alone: plain 7x7/s2 vs s2d form -------------------------
    for s2d in (False, True):
        try:
            sm = StemConv(s2d=s2d, dtype=jnp.bfloat16)
            sv = jax.device_put(sm.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32)))
            sec = time_looped(lambda x: sm.apply(sv, x), x640, 400)
            emit({"name": f"loop_stem_{'s2d' if s2d else 'plain'}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_stem_{s2d}", "error": repr(e)[:300]})

    # ---- Pallas kernels vs XLA, in-loop (r2/r3 tables were per-dispatch) ----
    try:
        from avcer_tpu.models.layers import scaled_dot_attention
        from avcer_tpu.ops.pallas.attention_kernel import pallas_mha

        q = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((16, 16, 199, 64)), jnp.bfloat16)

        sec_x = time_looped(
            lambda qq: scaled_dot_attention(qq, k, v, dtype=jnp.bfloat16), q, 600)
        sec_p = time_looped(lambda qq: pallas_mha(qq, k, v), q, 600)
        emit({"name": "loop_kernel_mha", "xla_ms": round(sec_x * 1e3, 4),
              "pallas_ms": round(sec_p * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_kernel_mha", "error": repr(e)[:300]})

    try:
        from avcer_tpu.ops.nms import nms_mask
        from avcer_tpu.ops.pallas.nms_kernel import pallas_nms_mask

        boxes = jnp.asarray(
            rng.uniform(0, 600, (32, 64, 4)).astype(np.float32))
        boxes = boxes.at[..., 2:].set(boxes[..., :2] + 20.0)
        valid = jnp.ones((32, 64), bool)

        sec_x = time_looped(lambda b: nms_mask(b, valid, 0.4), boxes, 400)
        sec_p = time_looped(lambda b: pallas_nms_mask(b, valid, 0.4), boxes, 400)
        emit({"name": "loop_kernel_nms", "xla_ms": round(sec_x * 1e3, 4),
              "pallas_ms": round(sec_p * 1e3, 4)})
    except Exception as e:  # noqa: BLE001
        emit({"name": "loop_kernel_nms", "error": repr(e)[:300]})

    emit({"name": "done"})


if __name__ == "__main__":
    main()
