"""Round-8: the v2 "flat" fused bottleneck kernel vs the banded 3-D kernel
vs unfused XLA, on the r50 detector's layer1 shape at the 640 bucket.

exp_r7b measured the banded kernel at 0.44-0.54 ms/frame vs XLA's 0.144 —
~7% MFU, with the band DMA at ~1 us: the cost is Mosaic relayouts (each 3x3
tap slice shifts both the sublane and packed-row dims of a 3-D value). The
flat kernel (fused_resnet_kernel.fused_chain_flat) keeps the band 2-D
(R*C, ch) for the whole chain, so taps are 1-D row-offset slices.

Results append to exp_r7_results.jsonl (same timing method).
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
                   "exp_r7_results.jsonl")


def emit(rec: dict) -> None:
    rec["t_min"] = round((time.time() - T0) / 60, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def time_looped(fn, x, iters: int) -> float:
    def body(i, acc):
        xi = x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-7, x.dtype))
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
    import flax.linen as nn

    from avcer_tpu.models.retinaface import TVBottleneck, TVBottleneckFolded
    from avcer_tpu.ops.pallas import fused_resnet_kernel as frk

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start_r8", "backend": jax.default_backend(),
          "n_dev": jax.device_count()})

    class Layer1(nn.Module):
        mode: str = "xla"   # xla | flat
        band: int = 30

        @nn.compact
        def __call__(self, x):
            if self.mode == "flat":
                folded: list = []
                for bi in range(3):
                    folded += TVBottleneckFolded(
                        64, downsample=bi == 0, dtype=jnp.bfloat16,
                        name=f"layer1_{bi}",
                    )(64 if bi == 0 else 256)
                flat = tuple(t for tr in folded for t in tr)
                return frk.fused_chain_flat(x, flat, ("ds", "id", "id"),
                                            band=self.band)
            h = x
            for bi in range(3):
                h = TVBottleneck(64, downsample=bi == 0, dtype=jnp.bfloat16,
                                 name=f"layer1_{bi}")(h)
            return h

    xl = jnp.asarray(rng.standard_normal((32, 90, 160, 64)), jnp.bfloat16)
    np.asarray(xl[0, 0, 0])
    ref = Layer1()
    variables = jax.device_put(
        ref.init(key, jnp.zeros((1, 16, 16, 64), jnp.float32)))

    sec = time_looped(lambda x: ref.apply(variables, x), xl, 200)
    emit({"name": "r8_layer1_xla", "ms_per_frame": round(sec / 32 * 1e3, 4)})

    checked = False
    for band in (15, 30, 45, 90):
        try:
            m = Layer1(mode="flat", band=band)
            sec = time_looped(lambda x: m.apply(variables, x), xl, 200)
            emit({"name": f"r8_layer1_flat_b{band}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
            if not checked:
                want = np.asarray(ref.apply(variables, xl[:2]), np.float32)
                got = np.asarray(m.apply(variables, xl[:2]), np.float32)
                emit({"name": "r8_flat_maxdiff_vs_xla_bf16",
                      "maxdiff": float(np.abs(want - got).max()),
                      "ref_absmax": float(np.abs(want).max())})
                checked = True
        except Exception as e:  # noqa: BLE001
            emit({"name": f"r8_layer1_flat_b{band}", "error": repr(e)[:300]})

    emit({"name": "done_r8"})


if __name__ == "__main__":
    main()
