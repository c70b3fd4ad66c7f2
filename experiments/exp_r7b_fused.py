"""Round-7b: re-run of exp_r7_fused.py's FAILED rows after the Mosaic
alignment fixes in the fused kernels.

exp_r7 found every fused row failing real Mosaic compile with two error
classes the interpret mode never sees:
  1. "Insertion of minor dim that is not a no-op only supported for 32-bit
     types" — the i1 out-of-frame mask built 2-D then broadcast with
     ``[..., None]``; fixed by building the mask 3-D from the start;
  2. "Slice shape along dimension {2,3} must be aligned to tiling {8,128}"
     — the band DMA's memref slice had a 166-column band inside an
     8-tiled dim and a 64-channel lane dim inside the 128 tile; fixed by
     column-padding the HBM copy + scratch to the tile (kernel value-
     slices back) and zero-padding sub-128 input channels together with
     the first block's conv1/projection weight rows (exact: zero channels
     contribute zero).

Sections already measured by exp_r7 (XLA layer1, fused0 ladder baselines,
plain int8, cnn fused0/int8) are NOT repeated. Results append to
exp_r7_results.jsonl with the same row names.
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

import jax
import jax.numpy as jnp

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

    from avcer_tpu.models.retinaface import (
        RetinaFace, TVBottleneck, TVBottleneckFolded,
    )
    from avcer_tpu.ops.pallas import fused_resnet_kernel as frk

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    emit({"name": "start_r7b", "backend": jax.default_backend(),
          "n_dev": jax.device_count()})

    # ---- 1. layer1 section alone (fused band sweep) ------------------------
    class Layer1(nn.Module):
        fused: bool = False
        band: int = 32

        @nn.compact
        def __call__(self, x):
            if self.fused:
                folded: list = []
                for bi in range(3):
                    folded += TVBottleneckFolded(
                        64, downsample=bi == 0, dtype=jnp.bfloat16,
                        name=f"layer1_{bi}",
                    )(64 if bi == 0 else 256)
                flat = tuple(t for tr in folded for t in tr)
                return frk.fused_layer1(x, flat, band=self.band)
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
    got_ref = None
    for band in (8, 15, 30, 45):
        try:
            m = Layer1(fused=True, band=band)
            sec = time_looped(lambda x: m.apply(variables, x), xl, 200)
            emit({"name": f"loop_layer1_fused_b{band}",
                  "ms_per_frame": round(sec / 32 * 1e3, 4)})
            if got_ref is None:
                want = np.asarray(ref.apply(variables, xl[:2]), np.float32)
                got = np.asarray(m.apply(variables, xl[:2]), np.float32)
                got_ref = float(np.abs(want - got).max())
                emit({"name": "fused_layer1_maxdiff_vs_xla_bf16",
                      "maxdiff": got_ref,
                      "ref_absmax": float(np.abs(want).max())})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_layer1_fused_b{band}", "error": repr(e)[:300]})

    # ---- 2. full detector, fused ladder (fused0 already measured) ----------
    x640 = jnp.asarray(rng.standard_normal((32, 360, 640, 3)), jnp.bfloat16)
    x448 = jnp.asarray(rng.standard_normal((32, 256, 448, 3)), jnp.bfloat16)
    np.asarray(x448[0, 0, 0])
    rv = None
    for fused1, tails, entries, fssh, tag2 in (
            (True, False, False, False, "fused1"),
            (True, True, False, False, "fused1t"),
            (True, True, True, False, "fused1te"),
            (True, True, True, 1, "fused1tes"),
            (False, False, False, 1, "fused0s"),
            (True, True, True, 2, "fused1tesf"),
            (False, False, False, 2, "fused0sf")):
        rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16,
                        fused_layer1=fused1, fused_tails=tails,
                        fused_entries=entries, fused_ssh=bool(fssh),
                        fused_fpn=fssh == 2)
        if rv is None:
            rv = jax.device_put(
                rf.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32)))
        for xin, tag in ((x640, "640"), (x448, "448")):
            try:
                sec = time_looped(lambda x: rf.apply(rv, x), xin,
                                  150 if tag == "640" else 300)
                emit({"name": f"loop_r50_{tag}_{tag2}",
                      "ms_per_frame": round(sec / 32 * 1e3, 4)})
            except Exception as e:  # noqa: BLE001
                emit({"name": f"loop_r50_{tag}_{tag2}",
                      "error": repr(e)[:300]})

    # ---- 2b. int8 detector, fused chains on ---------------------------------
    qv = None
    for fused, tag2 in ((True, "int8f"),):
        rf = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16, quant=True,
                        fused_layer1=fused, fused_tails=fused,
                        fused_entries=fused, fused_ssh=fused,
                        fused_fpn=fused)
        if qv is None:
            calib = RetinaFace(backbone="resnet50", dtype=jnp.bfloat16,
                               quant=True)
            qv = calib.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
            _, upd = calib.apply(qv, jnp.asarray(
                rng.standard_normal((1, 64, 64, 3)), jnp.float32),
                mutable=["act_scales"])
            qv = jax.device_put({**qv, "act_scales": upd["act_scales"]})
        for xin, tag in ((x640, "640"), (x448, "448")):
            try:
                sec = time_looped(lambda x: rf.apply(qv, x), xin,
                                  200 if tag == "640" else 400)
                emit({"name": f"loop_r50_{tag}_{tag2}",
                      "ms_per_frame": round(sec / 32 * 1e3, 4)})
            except Exception as e:  # noqa: BLE001
                emit({"name": f"loop_r50_{tag}_{tag2}",
                      "error": repr(e)[:300]})

    # ---- 3. emotion CNN, fused variants -------------------------------------
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    xc = jnp.asarray(rng.standard_normal((256, 224, 224, 3)) * 60, jnp.bfloat16)
    np.asarray(xc[0, 0, 0])
    ev = None
    qev = None
    for quant, fused, entries, tag in (
            (False, True, False, "fused1"),
            (False, True, True, "fused1e"),
            (True, True, True, "int8f")):
        em = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16, quant=quant,
                             fused=fused, fused_entries=entries)
        if not quant and ev is None:
            ev = jax.device_put(
                em.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32)))
        if quant and qev is None:
            calib = EmotionResNet50(num_classes=7, dtype=jnp.bfloat16,
                                    quant=True)
            qev = calib.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32))
            _, upd = calib.apply(qev, xc[:2], mutable=["act_scales"])
            qev = jax.device_put({**qev, "act_scales": upd["act_scales"]})
        vv = qev if quant else ev
        try:
            sec = time_looped(lambda x: em.apply(vv, x), xc, 100)
            emit({"name": f"loop_cnn_224_{tag}",
                  "ms_per_frame": round(sec / 256 * 1e3, 4)})
        except Exception as e:  # noqa: BLE001
            emit({"name": f"loop_cnn_224_{tag}",
                  "error": repr(e)[:300]})

    emit({"name": "done_r7b"})


if __name__ == "__main__":
    main()
