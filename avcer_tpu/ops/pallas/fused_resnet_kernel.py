"""Pallas TPU kernel: chains of ResNet bottlenecks as ONE fused program.

Why: XLA cannot fuse across convolutions, so every conv in a bottleneck
round-trips its activations through HBM. At the 640x360 bucket the r50
detector's layer1 moves ~4.4 GB of intermediates per 32-frame batch for a
59 MB input (0.146 ms/frame at ~8% MFU — the detector's worst section,
BENCH_NOTES round-4), and layers 2-3 repeat the pattern at half/quarter
resolution. This kernel runs a whole chain of stride-1 bottlenecks
(conv1x1 -> conv3x3 -> conv1x1, BN folded, ReLU, residual) per spatial
band inside VMEM: HBM traffic drops to one read of the input band + one
write of the output band.

Exactness: inference BatchNorm folds to a per-channel scale/shift
(mathematically identical — models/layers.TorchBatchNorm does the same
fold); each conv accumulates bf16 x bf16 -> f32 on the MXU exactly like
the XLA conv, then rounds to bf16 before the scale/shift — the same
rounding points as the unfused path. 3x3 convs run as 9 shifted matmuls
whose f32 partial sums differ from XLA's reduction order only in
float-addition associativity. Converted reference checkpoints work
unchanged (same parameter tree — models/retinaface.TVBottleneckFolded).

Band decomposition: output rows split into bands of TH rows; a chain of N
bottlenecks (= N 3x3 convs) needs TH+2N input rows, DMA'd from a
zero-padded HBM copy of the input. Out-of-frame halo positions must be
ZERO at each 3x3 conv's input (conv zero-padding semantics) but hold junk
after any preceding bias+ReLU — they are re-masked before every 3x3.

Entry points:
- ``fused_layer1``: the whole torchvision-resnet50 layer1 (3 bottlenecks,
  64 planes, downsample projection on the first — behavior contract:
  /root/reference/src/data/face_detection/ibug/face_detection/retina_face/
  retina_face.py:60, IntermediateLayerGetter over tv resnet50);
- ``fused_chain``: any stride-1 bottleneck chain — used for the identity
  tails of layers 2-3 (their stride-2 entry blocks stay in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a2d, w, inv, shift, relu=True):
    """conv-as-matmul + folded BN: f32 MXU accumulation, round to the
    compute dtype at the conv output (the unfused path's rounding point),
    then scale/shift (TorchBatchNorm inference fold)."""
    acc = jnp.dot(a2d, w, preferred_element_type=jnp.float32)
    y = acc.astype(w.dtype) * inv + shift
    return jnp.maximum(y, 0) if relu else y


def _conv3x3(a, w, inv, shift):
    """3x3/s1 VALID conv over a (r, c, ci) band as 9 shifted matmuls."""
    r, c, ci = a.shape
    co = w.shape[-1]
    m = (r - 2) * (c - 2)
    acc = jnp.zeros((m, co), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = a[ky:ky + r - 2, kx:kx + c - 2, :].reshape(m, ci)
            acc = acc + jnp.dot(sl, w[ky, kx],
                                preferred_element_type=jnp.float32)
    y = acc.astype(w.dtype) * inv + shift
    return jnp.maximum(y, 0).reshape(r - 2, c - 2, co)


def _mask_oof(a, r0, off, h, w):
    """Zero positions outside the real frame (conv zero-padding semantics).

    Band-array position (s, c) holds frame pixel (r0 + s - off, c - off);
    anything outside [0,h) x [0,w) must be zero before entering a 3x3 conv.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 1)
    fr = r0 + rows - off
    fc = cols - off
    ok = (fr >= 0) & (fr < h) & (fc >= 0) & (fc < w)
    return jnp.where(ok[..., None], a, jnp.zeros((), a.dtype))


def _kernel(xp_hbm, *refs, th: int, h: int, w: int, blocks: tuple[str, ...]):
    n = len(blocks)
    n_w = sum(12 if b == "ds" else 9 for b in blocks)
    w_refs = refs[:n_w]
    o_ref, xb, sem = refs[n_w], refs[n_w + 1], refs[n_w + 2]
    vals = [r[:] for r in w_refs]

    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * th

    dma = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(r0, th + 2 * n)], xb, sem)
    dma.start()
    dma.wait()

    cur = xb[:]                                  # (th+2n, w+2n, in_ch)
    off = n
    for kind in blocks:
        take = 12 if kind == "ds" else 9
        (w1, i1, s1, w2, i2, s2, w3, i3, s3, *ds_w) = vals[:take]
        del vals[:take]
        r, c, ci = cur.shape
        t1 = _mm(cur.reshape(r * c, ci), w1, i1, s1).reshape(r, c, -1)
        t1 = _mask_oof(t1, r0, off, h, w)
        t2 = _conv3x3(t1, w2, i2, s2)            # (r-2, c-2, p)
        m = (r - 2) * (c - 2)
        y = _mm(t2.reshape(m, -1), w3, i3, s3, relu=False)
        if kind == "ds":
            wd, idv, sd = ds_w
            res = _mm(cur[1:r - 1, 1:c - 1, :].reshape(m, ci), wd, idv, sd,
                      relu=False)
        else:
            res = cur[1:r - 1, 1:c - 1, :].reshape(m, cur.shape[-1])
        cur = jnp.maximum(y + res, 0).reshape(r - 2, c - 2, y.shape[-1])
        off -= 1
    o_ref[0] = cur                               # (th, w, c_out)


def _pick_band(h: int, cap: int = 32) -> int:
    """Band height <= cap, preferring an exact divisor of h (a divisor
    avoids computing padded junk rows in the last band: the 640x360
    bucket's h=90 gets 3 bands of 30). Otherwise the most even split
    (minimum junk rows)."""
    if h <= cap:
        return h
    for th in range(cap, max(cap - 16, 1), -1):
        if h % th == 0:
            return th
    nb = -(-h // cap)
    return -(-h // nb)


@functools.partial(jax.jit,
                   static_argnames=("blocks", "interpret", "band"))
def fused_chain(
    x: jax.Array,        # [B, H, W, Cin] compute-dtype NHWC
    folded: tuple,       # flat (w, inv, shift[, ds triple]) per block
    blocks: tuple[str, ...],  # "ds" (projection residual) | "id" (identity)
    interpret: bool = False,
    band: int = 32,
) -> jax.Array:
    bsz, h, w, _ = x.shape
    n = len(blocks)
    th = _pick_band(h, band)
    nb = -(-h // th)
    hp = nb * th
    xp = jnp.pad(x, ((0, 0), (n, n + hp - h), (n, n), (0, 0)))
    dtype = x.dtype
    c_out = folded[6].shape[-1]  # first block conv3 out channels

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in folded]
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, h=h, w=w, blocks=blocks),
        grid=(bsz, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, th, w, c_out), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * n, w + 2 * n, x.shape[-1]), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *folded)
    return out[:, :h] if hp != h else out


def fused_layer1(
    x: jax.Array,  # [B, H, W, 64] post stem+maxpool
    folded: tuple,
    interpret: bool = False,
    band: int = 32,
) -> jax.Array:
    return fused_chain(x, folded, ("ds", "id", "id"),
                       interpret=interpret, band=band)
