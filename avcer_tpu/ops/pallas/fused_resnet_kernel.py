"""Pallas TPU kernel: ResNet50 layer1 as ONE fused program.

Why layer1: at the 640x360 bucket the three 64-channel bottlenecks are the
detector's worst section — 0.146 ms/frame of 0.544 at ~8% MFU (BENCH_NOTES
round-4 breakdown). The section is HBM-BOUND, not MXU-bound: XLA cannot fuse
across convolutions, so every conv round-trips its activations through HBM —
~4.4 GB of intermediate traffic per 32-frame batch at 160x90 spatial
(inputs 59 MB, output 236 MB; everything else is re-read/re-write of
intermediates). This kernel runs the whole chain (3 bottlenecks = 10 convs +
BN + ReLU + residuals) per spatial band inside VMEM: HBM traffic drops to
one read of the input band + one write of the output band.

Exactness: BatchNorm (inference) folds into a per-channel scale/shift
(mathematically identical, models/layers.TorchBatchNorm does the same fold);
each conv accumulates bf16 x bf16 -> f32 on the MXU exactly like the XLA
conv, then rounds to bf16 before the scale/shift — the same rounding points
as the unfused path. 3x3 convs run as 9 shifted matmuls whose f32 partial
sums differ from XLA's reduction order only in float-addition associativity.
Converted reference checkpoints work unchanged (same parameter tree — see
models/retinaface.TVBottleneck fold mode).

Behavior contract: torchvision resnet50 layer1 under
/root/reference/src/data/face_detection/ibug/face_detection/retina_face/
retina_face.py:60 (IntermediateLayerGetter over tv resnet50), i.e. 3
Bottlenecks 64->256 at stride 1 with a downsample projection on the first.

Band decomposition: output rows split into bands of TH rows; each program
needs TH+6 input rows (halo 3: one ring per 3x3 conv) which it DMAs from a
zero-padded HBM copy of the input. Out-of-frame halo positions must be ZERO
at each 3x3 conv's input (conv zero-padding semantics) but hold junk after
any preceding bias+ReLU — they are re-masked before every 3x3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# folded-conv flat order fed to the kernel: (matmul weight, bn inv, bn shift)
# triples for each conv in execution order
CONV_ORDER = (
    "b0_conv1", "b0_conv2", "b0_conv3", "b0_downsample",
    "b1_conv1", "b1_conv2", "b1_conv3",
    "b2_conv1", "b2_conv2", "b2_conv3",
)


def _mm(a2d, w, inv, shift, relu=True):
    """conv-as-matmul + folded BN: f32 MXU accumulation, round to bf16 at
    the conv output (the unfused path's rounding point), then scale/shift
    in the compute dtype (TorchBatchNorm inference fold)."""
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


def _kernel(xp_hbm, *refs, th: int, h: int, w: int):
    *w_refs, o_ref, xb, sem = refs
    (w1a, i1a, s1a, w2a, i2a, s2a, w3a, i3a, s3a, wd, id_, sd,
     w1b, i1b, s1b, w2b, i2b, s2b, w3b, i3b, s3b,
     w1c, i1c, s1c, w2c, i2c, s2c, w3c, i3c, s3c) = [r[:] for r in w_refs]

    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * th

    dma = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(r0, th + 6)], xb, sem)
    dma.start()
    dma.wait()

    rr, wp = th + 6, w + 6
    x = xb[:]                                           # (rr, wp, 64)
    # bottleneck 0 (downsample projection on the residual)
    t1 = _mm(x.reshape(rr * wp, 64), w1a, i1a, s1a).reshape(rr, wp, 64)
    t1 = _mask_oof(t1, r0, 3, h, w)
    t2 = _conv3x3(t1, w2a, i2a, s2a)                    # (rr-2, wp-2, 64)
    m2 = (rr - 2) * (wp - 2)
    y1 = _mm(t2.reshape(m2, 64), w3a, i3a, s3a, relu=False)
    ds = _mm(x[1:rr - 1, 1:wp - 1, :].reshape(m2, 64), wd, id_, sd,
             relu=False)
    y1 = jnp.maximum(y1 + ds, 0).reshape(rr - 2, wp - 2, 256)
    # bottleneck 1
    u1 = _mm(y1.reshape(m2, 256), w1b, i1b, s1b).reshape(rr - 2, wp - 2, 64)
    u1 = _mask_oof(u1, r0, 2, h, w)
    u2 = _conv3x3(u1, w2b, i2b, s2b)                    # (rr-4, wp-4, 64)
    m3 = (rr - 4) * (wp - 4)
    y2 = _mm(u2.reshape(m3, 64), w3b, i3b, s3b, relu=False)
    y2 = jnp.maximum(
        y2 + y1[1:rr - 3, 1:wp - 3, :].reshape(m3, 256), 0
    ).reshape(rr - 4, wp - 4, 256)
    # bottleneck 2
    v1 = _mm(y2.reshape(m3, 256), w1c, i1c, s1c).reshape(rr - 4, wp - 4, 64)
    v1 = _mask_oof(v1, r0, 1, h, w)
    v2 = _conv3x3(v1, w2c, i2c, s2c)                    # (th, w, 64)
    mo = th * w
    y3 = _mm(v2.reshape(mo, 64), w3c, i3c, s3c, relu=False)
    y3 = jnp.maximum(y3 + y2[1:th + 1, 1:w + 1, :].reshape(mo, 256), 0)
    o_ref[0] = y3.reshape(th, w, 256)


def _pick_band(h: int, cap: int = 32) -> int:
    """Band height <= cap, preferring an exact divisor of h (a divisor
    avoids computing padded junk rows in the last band: the 640x360 bucket's
    h=90 gets 3 bands of 30 instead of 32+32+26-with-6-junk-rows). Falls
    back to cap with pad-and-slice when no near divisor exists."""
    if h <= cap:
        return h
    for th in range(cap, max(cap - 16, 1), -1):
        if h % th == 0:
            return th
    return cap


@functools.partial(jax.jit, static_argnames=("interpret", "band"))
def fused_layer1(
    x: jax.Array,  # [B, H, W, 64] compute-dtype NHWC (post stem+maxpool)
    folded: tuple,  # flat (w, inv, shift) x CONV_ORDER — see fold_bottleneck
    interpret: bool = False,
    band: int = 32,
) -> jax.Array:
    bsz, h, w, _ = x.shape
    th = _pick_band(h, band)
    nb = -(-h // th)
    hp = nb * th
    xp = jnp.pad(x, ((0, 0), (3, 3 + hp - h), (3, 3), (0, 0)))
    dtype = x.dtype

    w_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in folded
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, h=h, w=w),
        grid=(bsz, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, th, w, 256), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w, 256), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 6, w + 6, 64), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *folded)
    return out[:, :h] if hp != h else out
