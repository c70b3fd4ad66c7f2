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
- ``fused_chain``: any bottleneck chain — stride-1 chains for the identity
  tails of layers 2-3, or a chain whose FIRST block is a stride-2 entry
  bottleneck, so whole layers fuse. Two entry conventions exist in the
  reference stacks:
  * ``"s2ds"`` — torchvision v1.5 (RetinaFace backbone): stride on the
    3x3 conv (p1) + 1x1/s2 projection residual;
  * ``"s2pre"`` — TF v1 (emotion CNN, architectures/video.py): stride on
    conv1 AND the projection (both 1x1/s2 VALID), 3x3 stays stride-1 SAME
    — so the whole block collapses to a stride-2 subsample of the input
    band followed by an ordinary ``"ds"`` block at output resolution.
  Stride-2 slices of VMEM values are expressed as slice-then-reshape-split
  (``a[k:k+2m].reshape(m, 2, ...)[:, 0]``), the form Mosaic lowers without
  strided-gather support.

Stride-2 band geometry: output band rows ``[q0, q0+TH)`` after the entry
block need entry-output rows ``[q0-n1, q0+TH+n1)`` (n1 = following
stride-1 blocks), whose conv3x3/s2/p1 taps read input rows
``[2*(q0-n1)-1, 2*(q0+TH+n1-1)+1]`` — a band of ``2*(TH+2*n1)+2`` rows
DMA'd from the zero-padded HBM copy at offset ``2*q0``.
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


def _q_acc_dtype():
    """int32 on hardware; f32 accumulation of the EXACT int8 values under
    the CPU drift-study knob (layers._int8_f32_accum: XLA:CPU int8 dots are
    scalar-emulated ~50x slower; f32 products of int8 values are exact and
    sums stay exact below 2^24)."""
    from avcer_tpu.models.layers import _int8_f32_accum

    return jnp.float32 if _int8_f32_accum() else jnp.int32


def _quant(a, sx, idt=jnp.int8):
    """layers.int8_conv's symmetric per-tensor activation quantize with a
    CALIBRATED static scale (round -> clip -> int8)."""
    return jnp.clip(jnp.round(a.astype(jnp.float32) / sx), -127, 127
                    ).astype(idt)


def _mm_q(a2d, sx, wq, mult, shift, dtype, relu=True):
    """int8 conv-as-matmul: quantize the bf16 activation with the static
    scale, int8 x int8 -> int32 on the MXU, then one fused
    dequant+BatchNorm multiply (mult = sx*sw*bn_inv, f32) — the XLA int8
    path's math with the dequant and BN rounding steps merged (the only
    deviation from layers.int8_conv + TorchBatchNorm; gated by test)."""
    acc_dt = _q_acc_dtype()
    aq = _quant(a2d, sx, jnp.int8 if acc_dt == jnp.int32 else jnp.float32)
    acc = jnp.dot(aq, wq.astype(aq.dtype), preferred_element_type=acc_dt)
    y = (acc.astype(jnp.float32) * mult + shift).astype(dtype)
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


def _conv3x3_q(a, sx, wq, mult, shift, dtype):
    """int8 3x3/s1 VALID conv: the band quantizes ONCE (per-tensor static
    scale), then 9 shifted int8 tap matmuls accumulate in int32."""
    r, c, ci = a.shape
    co = wq.shape[-1]
    m = (r - 2) * (c - 2)
    acc_dt = _q_acc_dtype()
    aq = _quant(a, sx, jnp.int8 if acc_dt == jnp.int32 else jnp.float32)
    acc = jnp.zeros((m, co), acc_dt)
    for ky in range(3):
        for kx in range(3):
            sl = aq[ky:ky + r - 2, kx:kx + c - 2, :].reshape(m, ci)
            acc = acc + jnp.dot(sl, wq[ky, kx].astype(aq.dtype),
                                preferred_element_type=acc_dt)
    y = (acc.astype(jnp.float32) * mult + shift).astype(dtype)
    return jnp.maximum(y, 0).reshape(r - 2, c - 2, co)


def _mask_oof(a, row0, col0, h, w):
    """Zero positions outside the real frame (conv zero-padding semantics).

    Band-array position (s, c) holds frame pixel (row0 + s, col0 + c);
    anything outside [0,h) x [0,w) must be zero before entering a 3x3 conv.
    """
    # Mosaic can't insert a minor dim on an i1 vector ("Insertion of minor
    # dim that is not a no-op only supported for 32-bit types") and 3-D
    # iotas at band size blow the VMEM stack (two int32 [r, c, ch] temps
    # per mask). So: 2-D iotas -> i1 mask -> f32 (32-bit insert is legal)
    # -> multiply. Exact: band values are finite bf16/f32, so x*1 == x and
    # x*0 == 0 (the conv zero-padding semantics).
    rows = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, a.shape[:2], 1)
    fr = row0 + rows
    fc = col0 + cols
    ok = (fr >= 0) & (fr < h) & (fc >= 0) & (fc < w)
    return a * ok.astype(jnp.float32)[..., None].astype(a.dtype)


def _take_s2(a, ky: int, kx: int, ro: int, co: int):
    """Stride-2 tap slice a[ky::2, kx::2][:ro, :co] via slice-then-
    reshape-split (Mosaic has no strided VMEM slicing). Needs
    a.shape[0] >= ky + 2*ro and a.shape[1] >= kx + 2*co (ky, kx <= 2, so
    the band carries 2 extra rows/cols)."""
    rows = a[ky:ky + 2 * ro].reshape(ro, 2, *a.shape[1:])[:, 0]
    return rows[:, kx:kx + 2 * co].reshape(ro, co, 2, a.shape[-1])[:, :, 0]


def _kernel(xp_hbm, *refs, th: int, h: int, w: int, blocks: tuple[str, ...],
            hin: int = 0, win: int = 0, quant: bool = False,
            cols_used: int = 0):
    n = len(blocks)
    s2 = blocks[0] in ("s2ds", "s2pre")
    n1 = n - 1
    n_w = sum(12 if b in ("ds", "s2ds", "s2pre") else 9 for b in blocks)
    w_refs = refs[:n_w]
    rest = refs[n_w:]
    if quant:
        sx_ref, rest = rest[0], rest[1:]
    o_ref, xb, sem = rest[0], rest[1], rest[2]
    vals = [r[:] for r in w_refs]
    sx_i = 0

    def next_sx():
        nonlocal sx_i
        v = sx_ref[sx_i]
        sx_i += 1
        return v

    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * th

    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(2 * r0 if s2 else r0, xb.shape[0])], xb, sem)
    dma.start()
    dma.wait()

    cur = xb[:]                                  # band at input resolution
    if cols_used and cols_used != cur.shape[1]:
        # The HBM copy + scratch are column-padded to the (8,128) tile so
        # the DMA's memref slice is tile-aligned (Mosaic: "Slice shape
        # along dimension 2 must be aligned to tiling (8)"); the band's
        # true geometry is restored here with a vector slice.
        cur = cur[:, :cols_used]
    out_dt = cur.dtype
    if blocks[0] == "s2pre":
        # conv1/projection stride-2 (TF v1): both read input (2j, 2i) only,
        # so subsample once and the whole chain runs at output resolution.
        cur = _take_s2(cur, 0, 0, th + 2 * n, w + 2 * n)
        blocks = ("ds",) + blocks[1:]
    off = n
    for kind in blocks:
        take = 12 if kind in ("ds", "s2ds") else 9
        (w1, i1, s1, w2, i2, s2w, w3, i3, s3, *ds_w) = vals[:take]
        del vals[:take]
        r, c, ci = cur.shape
        if kind == "s2ds":
            # stride-2 entry bottleneck: 1x1 at input res, masked, 3x3/s2
            # as 9 stride-2 tap matmuls, 1x1/s2 projection residual.
            ro, co = th + 2 * n1, (w + 2 * n1)
            m = ro * co
            if quant:
                t1 = _mm_q(cur.reshape(r * c, ci), next_sx(), w1, i1, s1,
                           out_dt).reshape(r, c, -1)
            else:
                t1 = _mm(cur.reshape(r * c, ci), w1, i1, s1).reshape(r, c, -1)
            t1 = _mask_oof(t1, 2 * r0 - 2 * n1 - 1, -(2 * n1 + 1), hin, win)
            p = t1.shape[-1]
            if quant:
                qdt = _q_acc_dtype()
                t1 = _quant(t1, next_sx(),
                            jnp.int8 if qdt == jnp.int32 else jnp.float32)
                w2 = w2.astype(t1.dtype)
                acc = jnp.zeros((m, w2.shape[-1]), qdt)
            else:
                acc = jnp.zeros((m, w2.shape[-1]), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    sl = _take_s2(t1, ky, kx, ro, co).reshape(m, p)
                    acc = acc + jnp.dot(sl, w2[ky, kx],
                                        preferred_element_type=acc.dtype)
            if quant:
                t2 = jnp.maximum(
                    (acc.astype(jnp.float32) * i2 + s2w).astype(out_dt), 0)
                y = _mm_q(t2, next_sx(), w3, i3, s3, out_dt, relu=False)
                wd, idv, sd = ds_w
                res = _mm_q(_take_s2(cur, 1, 1, ro, co).reshape(m, ci),
                            next_sx(), wd, idv, sd, out_dt, relu=False)
            else:
                t2 = jnp.maximum(acc.astype(w2.dtype) * i2 + s2w, 0)
                y = _mm(t2, w3, i3, s3, relu=False)
                wd, idv, sd = ds_w
                res = _mm(_take_s2(cur, 1, 1, ro, co).reshape(m, ci),
                          wd, idv, sd, relu=False)
            cur = jnp.maximum(y + res, 0).reshape(ro, co, y.shape[-1])
            off = n1
            continue
        m = (r - 2) * (c - 2)
        if quant:
            t1 = _mm_q(cur.reshape(r * c, ci), next_sx(), w1, i1, s1,
                       out_dt).reshape(r, c, -1)
            t1 = _mask_oof(t1, r0 - off, -off, h, w)
            t2 = _conv3x3_q(t1, next_sx(), w2, i2, s2w, out_dt)
            y = _mm_q(t2.reshape(m, -1), next_sx(), w3, i3, s3, out_dt,
                      relu=False)
        else:
            t1 = _mm(cur.reshape(r * c, ci), w1, i1, s1).reshape(r, c, -1)
            t1 = _mask_oof(t1, r0 - off, -off, h, w)
            t2 = _conv3x3(t1, w2, i2, s2w)       # (r-2, c-2, p)
            y = _mm(t2.reshape(m, -1), w3, i3, s3, relu=False)
        if kind == "ds":
            wd, idv, sd = ds_w
            if quant:
                res = _mm_q(cur[1:r - 1, 1:c - 1, :].reshape(m, ci),
                            next_sx(), wd, idv, sd, out_dt, relu=False)
            else:
                res = _mm(cur[1:r - 1, 1:c - 1, :].reshape(m, ci), wd, idv,
                          sd, relu=False)
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
    folded: tuple,       # flat (w, inv, shift[, ds triple]) per block;
                         # int8 mode: (wq int8, mult, shift) per conv
    blocks: tuple[str, ...],  # "s2ds"/"s2pre" (stride-2 entry, first only)
                              # | "ds" (projection residual) | "id" (identity)
    interpret: bool = False,
    band: int = 32,
    act_s: jax.Array | None = None,  # [n_convs] f32 static activation
                                     # scales -> int8 chain (layers.int8_conv
                                     # semantics, TVBottleneckFolded quant)
) -> jax.Array:
    bsz, h, w, _ = x.shape
    n = len(blocks)
    dtype = x.dtype
    c_out = folded[6].shape[-1]  # first block conv3 out channels
    s2 = blocks[0] in ("s2ds", "s2pre")
    if s2:
        if any(b != "id" for b in blocks[1:]):
            raise ValueError("a stride-2 entry must be the single entry block")
        n1 = n - 1
        ho, wo = (h + 1) // 2, (w + 1) // 2       # stride-2 out dims
        th = _pick_band(ho, band)
        nb = -(-ho // th)
        hp = nb * th
        if blocks[0] == "s2ds":
            # 3x3/s2/p1 taps read input rows [2*(q0-n1)-1, 2*(q0+th+n1-1)+1]
            pad_r = (2 * n1 + 1, 2 * hp + 2 * n1 + 1 - h)
            pad_c = (2 * n1 + 1, 2 * wo + 2 * n1 + 1 - w)
            scratch_rows = 2 * (th + 2 * n1) + 2
            scratch_cols = 2 * (wo + 2 * n1) + 2
        else:
            # 1x1/s2 entry reads input rows 2*(q0-n+t): halo n at OUTPUT
            # resolution (every block's 3x3 runs post-subsample)
            pad_r = (2 * n, 2 * hp + 2 * n - h)
            pad_c = (2 * n, 2 * wo + 2 * n - w)
            scratch_rows = 2 * (th + 2 * n)
            scratch_cols = 2 * (wo + 2 * n)
        kern = functools.partial(_kernel, th=th, h=ho, w=wo, blocks=blocks,
                                 hin=h, win=w, quant=act_s is not None)
        out_w, out_h = wo, ho
    else:
        th = _pick_band(h, band)
        nb = -(-h // th)
        hp = nb * th
        pad_r, pad_c = (n, n + hp - h), (n, n)
        scratch_rows, scratch_cols = th + 2 * n, w + 2 * n
        kern = functools.partial(_kernel, th=th, h=h, w=w, blocks=blocks,
                                 quant=act_s is not None)
        out_w, out_h = w, h
    # Mosaic requires the DMA slice's second-minor dim to be tile-aligned
    # ("Slice shape along dimension 2 must be aligned to tiling (8)"):
    # column-pad the HBM copy + scratch to a multiple of 8 and let the
    # kernel value-slice back to the true band width (cols_used).
    cols_used = scratch_cols
    scratch_cols = -(-scratch_cols // 8) * 8
    pad_c = (pad_c[0], pad_c[1] + scratch_cols - cols_used)
    kern = functools.partial(kern, cols_used=cols_used)
    # Mosaic likewise requires the DMA slice's lane dim tile-aligned (128):
    # zero-pad the input channels and the first block's conv1 + projection
    # weight INPUT rows to match — zero channels contribute exactly zero to
    # every dot product, so the math is unchanged (no lane slicing needed).
    operands = list(folded)
    pad_ch = (-x.shape[-1]) % 128
    if pad_ch:
        if blocks[0] == "id":
            raise ValueError(
                "fused_chain with cin % 128 != 0 needs a projection entry "
                "block (identity residuals cannot be channel-padded)")
        operands[0] = jnp.pad(operands[0], ((0, pad_ch), (0, 0)))
        operands[9] = jnp.pad(operands[9], ((0, pad_ch), (0, 0)))
    xp = jnp.pad(x, ((0, 0), pad_r, pad_c, (0, pad_ch)))

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in folded]
    if act_s is not None:
        w_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(act_s.astype(jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=(bsz, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, th, out_w, c_out), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, out_w, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, scratch_cols, x.shape[-1] + pad_ch),
                       dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *operands)
    return out[:, :out_h] if hp != out_h else out


def fused_layer1(
    x: jax.Array,  # [B, H, W, 64] post stem+maxpool
    folded: tuple,
    interpret: bool = False,
    band: int = 32,
) -> jax.Array:
    return fused_chain(x, folded, ("ds", "id", "id"),
                       interpret=interpret, band=band)


# ---------------------------------------------------------------------------
# v2 ("flat") kernel: exp_r7b measured the banded 3-D kernel above at ~3x
# SLOWER than XLA's unfused layer1 (0.44-0.54 vs 0.144 ms/frame) despite the
# band DMA being ~1 us — the cost is Mosaic relayouts: every 3x3 tap slice
# ``a[ky:ky+r-2, kx:kx+c-2, :].reshape(m, ci)`` shifts BOTH the sublane (c)
# and packed-row dims of a 3-D value, materializing a relayouted copy per
# tap (9 per conv, 27+ per block). The flat kernel removes them:
#
# * the band lives as ONE 2-D value (R*C, ch) for the whole chain — row-major
#   flattening makes the (ky, kx) tap of a SAME 3x3 conv a ROW SLICE at
#   static offset (ky-1)*C + (kx-1) of a zero-extended copy, so each tap is
#   a 1-D sublane shift (and 6 of 9 share their shift class via kx);
# * geometry stays CONSTANT through the chain (SAME convs over the full
#   halo'd band instead of VALID shrinking): wrap-around junk from the flat
#   taps lands only at out-of-frame or halo positions, which the per-block
#   out-of-frame re-mask (required anyway for conv zero-padding semantics)
#   zeroes before every 3x3; halo junk never reaches the central th rows
#   the program emits (after n 3x3s, rows [n, R-n) are exact — R = th+2n);
# * identity residuals are the unshifted band value — no slicing at all;
# * the HBM padded copy is PRE-FLATTENED to (B, Hp*C, ch), so a band (which
#   overlaps its neighbors by 2n rows) is one contiguous, tile-aligned flat
#   slice and the DMA lands directly in the 2-D scratch.
#
# Mosaic constraints shape two details (both hit "unsupported shape cast"
# INTERNAL errors on real hardware otherwise):
# * the in-frame mask cannot be built in-kernel (2-D iota -> flat needs a
#   (rows, cpad) -> (rows*cpad, 1) reshape). It is geometry-only, so it is
#   precomputed OUTSIDE as an (nb, rows*cpad, 1) array and fed as a
#   per-band-blocked VMEM input;
# * the output leaves the kernel IN FLAT LAYOUT (the central th rows are
#   one contiguous sublane slice at offset n*cpad); XLA unflattens and
#   crops the cpad pitch after the pallas_call.
#
# Exactness: identical math to fused_chain — same folded weights, same f32
# MXU accumulation per tap, same bf16 rounding points, same mask semantics
# (junk positions are never read into in-frame outputs; equivalence pinned
# by tests against the 3-D kernel and the unfused path).
# ---------------------------------------------------------------------------


def _conv3x3_flat(a2d, w, inv, shift, cpad: int):
    """SAME 3x3/s1 conv on a row-major flat band (M, ci) with row pitch
    ``cpad``: 9 static row-offset slices of a zero-extended copy, f32 MXU
    accumulation, bf16 round, folded BN, ReLU."""
    m, ci = a2d.shape
    z = jnp.zeros((cpad + 8, ci), a2d.dtype)
    ext = jnp.concatenate([z, a2d, z], axis=0)
    base = cpad + 8
    acc = jnp.zeros((m, w.shape[-1]), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = base + (ky - 1) * cpad + (kx - 1)
            sl = jax.lax.slice_in_dim(ext, off, off + m, axis=0)
            acc = acc + jnp.dot(sl, w[ky, kx],
                                preferred_element_type=jnp.float32)
    y = acc.astype(w.dtype) * inv + shift
    return jnp.maximum(y, 0)


def _kernel_flat(xp_hbm, *refs, th: int, n: int,
                 blocks: tuple[str, ...], cpad: int):
    n_w = sum(12 if b == "ds" else 9 for b in blocks)
    w_refs = refs[:n_w]
    mask_ref, o_ref, xb, sem = (refs[n_w], refs[n_w + 1], refs[n_w + 2],
                                refs[n_w + 3])
    vals = [r[:] for r in w_refs]

    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * th
    rows = th + 2 * n

    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(r0 * cpad, rows * cpad)], xb, sem)
    dma.start()
    dma.wait()

    cur = xb[:]                                   # (rows*cpad, ch)
    out_dt = cur.dtype
    # Frame mask for the whole chain (geometry is constant): precomputed
    # per band outside the kernel (Mosaic cannot shape-cast a 2-D iota to
    # the flat (rows*cpad, 1) layout in-kernel).
    okd = mask_ref[0].astype(out_dt)              # (rows*cpad, 1)
    for kind in blocks:
        take = 12 if kind == "ds" else 9
        (w1, i1, s1, w2, i2, s2w, w3, i3, s3, *ds_w) = vals[:take]
        del vals[:take]
        t1 = _mm(cur, w1, i1, s1) * okd
        t2 = _conv3x3_flat(t1, w2, i2, s2w, cpad)
        y = _mm(t2, w3, i3, s3, relu=False)
        if kind == "ds":
            wd, idv, sd = ds_w
            res = _mm(cur, wd, idv, sd, relu=False)
        else:
            res = cur
        cur = jnp.maximum(y + res, 0)
    # Emit the central th rows IN FLAT LAYOUT: one contiguous sublane slice
    # (offset n*cpad is a multiple of 8). XLA unflattens outside.
    o_ref[0] = jax.lax.slice_in_dim(cur, n * cpad, (n + th) * cpad, axis=0)


@functools.partial(jax.jit, static_argnames=("blocks", "interpret", "band"))
def fused_chain_flat(
    x: jax.Array,        # [B, H, W, Cin] compute-dtype NHWC
    folded: tuple,       # flat (w, inv, shift[, ds triple]) per block
    blocks: tuple[str, ...],  # "ds" | "id" only (stride-1 chains)
    interpret: bool = False,
    band: int = 32,
) -> jax.Array:
    if any(b not in ("ds", "id") for b in blocks):
        raise ValueError("fused_chain_flat handles stride-1 chains only")
    bsz, h, w, cin = x.shape
    n = len(blocks)
    dtype = x.dtype
    c_out = folded[6].shape[-1]
    th = _pick_band(h, band)
    nb = -(-h // th)
    hp = nb * th
    # Row pitch: true band width w + 2n halo cols, padded to the 8-sublane
    # tile so flat row offsets r0*cpad stay tile-aligned for the DMA.
    cpad = -(-(w + 2 * n) // 8) * 8
    operands = list(folded)
    pad_ch = (-cin) % 128
    if pad_ch:
        if blocks[0] == "id":
            raise ValueError(
                "fused_chain_flat with cin % 128 != 0 needs a projection "
                "entry block (identity residuals cannot be channel-padded)")
        operands[0] = jnp.pad(operands[0], ((0, pad_ch), (0, 0)))
        operands[9] = jnp.pad(operands[9], ((0, pad_ch), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (n, n + hp - h), (n, cpad - w - n), (0, pad_ch)))
    xp = xp.reshape(bsz, (hp + 2 * n) * cpad, cin + pad_ch)

    # Per-band in-frame mask, flat layout (geometry-only — computed here in
    # XLA; band rb's rows [rb*th, rb*th + rows) of the padded frame).
    rows = th + 2 * n
    ri = jnp.arange(hp + 2 * n)
    ci = jnp.arange(cpad)
    ok2d = ((ri[:, None] >= n) & (ri[:, None] < n + h)
            & (ci[None, :] >= n) & (ci[None, :] < n + w))
    maskp = jnp.stack(
        [ok2d[rb * th: rb * th + rows] for rb in range(nb)]
    ).astype(jnp.float32).reshape(nb, rows * cpad, 1)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in folded]
    mask_spec = pl.BlockSpec((1, rows * cpad, 1), lambda b, r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_flat, th=th, n=n, blocks=blocks,
                          cpad=cpad),
        grid=(bsz, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs + [mask_spec],
        out_specs=pl.BlockSpec(
            (1, th * cpad, c_out), lambda b, r: (b, r, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp * cpad, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM(((th + 2 * n) * cpad, cin + pad_ch), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, *operands, maskp)
    # Unflatten the cpad pitch and crop halo columns / pad rows in XLA.
    out = out.reshape(bsz, hp, cpad, c_out)[:, :, n:n + w]
    return out[:, :h] if hp != h else out
