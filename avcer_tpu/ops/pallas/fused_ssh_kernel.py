"""Pallas TPU kernel: SSH context module + detection heads as ONE program.

Why: after the backbone chains fuse (fused_resnet_kernel), the detector's
remaining HBM round-trips at the 640 bucket are the FPN/SSH/head sections
(~0.09 ms/frame of the 0.54 total, BENCH_NOTES round-4). Per FPN scale the
SSH module (retina_face_net.py:41-67) is a 5-conv DAG

    c3   = convBN3x3(x)                 # out_ch/2, no relu
    c5_1 = convBN3x3(x)      + (leaky)relu
    c5   = convBN3x3(c5_1)              # no relu
    c7_2 = convBN3x3(c5_1)   + (leaky)relu
    c7   = convBN3x3(c7_2)              # no relu
    out  = relu(concat([c3, c5, c7]))

whose output is consumed ONLY by the three 1x1 heads (retina_face.py:9-43).
This kernel keeps the whole DAG in VMEM per spatial band and never
materializes the SSH output: relu(concat) @ W_head decomposes into a sum
of per-segment matmuls

    head(x) = relu(c3) @ W[:C/2] + relu(c5) @ W[C/2:3C/4]
            + relu(c7) @ W[3C/4:] + bias

so each band writes only the tiny head outputs (loc 8, conf 4, ldm 20
lanes per anchor pair) back to HBM.

Exactness: BN folds to scale/shift; convs accumulate f32 on the MXU and
round to the compute dtype at each conv output (the unfused path's
rounding points); the head sum differs from the XLA 256-contraction dot
only in f32-addition associativity. Same parameter tree as the unfused
SSH/head modules (models/retinaface.SSHHeadsFolded).

Reference behavior contract: /root/reference/src/data/face_detection/ibug/
face_detection/retina_face/retina_face_net.py:41-67 (SSH),
retina_face.py:9-43 (ClassHead/BboxHead/LandmarkHead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avcer_tpu.ops.pallas.fused_resnet_kernel import (
    _mask_oof, _pick_band, _q_acc_dtype, _quant,
)


def _cbn3(a, w, inv, shift, leaky: float | None, sx=None, out_dt=None):
    """3x3/s1 VALID conv + folded BN over a (r, c, ci) band; activation:
    None = linear, 0.0 = relu, >0 = leaky relu (retina_face_net.py:9-38).
    With ``sx`` the conv runs int8 (w is the quantized kernel, inv the
    merged dequant+BN multiply — layers.int8_conv semantics)."""
    r, c, ci = a.shape
    co = w.shape[-1]
    m = (r - 2) * (c - 2)
    if sx is not None:
        acc_dt = _q_acc_dtype()
        a = _quant(a, sx, jnp.int8 if acc_dt == jnp.int32 else jnp.float32)
        w = w.astype(a.dtype)
        dt = out_dt
    else:
        acc_dt = jnp.float32
        dt = w.dtype
    acc = jnp.zeros((m, co), acc_dt)
    for ky in range(3):
        for kx in range(3):
            sl = a[ky:ky + r - 2, kx:kx + c - 2, :].reshape(m, ci)
            acc = acc + jnp.dot(sl, w[ky, kx],
                                preferred_element_type=acc_dt)
    if sx is not None:
        y = (acc.astype(jnp.float32) * inv + shift).astype(dt)
    else:
        y = acc.astype(dt) * inv + shift
    if leaky is not None:
        y = jnp.maximum(y, 0) if leaky == 0.0 else jnp.where(
            y >= 0, y, y * jnp.asarray(leaky, y.dtype))
    return y.reshape(r - 2, c - 2, co)


def _mm1(a, w, inv, shift, leaky: float, sx=None, out_dt=None):
    """1x1 ConvBN (+leaky/relu) over a (r, c, ci) band — the FPN lateral."""
    r, c, ci = a.shape
    a2 = a.reshape(r * c, ci)
    if sx is not None:
        acc_dt = _q_acc_dtype()
        a2 = _quant(a2, sx, jnp.int8 if acc_dt == jnp.int32 else jnp.float32)
        y = (jnp.dot(a2, w.astype(a2.dtype), preferred_element_type=acc_dt
                     ).astype(jnp.float32) * inv + shift).astype(out_dt)
    else:
        acc = jnp.dot(a2, w, preferred_element_type=jnp.float32)
        y = acc.astype(w.dtype) * inv + shift
    y = jnp.maximum(y, 0) if leaky == 0.0 else jnp.where(
        y >= 0, y, y * jnp.asarray(leaky, y.dtype))
    return y.reshape(r, c, -1)


def _kernel(xp_hbm, *refs, th: int, h: int, w: int, leaky: float,
            quant: bool = False, n_lat: int = 0, has_up: bool = False,
            emit_feat: bool = False, cols_used: int = 0):
    n = 4 if n_lat == 2 else 3
    i = 0
    up_hbm = None
    if has_up:
        up_hbm, i = refs[0], 1
    lat_w = refs[i:i + 3 * n_lat]
    i += 3 * n_lat
    (w3, i3, s3, w51, i51, s51, w5, i5, s5, w72, i72, s72, w7, i7, s7,
     wl, bl, wc, bc, wm, bm) = [r[:] for r in refs[i:i + 21]]
    rest = refs[i + 21:]
    if quant:
        sx_ref, rest = rest[0], rest[1:]
        sxs = [sx_ref[k] for k in range(5 + n_lat)]
    else:
        sxs = [None] * (5 + n_lat)
    lo_ref, co_ref, ld_ref = rest[0], rest[1], rest[2]
    rest = rest[3:]
    feat_ref = None
    if emit_feat:
        feat_ref, rest = rest[0], rest[1:]
    if has_up:
        xb, ub, sem, sem2 = rest[:4]
    else:
        xb, sem = rest[:2]

    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * th

    dma = pltpu.make_async_copy(xp_hbm.at[b, pl.ds(r0, th + 2 * n)], xb, sem)
    dma.start()
    if has_up:
        dma2 = pltpu.make_async_copy(
            up_hbm.at[b, pl.ds(r0, th + 2 * n)], ub, sem2)
        dma2.start()
        dma2.wait()
    dma.wait()

    out_dt = xb.dtype
    lat_sxs, sxs = sxs[:n_lat], sxs[n_lat:]
    cur = xb[:]
    if cols_used and cols_used != cur.shape[1]:
        # HBM copy + scratch are column-padded to the (8,128) tile so the
        # DMA memref slice is tile-aligned; restore the true band width.
        cur = cur[:, :cols_used]
    if n_lat >= 1:   # FPN lateral 1x1 (output{i}) + optional top-down add
        cur = _mm1(cur, lat_w[0][:], lat_w[1][:], lat_w[2][:], leaky,
                   lat_sxs[0], out_dt)
    if has_up:
        u = ub[:]
        if cols_used and cols_used != u.shape[1]:
            u = u[:, :cols_used]
        cur = cur + u
    cur = _mask_oof(cur, r0 - n, -n, h, w)
    if n_lat == 2:   # FPN merge 3x3 (merge{i})
        cur = _cbn3(cur, lat_w[3][:], lat_w[4][:], lat_w[5][:], leaky,
                    lat_sxs[1], out_dt)
        cur = _mask_oof(cur, r0 - 3, -3, h, w)

    # folded order: conv3X3, conv5X5_1, conv5X5_2, conv7X7_2, conv7x7_3
    sx3, sx51, sx5, sx72, sx7 = sxs
    x = cur                                          # (th+6, w+6, C)
    if emit_feat:
        feat_ref[0] = x[3:th + 3, 3:w + 3]           # the FPN scale output
    c51 = _cbn3(x, w51, i51, s51, leaky, sx51, out_dt)   # (th+4, w+4, C/4)
    c51 = _mask_oof(c51, r0 - 2, -2, h, w)
    c72 = _cbn3(c51, w72, i72, s72, leaky, sx72, out_dt)  # (th+2, w+2, C/4)
    c72 = _mask_oof(c72, r0 - 1, -1, h, w)
    c7 = _cbn3(c72, w7, i7, s7, None, sx7, out_dt)   # (th, w, C/4)
    c5 = _cbn3(c51[1:th + 3, 1:w + 3], w5, i5, s5, None, sx5, out_dt)
    c3 = _cbn3(x[2:th + 4, 2:w + 4], w3, i3, s3, None, sx3, out_dt)

    m = th * w
    half = c3.shape[-1]
    q = c5.shape[-1]
    s1 = jnp.maximum(c3, 0).reshape(m, half)         # relu(concat) segments
    s2 = jnp.maximum(c5, 0).reshape(m, q)
    s3g = jnp.maximum(c7, 0).reshape(m, q)

    def head(wh, bh, out_ref):
        acc = jnp.dot(s1, wh[:half], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s2, wh[half:half + q],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(s3g, wh[half + q:],
                            preferred_element_type=jnp.float32)
        out_ref[0] = (acc.astype(wh.dtype) + bh).reshape(th, w, -1)

    head(wl, bl, lo_ref)
    head(wc, bc, co_ref)
    head(wm, bm, ld_ref)


@functools.partial(jax.jit,
                   static_argnames=("leaky", "interpret", "band",
                                    "emit_feature"))
def fused_ssh_heads(
    x: jax.Array,       # [B, H, W, Ci] FPN scale feature (or, with
                        # fpn_lat, the raw backbone feature), compute dtype
    conv_folded: tuple,  # 5 x (w [3,3,ci,co], inv, shift):
                         # conv3X3, conv5X5_1, conv5X5_2, conv7X7_2, conv7x7_3
    head_folded: tuple,  # 3 x (w [C, out], bias): Bbox, Class, Landmark
    leaky: float = 0.0,
    interpret: bool = False,
    band: int = 32,
    act_s: jax.Array | None = None,  # [5+n_lat] f32 static activation
                                     # scales -> int8 convs (heads exact);
                                     # order: lateral, merge, then SSH convs
    fpn_lat: tuple | None = None,    # (w [Ci, C], inv, shift): FPN lateral
    fpn_merge: tuple | None = None,  # (w [3,3,C,C], inv, shift): FPN merge
    up: jax.Array | None = None,     # [B, H, W, C] upsampled higher level
    emit_feature: bool = False,      # also return this scale's FPN output
):
    bsz, h, w, _ = x.shape
    n_lat = (fpn_lat is not None) + (fpn_merge is not None)
    if fpn_merge is not None and fpn_lat is None:
        raise ValueError("fpn_merge requires fpn_lat")
    n = 4 if n_lat == 2 else 3
    th = _pick_band(h, band)
    nb = -(-h // th)
    hp = nb * th
    dtype = x.dtype
    c_feat = conv_folded[0].shape[-2] if fpn_lat is None \
        else fpn_lat[0].shape[-1]
    # Mosaic tile-alignment (see fused_resnet_kernel.fused_chain): the DMA
    # slice's second-minor dim must be 8-aligned and its lane dim
    # 128-aligned. Column-pad the HBM copies + scratch (the kernel slices
    # back to cols_used); zero-pad sub-128 channel counts (mobilenet's
    # C=64 FPN) together with every weight row that reads them — zero
    # channels contribute exactly zero to each dot product.
    cols_used = w + 2 * n
    cols_pad = -(-cols_used // 8) * 8
    pad_ci = (-x.shape[-1]) % 128
    pad_cf = (-c_feat) % 128
    pad = ((0, 0), (n, n + hp - h), (n, n + cols_pad - cols_used),
           (0, pad_ci))
    xp = jnp.pad(x, pad)
    fpn_lat = list(fpn_lat) if fpn_lat is not None else None
    fpn_merge = list(fpn_merge) if fpn_merge is not None else None
    conv_folded = list(conv_folded)
    if pad_ci and fpn_lat is not None:
        fpn_lat[0] = jnp.pad(fpn_lat[0], ((0, pad_ci), (0, 0)))
    def _pad_last(t, p):
        # inv/shift may be [C] or [1, C]: pad the channel (last) axis only
        return jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, p)])

    if pad_cf:
        if fpn_lat is not None:
            # lateral output (and merge in/out) pad to the lane tile so the
            # padded top-down band adds lane-to-lane; tail lanes stay 0.
            fpn_lat[0] = jnp.pad(fpn_lat[0], ((0, 0), (0, pad_cf)))
            fpn_lat[1] = _pad_last(fpn_lat[1], pad_cf)
            fpn_lat[2] = _pad_last(fpn_lat[2], pad_cf)
        if fpn_merge is not None:
            fpn_merge[0] = jnp.pad(
                fpn_merge[0], ((0, 0), (0, 0), (0, pad_cf), (0, pad_cf)))
            fpn_merge[1] = _pad_last(fpn_merge[1], pad_cf)
            fpn_merge[2] = _pad_last(fpn_merge[2], pad_cf)
        # SSH convs reading the (padded) feature: conv3X3 + conv5X5_1
        for wi in (0, 3):
            conv_folded[wi] = jnp.pad(
                conv_folded[wi], ((0, 0), (0, 0), (0, pad_cf), (0, 0)))
    outs = [jax.ShapeDtypeStruct((bsz, hp, w, hw.shape[-1]), dtype)
            for hw, _ in zip(head_folded[::2], head_folded[1::2])]
    out_specs = [
        pl.BlockSpec((1, th, w, o.shape[-1]), lambda b, r: (b, r, 0, 0),
                     memory_space=pltpu.VMEM)
        for o in outs
    ]
    if emit_feature:
        outs.append(jax.ShapeDtypeStruct((bsz, hp, w, c_feat + pad_cf),
                                         dtype))
        out_specs.append(
            pl.BlockSpec((1, th, w, c_feat + pad_cf),
                         lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM))

    operands: tuple = ()
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if up is not None:
        operands += (jnp.pad(up.astype(dtype),
                             pad[:3] + ((0, pad_cf),)),)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands += tuple(fpn_lat or ()) + tuple(fpn_merge or ())
    operands += tuple(conv_folded) + tuple(head_folded)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                 for _ in range(len(operands) - (up is not None))]
    if act_s is not None:
        operands += (act_s.astype(jnp.float32),)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch = [pltpu.VMEM((th + 2 * n, cols_pad, x.shape[-1] + pad_ci),
                          dtype)]
    if up is not None:
        scratch.append(pltpu.VMEM((th + 2 * n, cols_pad, c_feat + pad_cf),
                                  dtype))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    if up is not None:
        scratch.append(pltpu.SemaphoreType.DMA(()))

    res = pl.pallas_call(
        functools.partial(_kernel, th=th, h=h, w=w, leaky=leaky,
                          quant=act_s is not None, n_lat=n_lat,
                          has_up=up is not None, emit_feat=emit_feature,
                          cols_used=cols_used),
        grid=(bsz, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(outs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, *operands)
    res = tuple(res)
    if hp != h:
        res = tuple(o[:, :h] for o in res)
    if emit_feature and pad_cf:
        res = res[:-1] + (res[-1][..., :c_feat],)
    return res
