"""Pallas TPU kernel: batched greedy NMS.

Same contract as ops.nms.nms_mask (legacy +1 IoU, strict > suppresses), but
as a single fused kernel: the KxK IoU matrix is computed once in VMEM and the
greedy sweep runs as a fori_loop over rows without materializing
intermediates in HBM. Grid = one program per frame.

The XLA version is the default (K=64 is small); this kernel exists for the
high-K regime (nms_candidates up to 512) where the IoU matrix and the
sequential sweep dominate, and as the template for fusing decode+NMS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_thresh: float):
    """Whole-batch kernel: the [B, K, K] IoU tensor lives in VMEM and the
    greedy sweep is batch-vectorized (B*K*K fp32 = 0.5 MB at B=32, K=64)."""
    boxes = boxes_ref[:].astype(jnp.float32)  # [B, K, 4]
    b, k = boxes.shape[0], boxes.shape[1]
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)  # [B, K]
    xx1 = jnp.maximum(x1[:, :, None], x1[:, None, :])
    yy1 = jnp.maximum(y1[:, :, None], y1[:, None, :])
    xx2 = jnp.minimum(x2[:, :, None], x2[:, None, :])
    yy2 = jnp.minimum(y2[:, :, None], y2[:, None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    iou = inter / (areas[:, :, None] + areas[:, None, :] - inter)  # [B, K, K]
    suppress_pair = iou > iou_thresh
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)  # [B, K]

    valid = valid_ref[:]  # [B, K] int32
    init = valid
    sup_f = suppress_pair.astype(jnp.float32)

    def body(i, keep):
        # Mosaic TC kernels lack dynamic_slice: select row i via a one-hot
        # contraction instead of indexing
        sel = (col_ids == i).astype(jnp.float32)  # [B, K] one-hot at i
        row_active = jnp.sum(keep.astype(jnp.float32) * sel, axis=1) > 0  # [B]
        # broadcast-multiply-sum instead of einsum (relay Mosaic chokes on
        # the dot_general attribute einsum emits here)
        sup_row = jnp.sum(sel[:, :, None] * sup_f, axis=1) > 0  # [B, K]
        later = col_ids > i
        sup = sup_row & later & row_active[:, None]
        return keep * (1 - sup.astype(jnp.int32))

    keep = jax.lax.fori_loop(0, k, body, init)
    keep_ref[:] = keep * valid


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def pallas_nms_mask(
    boxes: jax.Array,  # [B, K, 4], rows sorted by descending score
    valid: jax.Array,  # [B, K] bool
    iou_thresh: float = 0.4,
    interpret: bool = False,
) -> jax.Array:
    b, k, _ = boxes.shape
    kernel = functools.partial(_nms_kernel, iou_thresh=iou_thresh)
    keep = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32))
    return keep.astype(bool)
