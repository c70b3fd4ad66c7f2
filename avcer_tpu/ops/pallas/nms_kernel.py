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
    boxes = boxes_ref[0].astype(jnp.float32)  # [K, 4]
    k = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    iou = inter / (areas[:, None] + areas[None, :] - inter)  # [K, K]
    suppress_pair = iou > iou_thresh  # [K, K]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)  # [1, K]

    valid = valid_ref[:].astype(jnp.int32)  # [1, K]
    init = valid

    def body(i, keep):
        row_active = (keep[0, i] > 0) & (valid_ref[0, i] > 0)
        later = col_ids[0] > i  # [K]
        sup = suppress_pair[i, :] & later & row_active  # [K]
        return keep * (1 - sup.astype(jnp.int32))[None, :]

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
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.ANY),
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32))
    return keep.astype(bool)
