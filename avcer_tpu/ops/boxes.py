"""Anchor (prior box) generation and box/landmark decoding for RetinaFace.

Behavior contracts:

- dense anchors at strides 8/16/32, min_sizes [[16,32],[64,128],[256,512]],
  feature maps ceil(size/step)      .../retina_face/prior_box.py:16-33,
                                    .../retina_face/config.py:3-39
- box decode, variance [0.1, 0.2]   .../retina_face/box_utils.py:210-228
- landmark decode                   .../retina_face/box_utils.py:231-249

The reference builds anchors with a Python ``itertools.product`` loop and
caches per image size (retina_face_predictor.py:70-73); here generation is
vectorized numpy, computed once per static detector input shape at trace time.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MIN_SIZES: tuple[tuple[int, int], ...] = ((16, 32), (64, 128), (256, 512))
STEPS: tuple[int, int, int] = (8, 16, 32)
VARIANCES: tuple[float, float] = (0.1, 0.2)


@lru_cache(maxsize=32)
def prior_boxes(image_hw: tuple[int, int]) -> np.ndarray:
    """[A, 4] anchors as normalized (cx, cy, w, h), float32.

    Row order matches the reference exactly: per stride level, row-major over
    (i, j) feature-map cells, then per min_size (prior_box.py:19-29) — the
    same order the network heads emit.
    """
    h, w = image_hw
    out = []
    for (sizes, step) in zip(MIN_SIZES, STEPS):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        jj, ii = np.meshgrid(np.arange(fw), np.arange(fh))  # row-major (i, j)
        cx = (jj + 0.5) * step / w  # [fh, fw]
        cy = (ii + 0.5) * step / h
        for_level = np.empty((fh, fw, len(sizes), 4), dtype=np.float32)
        for s_idx, min_size in enumerate(sizes):
            for_level[..., s_idx, 0] = cx
            for_level[..., s_idx, 1] = cy
            for_level[..., s_idx, 2] = min_size / w
            for_level[..., s_idx, 3] = min_size / h
        out.append(for_level.reshape(-1, 4))
    return np.concatenate(out, axis=0)


def num_anchors(image_hw: tuple[int, int]) -> int:
    h, w = image_hw
    return sum(
        math.ceil(h / s) * math.ceil(w / s) * len(m) for m, s in zip(MIN_SIZES, STEPS)
    )


def decode_boxes(loc: jax.Array, priors: jax.Array) -> jax.Array:
    """Decode [..., A, 4] location regressions to (x1, y1, x2, y2) in
    normalized coordinates (box_utils.py:210-228)."""
    centers = priors[..., :2] + loc[..., :2] * VARIANCES[0] * priors[..., 2:]
    sizes = priors[..., 2:] * jnp.exp(loc[..., 2:] * VARIANCES[1])
    tl = centers - sizes / 2
    br = tl + sizes
    return jnp.concatenate([tl, br], axis=-1)


def decode_landmarks(pre: jax.Array, priors: jax.Array) -> jax.Array:
    """Decode [..., A, 10] landmark regressions to 5 (x, y) points
    (box_utils.py:231-249)."""
    pts = pre.reshape(*pre.shape[:-1], 5, 2)
    out = priors[..., None, :2] + pts * VARIANCES[0] * priors[..., None, 2:]
    return out.reshape(*pre.shape[:-1], 10)


def iou_matrix_legacy(boxes: jax.Array, plus_one: bool = True) -> jax.Array:
    """Pairwise IoU. With ``plus_one`` uses the legacy +1 pixel convention of
    the RetinaFace NMS (py_cpu_nms.py:19-33); without it matches the S3FD
    NMS (s3fd/utils.py:96-128). boxes: [..., K, 4] xyxy."""
    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    areas = (x2 - x1 + off) * (y2 - y1 + off)  # [..., K]
    xx1 = jnp.maximum(x1[..., :, None], x1[..., None, :])
    yy1 = jnp.maximum(y1[..., :, None], y1[..., None, :])
    xx2 = jnp.minimum(x2[..., :, None], x2[..., None, :])
    yy2 = jnp.minimum(y2[..., :, None], y2[..., None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + off)
    h = jnp.maximum(0.0, yy2 - yy1 + off)
    inter = w * h
    return inter / (areas[..., :, None] + areas[..., None, :] - inter)
