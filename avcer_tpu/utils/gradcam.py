"""Grad-CAM heatmaps for the static emotion CNN.

Behavior contract — /root/reference/src/data/utils.py:92-112 +
get_prob_video.py:131-152: gradient of the softmax probability of the chosen
class w.r.t. the layer4 activation, channel-wise pooled gradients weight the
activation, channel mean -> ReLU -> max-normalize -> resize to 224 ->
colormap overlay (utils/viz.show_cam_on_image).

TPU design: the reference needs forward+backward hooks and a full backward
pass through the network. Because everything downstream of layer4 is exactly
avgpool -> fc1 -> ReLU -> fc2 -> softmax, the gradient w.r.t. act4 is
computed with ``jax.grad`` of that tiny closed-form head — no second pass
through the backbone, and it batches over frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _head_prob(act4: jax.Array, params: dict, class_idx: jax.Array) -> jax.Array:
    """softmax(fc2(relu(fc1(mean(act4)))))[:, class_idx] summed over batch."""
    pooled = jnp.mean(act4, axis=(1, 2))
    f1 = pooled @ params["fc1"]["kernel"] + params["fc1"]["bias"]
    logits = jax.nn.relu(f1) @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.take_along_axis(probs, class_idx[:, None], axis=1).sum()


@functools.partial(jax.jit, static_argnames=())
def gradcam_masks(act4: jax.Array, params: dict, class_idx: jax.Array) -> jax.Array:
    """[B, h, w, C] layer4 activations -> [B, h, w] normalized CAM masks."""
    act4 = act4.astype(jnp.float32)
    grads = jax.grad(_head_prob)(act4, params, class_idx)  # [B, h, w, C]
    # reference pools gradient over (batch, h, w) of a single-image batch;
    # batched here: pool per image over (h, w)
    pooled = grads.mean(axis=(1, 2))  # [B, C]
    weighted = act4 * pooled[:, None, None, :]
    heat = weighted.mean(axis=-1)  # [B, h, w]
    heat = jnp.maximum(heat, 0.0)
    maxv = jnp.max(heat, axis=(1, 2), keepdims=True)
    return heat / jnp.maximum(maxv, 1e-12)


def render_heatmap(
    mask: np.ndarray,  # [h, w] normalized CAM
    face_bgr: np.ndarray,  # [H, W, 3] uint8 crop
    use_rgb: bool = False,
    image_weight: float = 0.6,
) -> np.ndarray:
    """Resize mask + crop to 224 and overlay (data/utils.py:100-112)."""
    import cv2

    from avcer_tpu.utils.viz import show_cam_on_image

    heat = cv2.resize(np.asarray(mask, np.float32), (224, 224))
    face = cv2.resize(face_bgr, (224, 224)).astype(np.float32) / 255.0
    return show_cam_on_image(face, heat, use_rgb=use_rgb, image_weight=image_weight)
