"""S3FD face detector (the reference's alternative detector).

Behavior contract — /root/reference/src/data/face_detection/ibug/
face_detection/s3fd/{s3fd_net.py, s3fd_predictor.py, utils.py}:

- VGG16 trunk with dilated conv fc6/fc7, ceil-mode pool3, L2Norm on
  conv3_3/4_3/5_3 with scales 10/8/5 (s3fd_net.py:36-81)
- extras conv6/7 (stride-2) for the last two scales (:83-88)
- 6 single-anchor multibox heads; the first confidence head applies the
  max-out background trick: max of channels 0..2 vs channel 3 (:146-151)
- priors: one anchor per cell, steps (4,8,16,32,64,128), sizes
  (16,...,512), feature-map sizes taken from the head outputs
  (utils.py:174-206)
- predictor preprocessing: RGB minus (123, 117, 104)
  (s3fd_predictor.py:48-52); conf_thresh 0.05, NMS IoU 0.3 WITHOUT the +1
  convention, threshold 0.8 (s3fd_predictor.py:39-42, utils.py:96-128)

Exported for parity with ``ibug.face_detection``'s public surface
(__init__.py:1-2); the AVCER pipeline itself uses RetinaFace.
"""

from __future__ import annotations

import math
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.models.layers import Dtype

S3FD_STEPS = (4, 8, 16, 32, 64, 128)
S3FD_SIZES = (16, 32, 64, 128, 256, 512)
VARIANCES = (0.1, 0.2)


class L2Norm(nn.Module):
    scale: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.constant(self.scale), (c,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)) + 1e-10
        return (w * (x / norm)).astype(self.dtype)


class S3FDNet(nn.Module):
    """Input: [B, H, W, 3] float32 RGB minus (123, 117, 104).
    Returns (loc [B, A, 4], conf [B, A, 2] softmaxed) with anchor rows in
    level -> row-major cell order (one anchor per cell)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        def conv(h, ch, k=3, s=1, pad=1, dil=1, name=""):
            return nn.Conv(
                ch, (k, k), strides=(s, s), padding=pad, kernel_dilation=(dil, dil),
                dtype=self.dtype, name=name,
            )(h)

        h = x.astype(self.dtype)
        sources = []
        # vgg indices follow the reference ModuleList for converter mapping
        h = nn.relu(conv(h, 64, name="vgg_0"))
        h = nn.relu(conv(h, 64, name="vgg_2"))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(h, 128, name="vgg_5"))
        h = nn.relu(conv(h, 128, name="vgg_7"))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(h, 256, name="vgg_10"))
        h = nn.relu(conv(h, 256, name="vgg_12"))
        h = nn.relu(conv(h, 256, name="vgg_14"))
        sources.append(L2Norm(10.0, dtype=self.dtype, name="L2Norm3_3")(h))
        # ceil-mode 2x2 pool == pad odd dims then valid pool
        ph, pw = h.shape[1] % 2, h.shape[2] % 2
        h = nn.max_pool(h, (2, 2), strides=(2, 2), padding=((0, ph), (0, pw)))
        h = nn.relu(conv(h, 512, name="vgg_17"))
        h = nn.relu(conv(h, 512, name="vgg_19"))
        h = nn.relu(conv(h, 512, name="vgg_21"))
        sources.append(L2Norm(8.0, dtype=self.dtype, name="L2Norm4_3")(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(h, 512, name="vgg_24"))
        h = nn.relu(conv(h, 512, name="vgg_26"))
        h = nn.relu(conv(h, 512, name="vgg_28"))
        sources.append(L2Norm(5.0, dtype=self.dtype, name="L2Norm5_3")(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(h, 1024, pad=6, dil=6, name="vgg_31"))
        h = nn.relu(conv(h, 1024, k=1, pad=0, name="vgg_33"))
        sources.append(h)
        h = nn.relu(conv(h, 256, k=1, pad=0, name="extras_0"))
        h = nn.relu(conv(h, 512, s=2, name="extras_1"))
        sources.append(h)
        h = nn.relu(conv(h, 128, k=1, pad=0, name="extras_2"))
        h = nn.relu(conv(h, 256, s=2, name="extras_3"))
        sources.append(h)

        locs, confs = [], []
        for i, src in enumerate(sources):
            loc = conv(src, 4, name=f"loc_{i}")
            width = 4 if i == 0 else 2
            cf = conv(src, width, name=f"conf_{i}")
            if i == 0:  # max-out background (s3fd_net.py:146-151)
                max_bg = jnp.max(cf[..., 0:3], axis=-1, keepdims=True)
                cf = jnp.concatenate([max_bg, cf[..., 3:]], axis=-1)
            locs.append(loc.reshape(loc.shape[0], -1, 4))
            confs.append(cf.reshape(cf.shape[0], -1, 2))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1).astype(jnp.float32), -1)
        return loc, conf


@lru_cache(maxsize=16)
def s3fd_priors(image_hw: tuple[int, int]) -> np.ndarray:
    """[A, 4] normalized (cx, cy, w, h); feature maps replicate the conv
    arithmetic of the trunk (pool3 is ceil-mode)."""
    h, w = image_hw
    # feature map sizes per level: /4 (after pool2 convs), /8 (ceil pool3),
    # /16, /32, /64 (stride-2 extras), /128
    def down(a: int, times: int, ceil_at: int = -1) -> int:
        for t in range(times):
            a = math.ceil(a / 2) if t == ceil_at else a // 2
        return a

    fmaps = []
    fh, fw = h, w
    sizes = []
    fh2, fw2 = fh // 2 // 2, fw // 2 // 2
    sizes.append((fh2, fw2))  # stride 4 (conv3_3: after two pools)
    fh3, fw3 = math.ceil(fh2 / 2), math.ceil(fw2 / 2)
    sizes.append((fh3, fw3))  # stride 8 (ceil pool3)
    fh4, fw4 = fh3 // 2, fw3 // 2
    sizes.append((fh4, fw4))  # stride 16
    fh5, fw5 = fh4 // 2, fw4 // 2
    sizes.append((fh5, fw5))  # stride 32 (fc7)
    fh6, fw6 = (fh5 + 1) // 2, (fw5 + 1) // 2
    sizes.append((fh6, fw6))  # stride 64 (extras_1, pad 1 stride 2)
    fh7, fw7 = (fh6 + 1) // 2, (fw6 + 1) // 2
    sizes.append((fh7, fw7))  # stride 128
    out = []
    for k, (feath, featw) in enumerate(sizes):
        jj, ii = np.meshgrid(np.arange(featw), np.arange(feath))
        cx = (jj + 0.5) * S3FD_STEPS[k] / w
        cy = (ii + 0.5) * S3FD_STEPS[k] / h
        level = np.stack(
            [cx, cy, np.full_like(cx, S3FD_SIZES[k] / w),
             np.full_like(cy, S3FD_SIZES[k] / h)], axis=-1
        ).reshape(-1, 4)
        out.append(level.astype(np.float32))
    return np.concatenate(out, axis=0)
