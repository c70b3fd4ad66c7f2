"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from avcer_tpu.ops import nms as nms_ops
from avcer_tpu.ops.pallas.nms_kernel import pallas_nms_mask


def test_pallas_nms_matches_xla(rng):
    b, k = 3, 64
    cx = rng.uniform(0, 200, (b, k)).astype(np.float32)
    cy = rng.uniform(0, 200, (b, k)).astype(np.float32)
    w = rng.uniform(5, 80, (b, k)).astype(np.float32)
    h = rng.uniform(5, 80, (b, k)).astype(np.float32)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    scores = -np.sort(-rng.random((b, k)).astype(np.float32), axis=1)
    valid = scores > 0.3
    want = np.asarray(nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.4))
    got = np.asarray(
        pallas_nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.4, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_mha_matches_xla(rng):
    from avcer_tpu.models.layers import scaled_dot_attention
    from avcer_tpu.ops.pallas.attention_kernel import pallas_mha

    b, h, t, d = 2, 4, 33, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    want = np.asarray(scaled_dot_attention(q, k, v))
    got = np.asarray(pallas_mha(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
