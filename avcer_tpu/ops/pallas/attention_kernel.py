"""Pallas TPU kernel: fused multi-head self-attention (flash-style).

Used by the wav2vec2 encoder path (models/wav2vec2.py) and the custom
TransformerLayer (models/attention.py): unmasked bidirectional attention
over short sequences (~199 tokens for a 4 s window). The XLA fallback
materializes the [B, H, T, T] logits in HBM; this kernel keeps one head's
Q/K/V tile and the softmax accumulators in VMEM — one HBM read per operand,
one write of the output.

Grid: one program per (batch, head). For T<=512, D<=128 a whole head fits
VMEM comfortably (3*T*D*4B + T*T*4B ≈ 1 MB), so no K-blocking is needed;
softmax runs in fp32 on the VPU and both matmuls hit the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # [T, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    d = q.shape[-1]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(d, jnp.float32)
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused unmasked MHA; same contract as models.layers.scaled_dot_attention
    (fp32 softmax, output in q.dtype)."""
    b, h, t, d = q.shape
    grid = (b, h)
    spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
