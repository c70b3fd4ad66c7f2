"""Pallas TPU kernel: fused 2-layer LSTM over fixed 10-step windows.

The dynamic visual model (models/temporal_lstm.py) is a 2-layer LSTM over
[B, 10, 512] windows. As a lax.scan it issues 4 small matmuls per step with
HBM round trips for the carries; this kernel keeps both layers' weights and
the (h, c) carries resident in VMEM for the whole window and emits only the
final logits — one HBM read of the inputs, one write of the output.

Weights layout: packed (in+hidden, 4*hidden) matrices per layer (i, f, g, o
gate order), biases folded together (b_ih + b_hh).

Status: validated in interpret mode; the fp32 weight set (~11 MB) currently
trips the Mosaic TC compiler on v5e (VMEM pressure with double buffering) —
the production pipeline uses the lax.scan path unless
VisualConfig.use_pallas_lstm is set. Revisit with bf16 weights + HBM
residency + async copies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_step(x, h, c, w, b, hidden):
    """One torch-semantics LSTM step; inputs [B, D], packed w [D+H, 4H]."""
    xh = jnp.concatenate([x, h], axis=-1)
    gates = jnp.dot(xh, w, preferred_element_type=jnp.float32) + b
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # [B, T, D]
    b, t, d = x.shape
    h1 = 512
    h2 = 256
    w1 = w1_ref[:].astype(jnp.float32)
    b1 = b1_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    b2 = b2_ref[:].astype(jnp.float32)

    zeros1 = jnp.zeros((b, h1), jnp.float32)
    zeros2 = jnp.zeros((b, h2), jnp.float32)
    h1s, c1s, h2s, c2s = zeros1, zeros1, zeros2, zeros2
    # T is static (10) — unroll with static indices (Mosaic has no
    # dynamic_slice for TC kernels)
    for step in range(t):
        xt = x[:, step, :]
        h1s, c1s = _lstm_step(xt, h1s, c1s, w1, b1, h1)
        h2s, c2s = _lstm_step(h1s, h2s, c2s, w2, b2, h2)
    logits = jnp.dot(h2s, wf_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + bf_ref[:]
    out_ref[:] = logits


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_lstm_forward(
    x: jax.Array,  # [B, 10, 512]
    w1: jax.Array,  # [512+512, 2048]
    b1: jax.Array,  # [2048]
    w2: jax.Array,  # [512+256, 1024]
    b2: jax.Array,  # [1024]
    wf: jax.Array,  # [256, C]
    bf: jax.Array,  # [C]
    interpret: bool = False,
) -> jax.Array:
    b = x.shape[0]
    c = wf.shape[1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, b1, w2, b2, wf, bf)


def pack_lstm_params(variables: dict) -> tuple[jax.Array, ...]:
    """TemporalLSTM variables -> packed kernel weights."""
    p = variables["params"]

    def pack(layer):
        ih = p[layer]["cell"]["ih"]
        hh = p[layer]["cell"]["hh"]
        w = jnp.concatenate([ih["kernel"], hh["kernel"]], axis=0)
        return w, ih["bias"] + hh["bias"]

    w1, b1 = pack("lstm1")
    w2, b2 = pack("lstm2")
    return w1, b1, w2, b2, p["fc"]["kernel"], p["fc"]["bias"]
