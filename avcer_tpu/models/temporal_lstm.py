"""Dynamic temporal model: 2-layer LSTM over 10-frame feature windows.

Behavior contract — /root/reference/src/architectures/video.py:169-185:
LSTM(512->512) -> LSTM(512->256) -> Linear(256->7) on the LAST timestep.
Torch LSTM semantics: gate order (i, f, g, o), zero initial state, biases
b_ih and b_hh both present.

TPU design: a ``lax.scan`` over the (short, static) 10-step window, batched
over all windows of the clip at once — the reference runs one window per
device round-trip every step-th frame (get_prob_video.py:122-129).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.layers import Dtype


class LSTMCellTorch(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, carry: tuple[jax.Array, jax.Array], x: jax.Array
    ) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
        h, c = carry
        gi = nn.Dense(4 * self.hidden, dtype=self.dtype, name="ih")(x)
        gh = nn.Dense(4 * self.hidden, dtype=self.dtype, name="hh")(h)
        g = gi + gh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class LSTMTorch(nn.Module):
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, D] -> [B, T, H]
        b = x.shape[0]
        cell = LSTMCellTorch(self.hidden, dtype=self.dtype, name="cell")
        scan = nn.scan(
            lambda c, carry, xt: c(carry, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        h0 = (jnp.zeros((b, self.hidden), self.dtype),) * 2
        _, ys = scan(cell, h0, x)
        return ys


class TemporalLSTM(nn.Module):
    """[B, 10, 512] feature windows -> [B, num_classes] raw logits
    (the reference keeps dynamic outputs as raw logits; fusion softmaxes
    them later, run.py:86-88)."""

    num_classes: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        x = LSTMTorch(512, dtype=self.dtype, name="lstm1")(x)
        x = LSTMTorch(256, dtype=self.dtype, name="lstm2")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x[:, -1, :])
