"""Custom post-LN transformer layer used by the audio emotion heads.

Behavior contract — /root/reference/src/architectures/attention_layers.py:

- sinusoidal positional encoding added to Q, K and V separately before
  attention (:249-255), max_len 5000 (:196)
- from-scratch MHA: bias-free q/k/v/out projections, per-head scaled dot
  (:80-144), scale = sqrt(head_dim) (:21-24)
- post-LN residual blocks (Add then LayerNorm, :60-77)
- position-wise FFN with hidden == input_dim and ReLU (:41-57)

Dropout positions match the reference (eval-mode no-ops unless
``deterministic=False``). Attention runs with fp32 softmax; projections hit
the MXU in the configured compute dtype.
"""

from __future__ import annotations

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.layers import Dtype, scaled_dot_attention


def sinusoidal_positional_encoding(d_model: int, max_len: int = 5000) -> np.ndarray:
    """pe[pos, 2i] = sin(pos * exp(-2i ln(1e4)/d)), pe[pos, 2i+1] = cos(...)
    (attention_layers.py:200-206)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class MultiHeadAttention(nn.Module):
    input_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, queries: jax.Array, keys: jax.Array, values: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.input_dim % self.num_heads:
            raise ValueError("input_dim must be divisible by num_heads")
        head_dim = self.input_dim // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            self.input_dim, use_bias=False, dtype=self.dtype, name=name
        )
        b, tq = queries.shape[0], queries.shape[1]
        tk = keys.shape[1]

        def split(x: jax.Array, t: int) -> jax.Array:
            return x.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(dense("query_w")(queries), tq)
        k = split(dense("keys_w")(keys), tk)
        v = split(dense("values_w")(values), tk)
        out = scaled_dot_attention(q, k, v, dtype=self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, tk, self.input_dim)
        return dense("ff_layer_after_concat")(out)


class AddAndNorm(nn.Module):
    """dropout(x) + residual -> LayerNorm (attention_layers.py:60-77)."""

    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, residual: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm")(
            x + residual
        ).astype(self.dtype)


class PositionWiseFeedForward(nn.Module):
    """Linear -> dropout -> ReLU -> Linear, hidden == input
    (attention_layers.py:41-57)."""

    input_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.input_dim, dtype=self.dtype, name="layer_1")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.relu(x)
        return nn.Dense(self.input_dim, dtype=self.dtype, name="layer_2")(x)


class TransformerLayer(nn.Module):
    """Reference TransformerLayer (attention_layers.py:221-267): PE on each of
    Q/K/V, MHA, post-LN residual, FFN, post-LN residual."""

    input_dim: int
    num_heads: int
    dropout: float = 0.1
    positional_encoding: bool = True
    max_len: int = 5000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        # The head models call tl(query=x, key=x, value=x) with a single
        # stream (audio_8_cl.py:120-121), so PE-and-dropout is applied once
        # and shared — identical math to the reference's three applications
        # in eval mode; in train mode the reference draws three independent
        # dropout masks on identical tensors, which we reproduce.
        if self.positional_encoding:
            pe = jnp.asarray(sinusoidal_positional_encoding(self.input_dim, self.max_len))
            pe_x = (x + pe[None, : x.shape[1], :]).astype(self.dtype)
            drop = nn.Dropout(self.dropout)
            if deterministic:
                q = k = v = pe_x
            else:
                q = drop(pe_x, deterministic=False)
                k = drop(pe_x, deterministic=False)
                v = drop(pe_x, deterministic=False)
        else:
            q = k = v = x.astype(self.dtype)

        attn = MultiHeadAttention(
            self.input_dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attention",
        )(q, k, v, deterministic=deterministic)
        x = AddAndNorm(self.dropout, dtype=self.dtype, name="add_norm_after_attention")(
            attn, q, deterministic=deterministic
        )
        ff = PositionWiseFeedForward(
            self.input_dim, self.dropout, dtype=self.dtype, name="feed_forward"
        )(x, deterministic=deterministic)
        return AddAndNorm(self.dropout, dtype=self.dtype, name="add_norm_after_ff")(
            ff, x, deterministic=deterministic
        )
