"""Audio emotion heads ExprModelV1/V2/V3 (7- and 8-class).

Behavior contracts — /root/reference/src/architectures/audio_8_cl.py (the
7-class file is byte-identical except the final Linear width,
audio_7_cl.py:47,102,159):

- V1: wav2vec2 -> 2-layer GRU(1024->256) -> time-downsample -> Linear(256, C)
  (:18-72).  NOTE the reference defines ``tanh`` but never applies it.
- V2: wav2vec2 -> TransformerLayer(32 heads) -> TransformerLayer(16 heads)
  -> time-downsample -> Linear(1024, C) (:75-128)
- V3: same as V2; differs only in which wav2vec2 layers train (:131-190)
- time-downsample: Conv1d(k=5, s=3, d=2) -> BN -> MaxPool1d(5) -> ReLU ->
  Conv1d(k=3) -> BN -> AdaptiveAvgPool1d(1) -> ReLU (:146-157)
- ``get_features`` variant returns (logits, pooled 1024-d features)
  (/root/reference/src/audio/models/audio_expr_models.py:63-74)

TPU design: the whole head is one jitted program over a [W, samples] window
batch; the GRU is a ``lax.scan``; convs run features-last.
"""

from __future__ import annotations

from dataclasses import field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.attention import TransformerLayer
from avcer_tpu.models.layers import (
    Dtype,
    TorchBatchNorm,
    adaptive_avg_pool_to_1,
    max_pool_1d,
)
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


class GRUCellTorch(nn.Module):
    """One torch-gate-order GRU step: gates (r, z, n),
    h' = (1 - z) * n + z * h."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        gi = nn.Dense(3 * self.hidden, dtype=self.dtype, name="ih")(x)
        gh = nn.Dense(3 * self.hidden, dtype=self.dtype, name="hh")(h)
        ir, iz, inn = jnp.split(gi, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


class GRUTorch(nn.Module):
    """Multi-layer unidirectional GRU over [B, T, D] via lax.scan."""

    hidden: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        for layer in range(self.num_layers):
            cell = GRUCellTorch(self.hidden, dtype=self.dtype, name=f"cell_{layer}")
            scan = nn.scan(
                lambda c, h, xt: c(h, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            h0 = jnp.zeros((b, self.hidden), self.dtype)
            _, x = scan(cell, h0, x)
        return x


class TimeDownsample(nn.Module):
    """Conv/BN/pool time-compression stack (audio_8_cl.py:146-157).
    In/out: [B, T, F] -> [B, F]."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[1] < 51:
            # VALID conv(k5,d2,s3) -> pool(5) -> VALID conv(k3) underflows to
            # an EMPTY time axis below 51 frames; XLA returns 0-length (not
            # an error like torch), and the mean-pool then yields silent NaN
            raise ValueError(
                f"TimeDownsample needs >= 51 input frames, got {x.shape[1]} "
                "(a 4 s / 16 kHz window gives 199)"
            )
        x = nn.Conv(
            self.features, kernel_size=(5,), strides=(3,), kernel_dilation=(2,),
            padding="VALID", dtype=self.dtype, name="conv1",
        )(x)
        x = TorchBatchNorm(name="bn1", dtype=self.dtype)(x, use_running_average=not train)
        x = max_pool_1d(x, 5)
        x = nn.relu(x)
        x = nn.Conv(
            self.features, kernel_size=(3,), padding="VALID", dtype=self.dtype,
            name="conv2",
        )(x)
        x = TorchBatchNorm(name="bn2", dtype=self.dtype)(x, use_running_average=not train)
        x = adaptive_avg_pool_to_1(x)  # [B, F]
        return nn.relu(x)


class ExprModel(nn.Module):
    """Unified V1/V2/V3 audio emotion model: waveform -> logits.

    ``variant`` selects the temporal block; V2 and V3 share architecture
    (audio_8_cl.py:75-128 vs :131-190 — they differ only in fine-tuning
    depth, which lives in the training config, not the graph).
    """

    variant: str = "v3"  # v1 | v2 | v3
    num_classes: int = 8
    wav2vec2_config: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,  # [B, samples], already feature-extractor normalized
        deterministic: bool = True,
        return_features: bool = False,
        w2v_mode: str = "full",  # see Wav2Vec2Encoder.__call__ modes
    ) -> jax.Array | tuple[jax.Array, jax.Array]:
        if w2v_mode == "hidden":
            # the input IS final wav2vec2 hidden states [B, F, hidden] —
            # produced externally, e.g. by the pipeline-parallel encoder
            # (parallel/pipeline.py); run only the head
            h = wav
        else:
            h = Wav2Vec2Encoder(self.wav2vec2_config, dtype=self.dtype,
                                name="wav2vec2")(
                wav, deterministic=deterministic, mode=w2v_mode
            )
        if w2v_mode == "features_only":
            return h
        hidden = self.wav2vec2_config.hidden_size  # 1024 for the reference models
        if self.variant == "v1":
            h = GRUTorch(256, num_layers=2, dtype=self.dtype, name="gru")(h)
            f_size = 256
        elif self.variant in ("v2", "v3"):
            h = TransformerLayer(hidden, 32, dtype=self.dtype, name="tl1")(
                h, deterministic=deterministic
            )
            h = TransformerLayer(hidden, 16, dtype=self.dtype, name="tl2")(
                h, deterministic=deterministic
            )
            f_size = hidden
        else:
            raise ValueError(f"unknown variant {self.variant!r}")
        pooled = TimeDownsample(f_size, dtype=self.dtype, name="time_downsample")(
            h, train=not deterministic
        )
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="feature_downsample")(
            pooled
        )
        if return_features:
            return logits, pooled
        return logits


def make_audio_model(
    variant: str = "v3",
    num_classes: int = 8,
    dtype: Dtype = jnp.bfloat16,
    wav2vec2_config: Optional[Wav2Vec2Config] = None,
) -> ExprModel:
    return ExprModel(
        variant=variant,
        num_classes=num_classes,
        wav2vec2_config=wav2vec2_config or Wav2Vec2Config(),
        dtype=dtype,
    )
