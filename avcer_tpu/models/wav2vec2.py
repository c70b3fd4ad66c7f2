"""Wav2Vec2 encoder (large-robust family) in Flax, features-last layout.

The reference wraps HuggingFace's torch ``Wav2Vec2Model`` with the pretrained
checkpoint ``audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim``
(/root/reference/src/get_prob_audio_8_cl.py:52-57, audio_8_cl.py:18-22).
That model family is:

- 7-layer conv feature extractor, layer-norm variant (LayerNorm after each
  conv, exact GELU), strides (5,2,2,2,2,2,2), kernels (10,3,3,3,3,2,2),
  512 channels, conv bias on
- feature projection: LayerNorm -> Linear 512->1024
- stable-layer-norm transformer encoder: grouped weight-normed positional
  conv (kernel 128, groups 16), pre-LN layers (16 heads, FFN 4096, exact
  GELU), final LayerNorm at the end — 12 layers in this checkpoint
- no attention mask at inference (the reference never passes one)

This is a from-scratch TPU implementation (bf16 matmuls, fp32 layernorm and
softmax, conv feature extractor as XLA convs); parameter-name layout mirrors
HF so the torch->jax converter is a transpose table. Parity is asserted
against the torch implementation in tests/test_model_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.layers import (
    Dtype, QConv1d, QDense, gelu_exact, scaled_dot_attention,
)


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 1024
    num_layers: int = 12
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple[int, ...] = (512,) * 7
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    #: route attention through the fused Pallas MHA kernel
    #: (ops/pallas/attention_kernel.py) instead of the XLA einsum path
    use_pallas_attention: bool = False
    #: rematerialize encoder layers on the backward pass (jax.checkpoint):
    #: trades ~1/3 extra forward FLOPs for O(layers) less activation memory —
    #: required for training batches >= 24 on a single chip (train-time only;
    #: no effect on inference)
    remat: bool = False
    #: int8 serving: the 6 Dense projections per encoder layer (q/k/v/out +
    #: FFN, layers.QDense — 1.61x on the FFN matmul) and the feature
    #: extractor's 512-channel conv layers 2-7 (layers.QConv1d) run
    #: quantized on the MXU; LayerNorms, attention softmax, the 1-channel
    #: first conv, and heads stay exact. Calibrate act_scales via
    #: AudioStage (inference-only).
    quant: bool = False

    def num_output_frames(self, num_samples: int) -> int:
        n = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


class FeatureEncoder(nn.Module):
    """Conv feature extractor, layer-norm variant. In: [B, T] -> [B, F, 512]."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x[..., None].astype(self.dtype)  # [B, T, 1]
        for i, (dim, k, s) in enumerate(
            zip(self.config.conv_dim, self.config.conv_kernel, self.config.conv_stride)
        ):
            if self.config.quant and i > 0:
                # layers past the first (in_ch = conv_dim, MXU-bound) run
                # int8; the 1-channel first layer stays exact
                h = QConv1d(
                    dim, kernel_size=k, strides=s,
                    use_bias=self.config.conv_bias, dtype=self.dtype,
                    name=f"conv_layers_{i}_conv",
                )(h)
            else:
                h = nn.Conv(
                    dim, kernel_size=(k,), strides=(s,), padding="VALID",
                    use_bias=self.config.conv_bias, dtype=self.dtype,
                    name=f"conv_layers_{i}_conv",
                )(h)
            h = nn.LayerNorm(
                epsilon=self.config.layer_norm_eps, dtype=jnp.float32,
                name=f"conv_layers_{i}_layer_norm",
            )(h).astype(self.dtype)
            h = gelu_exact(h)
        return h


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.LayerNorm(
            epsilon=self.config.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
        )(x).astype(self.dtype)
        x = nn.Dense(self.config.hidden_size, dtype=self.dtype, name="projection")(x)
        return nn.Dropout(0.1)(x, deterministic=deterministic)


class _GroupedConvSplit(nn.Module):
    """Grouped 1-D conv computed as per-group feature_group_count=1 convs.

    Parameter tree (kernel [K, C//G, C], bias [C]) and math are identical to
    ``nn.Conv(C, (K,), feature_group_count=G)`` — input channel block g maps
    to output channel block g through kernel output-column block g. The
    split exists because GSPMD miscompiles the grouped-conv WEIGHT gradient
    when the surrounding jit program contains a shard_map over a mesh with
    an axis the batch is not sharded over (the pipeline-parallel path,
    parallel/pipeline.py): the backward-weights conv picks up a spurious
    reduction over the replicated "pipe" axis and d(loss)/d(kernel) comes
    out exactly n_stages x too large (isolated by
    tests/test_pipeline_pp.py::test_grad_equivalence — forward and
    d(loss)/d(input) are unaffected). Regular convs take the well-tested
    VJP path; FLOPs are identical.
    """

    features: int
    kernel_size: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, g = self.kernel_size, self.groups
        in_g = x.shape[-1] // g
        out_g = self.features // g
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, in_g, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        pad = [(k // 2, k // 2)]
        outs = [
            jax.lax.conv_general_dilated(
                xd[..., i * in_g:(i + 1) * in_g],
                kd[:, :, i * out_g:(i + 1) * out_g],
                window_strides=(1,), padding=pad,
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            for i in range(g)
        ]
        return jnp.concatenate(outs, axis=-1) + bias.astype(self.dtype)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding; weight norm is fused into the conv
    weight at conversion time. Even kernel -> trim the trailing frame."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.config.num_conv_pos_embeddings
        h = _GroupedConvSplit(
            self.config.hidden_size, kernel_size=k,
            groups=self.config.num_conv_pos_embedding_groups,
            dtype=self.dtype, name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1, :]
        return gelu_exact(h)


class EncoderLayerStableLN(nn.Module):
    """Pre-LN transformer layer (HF Wav2Vec2EncoderLayerStableLayerNorm)."""

    config: Wav2Vec2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        dense_cls = QDense if c.quant else nn.Dense
        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm")(
            x
        ).astype(self.dtype)
        b, t = h.shape[0], h.shape[1]

        def proj(name: str, inp: jax.Array) -> jax.Array:
            y = dense_cls(c.hidden_size, dtype=self.dtype, name=name)(inp)
            return y.reshape(b, t, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        # HF scales q by head_dim**-0.5 before the matmul; mathematically the
        # same as dividing the logits — we use the shared fp32-softmax op.
        q = proj("attention_q_proj", h)
        k = proj("attention_k_proj", h)
        v = proj("attention_v_proj", h)
        if c.use_pallas_attention:
            from avcer_tpu.ops.pallas.attention_kernel import pallas_mha

            attn = pallas_mha(q, k, v)
        else:
            attn = scaled_dot_attention(q, k, v, dtype=self.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        attn = dense_cls(c.hidden_size, dtype=self.dtype, name="attention_out_proj")(attn)
        attn = nn.Dropout(0.1)(attn, deterministic=deterministic)
        x = residual + attn

        residual = x
        h = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(x).astype(self.dtype)
        h = dense_cls(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(h)
        h = gelu_exact(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = dense_cls(c.hidden_size, dtype=self.dtype, name="output_dense")(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        return residual + h


class Wav2Vec2Encoder(nn.Module):
    """Full model: raw waveform [B, T] -> hidden states [B, F, 1024].

    ``mode`` (static) supports the shared-extractor serving path
    (pipeline/audio_stage.py AudioConfig.shared_extractor):
    - "full": wav [B, T] -> hidden states (the exact per-window path);
    - "features_only": wav -> conv features [B, F, conv_dim] (run once per
      clip over the whole normalized waveform);
    - "from_features": the input IS a conv-feature batch [B, F, conv_dim];
      skip the extractor and run projection + transformer.
    - "pre_layers" / "post_layers": split the forward around the encoder
      layer stack for pipeline parallelism (parallel/pipeline.py):
      "pre_layers" is wav -> hidden right before layers_0; "post_layers"
      takes post-layer hidden states and applies only the final LayerNorm.
    Parameter tree is identical in all modes (init uses "full").
    """

    config: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, wav: jax.Array, deterministic: bool = True, mode: str = "full"
    ) -> jax.Array:
        c = self.config
        if mode == "post_layers":
            h = wav  # hidden states straight out of the (pipelined) layers
        else:
            if mode == "from_features":
                feats = wav
            else:
                feats = FeatureEncoder(c, dtype=self.dtype, name="feature_extractor")(wav)
                if mode == "features_only":
                    return feats
            h = FeatureProjection(c, dtype=self.dtype, name="feature_projection")(
                feats, deterministic
            )
            pos = PositionalConvEmbedding(c, dtype=self.dtype, name="pos_conv_embed")(h)
            h = h + pos
            h = nn.Dropout(0.1)(h, deterministic=deterministic)
            if mode == "pre_layers":
                return h
            layer_cls = EncoderLayerStableLN
            if c.remat:
                # deterministic (arg 2) is a static python bool
                layer_cls = nn.remat(EncoderLayerStableLN, static_argnums=(2,))
            for i in range(c.num_layers):
                h = layer_cls(c, dtype=self.dtype, name=f"layers_{i}")(
                    h, deterministic
                )
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32, name="layer_norm")(h)
        return h.astype(self.dtype)
