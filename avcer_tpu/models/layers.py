"""Shared building blocks with PyTorch-matching inference semantics.

These exist so converted reference checkpoints reproduce activations exactly:

- ``TorchBatchNorm``: inference BatchNorm y = (x-mean)/sqrt(var+eps)*g+b with
  configurable eps (the emotion ResNet uses TF-style eps=1e-3,
  /root/reference/src/architectures/video.py:21; torch default is 1e-5).
- ``max_pool_1d`` / ``adaptive_avg_pool``: torch floor-mode pooling.
- ``gelu_exact``: torch nn.GELU default (erf form), used by wav2vec2.

Layout convention: features-last everywhere (NHWC / NLC) — the TPU-native
layout. Converters transpose torch's NCHW/NCL weights once at load time.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch state names, usable for train (batch stats) and
    eval (running stats). Parameters: scale, bias; variables: mean, var."""

    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if use_running_average:
            # inference: fold stats+affine into one scale/shift in the compute
            # dtype so XLA fuses it with the surrounding convs (keeping this
            # in fp32 forces bf16<->fp32 casts on the full activation tensor)
            inv = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            shift = bias - ra_mean.value * inv
            return (
                x.astype(self.dtype) * inv.astype(self.dtype)
                + shift.astype(self.dtype)
            )
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.var(xf, axis=reduce_axes)
            if not self.is_initializing():
                n = 1
                for a in reduce_axes:
                    n *= x.shape[a]
                unbiased = var * n / max(n - 1, 1)  # torch tracks unbiased var
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


def _ste(int8_fn, exact_fn, x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Straight-through estimator: forward = the served int8 program,
    backward = the exact op's gradient.

    Without this, round/int8-cast carry zero gradient, so constructing a
    ``quant=True`` model inside the Trainer would silently train nothing
    (every quantized layer's upstream gradient would be zero). With STE the
    misuse instead degrades gracefully into standard quantization-aware
    training semantics; inference cost is unchanged (the vjp is only built
    when something differentiates through the call)."""

    @jax.custom_vjp
    def f(xx, kk):
        return int8_fn(xx, kk)

    def fwd(xx, kk):
        return int8_fn(xx, kk), (xx, kk)

    def bwd(res, g):
        _, vjp = jax.vjp(exact_fn, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(x, kernel)


def _int8_f32_accum() -> bool:
    """CPU drift-study emulation knob (AVCER_INT8_CPU_F32_ACCUM=1, cpu
    backend only): contract the ALREADY-QUANTIZED int8 values in f32
    instead of int8->int32. XLA:CPU has no fast int8 conv/dot path (scalar
    emulation, ~50x slower — it stalled the round-3 profile-drift study);
    the quantize/round/clip stay byte-identical, and f32 accumulation of
    exact int8 products deviates only once partial sums pass 2^24
    (<=1e-7 relative — three orders below the int8 drift being measured).
    Never active on TPU: the real serving path always accumulates int32."""
    import os

    import jax as _jax

    return (os.environ.get("AVCER_INT8_CPU_F32_ACCUM") == "1"
            and _jax.default_backend() == "cpu")


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    strides: tuple[int, int],
    padding,
    feature_group_count: int = 1,
    out_dtype: Dtype = jnp.bfloat16,
    act_amax: jax.Array | None = None,
) -> jax.Array:
    """Dynamically-quantized int8 convolution for the v5e MXU (runs int8 at
    2x the bf16 rate; measured 1.85x on the detector's dominant conv shape —
    experiments/exp_r4b_results.jsonl loop_conv3x3_256_45x80).

    Symmetric quantization: per-tensor activation scale (one max-abs
    reduction per call — dynamic, no calibration pass needed), per-output-
    channel weight scale (folded into the dequant multiply, so weight
    outliers in one channel don't cost precision in the others). Weights are
    quantized inside the program from the same fp32/bf16 checkpoint tree the
    exact path uses — elementwise over weight bytes, negligible next to the
    conv — which keeps converted reference checkpoints format-identical.

    kernel: HWIO. Returns out_dtype activations (accumulation in int32).

    act_amax: optional CALIBRATED per-tensor max-abs of x. Without it the
    scale is computed dynamically — a full-tensor reduction that serializes
    against the conv and, measured end-to-end, costs more than int8 saves
    (exp_r4c: dynamic int8 r50@640 0.657 vs bf16 0.613 ms/frame). With a
    static amax the quantize is a pure elementwise op XLA fuses into the
    producer (writing int8 halves the activation bytes) and the dequant
    multiply folds into the following BatchNorm's static scale.
    """
    def impl(xx, kk):
        if act_amax is None:
            sx = jnp.max(jnp.abs(xx)).astype(jnp.float32) / 127.0
        else:
            sx = act_amax.astype(jnp.float32) / 127.0
        sx = jnp.maximum(sx, 1e-10)
        xq = jnp.clip(
            jnp.round(xx.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
        sw = jnp.max(jnp.abs(kk.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
        sw = jnp.maximum(sw, 1e-10)
        wq = jnp.clip(
            jnp.round(kk.astype(jnp.float32) / sw), -127, 127
        ).astype(jnp.int8)
        if _int8_f32_accum():
            acc = jax.lax.conv_general_dilated(
                xq.astype(jnp.float32), wq.astype(jnp.float32),
                window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
            )
        else:
            acc = jax.lax.conv_general_dilated(
                xq, wq, window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=feature_group_count,
                preferred_element_type=jnp.int32,
            )
        return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)

    def exact(xx, kk):
        return jax.lax.conv_general_dilated(
            xx.astype(jnp.float32), kk.astype(jnp.float32),
            window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=feature_group_count,
        ).astype(out_dtype)

    return _ste(impl, exact, x, kernel)


def int8_matmul(
    x: jax.Array,
    kernel: jax.Array,
    *,
    out_dtype: Dtype = jnp.bfloat16,
    act_amax: jax.Array | None = None,
) -> jax.Array:
    """Dynamically/statically-quantized int8 matmul over the last axis
    (x [..., K] @ kernel [K, N]); same scale scheme as int8_conv
    (per-tensor activation, per-output-column weight, int32 accumulation).
    Measured 1.61x vs bf16 on the wav2vec2 FFN shape (exp_r5b)."""
    def impl(xx, kk):
        if act_amax is None:
            sx = jnp.max(jnp.abs(xx)).astype(jnp.float32) / 127.0
        else:
            sx = act_amax.astype(jnp.float32) / 127.0
        sx = jnp.maximum(sx, 1e-10)
        xq = jnp.clip(
            jnp.round(xx.astype(jnp.float32) / sx), -127, 127
        ).astype(jnp.int8)
        sw = jnp.max(jnp.abs(kk.astype(jnp.float32)), axis=0) / 127.0
        sw = jnp.maximum(sw, 1e-10)
        wq = jnp.clip(
            jnp.round(kk.astype(jnp.float32) / sw), -127, 127
        ).astype(jnp.int8)
        if _int8_f32_accum():
            acc = jax.lax.dot_general(
                xq.astype(jnp.float32), wq.astype(jnp.float32),
                (((xx.ndim - 1,), (0,)), ((), ())),
            )
        else:
            acc = jax.lax.dot_general(
                xq, wq, (((xx.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)

    def exact(xx, kk):
        return jax.lax.dot_general(
            xx.astype(jnp.float32), kk.astype(jnp.float32),
            (((xx.ndim - 1,), (0,)), ((), ())),
        ).astype(out_dtype)

    return _ste(impl, exact, x, kernel)


class QDense(nn.Module):
    """Drop-in int8 replacement for ``nn.Dense`` (same param names/shapes/
    init — "kernel" [in, features] + "bias"), using int8_matmul with the
    act_scales calibration mechanic (see activation_amax)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = int8_matmul(
            x, kernel, out_dtype=self.dtype, act_amax=activation_amax(self, x)
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class QConv1d(nn.Module):
    """Drop-in int8 replacement for a 1-D ``nn.Conv`` (kernel shape
    (k, in, out) — identical to nn.Conv's 1-D layout, so checkpoints load
    unchanged). Runs as a height-1 2-D int8 conv on the MXU."""

    features: int
    kernel_size: int
    strides: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # x: [B, T, C]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        y = int8_conv(
            x[:, None, :, :], kernel[None],
            strides=(1, self.strides), padding=((0, 0), (0, 0)),
            out_dtype=self.dtype, act_amax=activation_amax(self, x),
        )[:, 0]
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def merge_act_scales_trees(current: Any, incoming: Any) -> Any:
    """Elementwise running max of two "act_scales" trees (scales only ever
    grow — merging a persisted representative-corpus calibration with the
    stage's seeded/first-batch scales is always safe). Raises on structure
    mismatch (model changed since the sidecar was written)."""
    return jax.tree.map(
        lambda a, b: jnp.maximum(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        ),
        current, incoming,
    )


def activation_amax(mod: nn.Module, x: jax.Array):
    """Per-tensor activation max-abs for int8 quantization, held in the
    "act_scales" variable collection.

    Three modes by context:
    - collection mutable (a calibration pass — the stage runs the model with
      ``mutable=["act_scales"]``): update the running max with this input
      and use it;
    - calibrated (stage variables carry act_scales): read the static
      scalar — the quantize fuses into the producing op, no reduction;
    - uncalibrated + immutable (e.g. parity tests calling apply directly):
      return None -> int8_conv falls back to the dynamic per-call scale.
    """
    if mod.is_mutable_collection("act_scales"):
        v = mod.variable(
            "act_scales", "amax", lambda: jnp.asarray(0.0, jnp.float32)
        )
        v.value = jnp.maximum(v.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        return v.value
    if mod.has_variable("act_scales", "amax"):
        return mod.get_variable("act_scales", "amax")
    return None


class QConv(nn.Module):
    """Drop-in dynamically/statically-quantized int8 replacement for
    ``nn.Conv``.

    Same parameter names, shapes, and initializers as nn.Conv (HWIO
    "kernel" + optional "bias"), so converted reference checkpoints load
    into either path unchanged; the int8 rounding happens inside the
    program (see int8_conv / activation_amax). Built for inference; under
    differentiation the straight-through estimator (``_ste``) supplies the
    exact conv's gradient, so accidental (or deliberate QAT) training with
    ``quant=True`` optimizes real gradients instead of silent zeros.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = 0
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = int8_conv(
            x, kernel, strides=self.strides, padding=pad, out_dtype=self.dtype,
            act_amax=activation_amax(self, x),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def s2d_fold_7x7_s2(
    x: jax.Array,  # [B, H, W, C]
    kernel: jax.Array,  # [7, 7, C, O]
    pad_h: tuple[int, int],
    pad_w: tuple[int, int],
) -> tuple[jax.Array, jax.Array, tuple[tuple[int, int], tuple[int, int]]]:
    """Exact space-to-depth reformulation of a 7x7/stride-2 conv stem.

    A 7x7 conv over 3 input channels keeps the MXU contraction dimension at
    3 (padded up to the 128 systolic lanes -> ~2% utilization). Rearranging
    2x2 pixel blocks into channels ([H, W, C] -> [H/2, W/2, 4C]) and folding
    the 7-tap kernel into an equivalent 4x4/stride-1 kernel over 4C channels
    (the classic MLPerf-ResNet TPU stem) computes the SAME products with the
    same parameters — only the accumulation grouping changes.

    Derivation per axis with low padding ``lo``: out[i] = sum_a w7[a] *
    x[2i + a - lo]. With s2d row r holding (x[2r], x[2r+1]), tap (j, e) of
    the 4-wide kernel multiplies x[2(i + j + r0) + e] where
    r0 = -((lo + 1) // 2), so w4[j, e] = w7[2j + e + lo + 2*r0]: odd ``lo``
    pads the 7 taps with one LEADING zero, even ``lo`` with one TRAILING
    zero, and the s2d conv pads (-r0, 3 + r0). Supports the torchvision
    stem (pad 3) and TF asymmetric "same" padding (pad lo 2 at 224/448
    inputs) — exactness pinned in tests/test_model_parity.py.

    Returns ``(x_s2d, kernel_s2d, padding)`` for a stride-1 VALID-layout
    ``conv_general_dilated`` / ``int8_conv`` call.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        # zero rows/cols at the far edge contribute zero, exactly like the
        # conv's own high-side zero padding
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h, w = h + h % 2, w + w % 2
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    pads = []
    k8 = kernel
    for axis, (lo, _hi) in enumerate((pad_h, pad_w)):
        if lo not in (2, 3):
            raise ValueError(f"s2d stem supports low padding 2 or 3, got {lo}")
        spec = [(0, 0)] * 4
        spec[axis] = (1, 0) if lo % 2 else (0, 1)
        k8 = jnp.pad(k8, spec)
        r0 = -((lo + 1) // 2)
        pads.append((-r0, 3 + r0))
    k8 = k8.reshape(4, 2, 4, 2, c, kernel.shape[-1])
    ks = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, kernel.shape[-1])
    return xs, ks, (tuple(pads[0]), tuple(pads[1]))


def max_pool_1d(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """torch MaxPool1d (valid padding, floor mode). x: [..., L, C]."""
    stride = stride or window
    return nn.max_pool(x, window_shape=(window,), strides=(stride,), padding="VALID")


def adaptive_avg_pool_to_1(x: jax.Array, axis: int = -2) -> jax.Array:
    """torch AdaptiveAvgPool*d(1) == mean over spatial axes."""
    return jnp.mean(x, axis=axis)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def scaled_dot_attention(
    q: jax.Array,  # [B, H, Tq, D]
    k: jax.Array,  # [B, H, Tk, D]
    v: jax.Array,  # [B, H, Tk, D]
    dtype: Dtype = jnp.float32,
) -> jax.Array:
    """Unmasked scaled dot-product attention; softmax in fp32 (TPU numerics),
    matmuls on the MXU in the compute dtype."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(dtype))
