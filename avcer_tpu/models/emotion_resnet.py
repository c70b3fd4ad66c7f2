"""Static emotion CNN: the reference's custom TF-flavored ResNet50.

Behavior contract — /root/reference/src/architectures/video.py:7-166:

- Bottleneck with BN eps=1e-3 (TF Keras default), stride on the FIRST 1x1
  conv (:13-21 — caffe-style, unlike torchvision), 3x3 conv padding "same"
- stem: Conv2dSame(3->64, k=7, s=2) — TF asymmetric "same" padding (:63-90)
- MaxPool2d(3, 2) with NO padding (:103)
- head: avgpool -> fc1(2048->512) -> ReLU -> fc2(512->7); the 512-d
  pre-ReLU fc1 output is the dynamic model's feature (:110-127 and
  get_prob_video.py:115 applies F.relu to the harvested feature)

TPU design: NHWC layout, bf16 convs with fp32 BN; the dynamic-model feature
(relu(fc1)) and the softmax probabilities come out of one fused forward over
the whole frame batch — no hooks, no second pass.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.layers import (
    Dtype, QConv, TorchBatchNorm, s2d_fold_7x7_s2,
)

BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # torch momentum 0.99 convention quirk: reference passes
# momentum=0.99 to nn.BatchNorm2d, which in torch means new = 0.01*old +
# 0.99*batch. Running stats come converted from the checkpoint, so this only
# matters if training the visual model in this framework.


def same_pad(i: int, k: int, s: int, d: int = 1) -> tuple[int, int]:
    """TF 'same' padding amounts (lo, hi) for one spatial dim
    (architectures/video.py:65-66: total = max((ceil(i/s)-1)*s+(k-1)*d+1-i, 0),
    split low = total//2, high = total - total//2)."""
    total = max((-(-i // s) - 1) * s + (k - 1) * d + 1 - i, 0)
    return total // 2, total - total // 2


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def conv(ch, k, s, pad, name):
            if self.quant:
                return QConv(ch, (k, k), strides=(s, s), padding=pad,
                             use_bias=False, dtype=self.dtype, name=name)
            return nn.Conv(ch, (k, k), strides=(s, s), padding=pad,
                           use_bias=False, dtype=self.dtype, name=name)

        identity = x
        h = conv(self.planes, 1, self.stride, "VALID", "conv1")(x)
        h = TorchBatchNorm(eps=BN_EPS, momentum=BN_MOMENTUM, dtype=self.dtype,
                           name="batch_norm1")(h, not train)
        h = nn.relu(h)
        h = conv(self.planes, 3, 1, "SAME", "conv2")(h)
        h = TorchBatchNorm(eps=BN_EPS, momentum=BN_MOMENTUM, dtype=self.dtype,
                           name="batch_norm2")(h, not train)
        h = nn.relu(h)
        h = conv(self.planes * 4, 1, 1, "VALID", "conv3")(h)
        h = TorchBatchNorm(eps=BN_EPS, momentum=BN_MOMENTUM, dtype=self.dtype,
                           name="batch_norm3")(h, not train)
        if self.downsample:
            identity = conv(
                self.planes * 4, 1, self.stride, "VALID", "downsample_conv"
            )(identity)
            identity = TorchBatchNorm(
                eps=BN_EPS, momentum=BN_MOMENTUM, dtype=self.dtype,
                name="downsample_bn",
            )(identity, not train)
        return nn.relu(h + identity)


class _S2dStem(nn.Module):
    """bf16 space-to-depth stem (layers.s2d_fold_7x7_s2, exact transform)
    with the TF asymmetric same padding. Same param tree as the plain
    ``nn.Conv(64, (7, 7), use_bias=False)`` stem."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, pad_h: tuple[int, int], pad_w: tuple[int, int]
    ) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64),
            jnp.float32,
        )
        xs, ks, pad = s2d_fold_7x7_s2(x, kernel, pad_h, pad_w)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ks.astype(self.dtype),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class EmotionResNet50(nn.Module):
    """Input: normalized BGR crops [B, 224, 224, 3] (ops.image.vggface_normalize).

    Returns (logits [B, C], features [B, 512]) where features = relu(fc1) —
    exactly what the dynamic LSTM consumes (get_prob_video.py:115).
    """

    num_classes: int = 7
    dtype: Dtype = jnp.float32
    layer_sizes: tuple[int, int, int, int] = (3, 4, 6, 3)
    #: int8 serving path (layers.QConv / int8_conv): all bottleneck + stem
    #: convs run quantized on the MXU; fc head stays bf16. Same checkpoint
    #: tree; calibrate via the "act_scales" collection (VisualConfig.quant).
    quant: bool = False
    #: exact space-to-depth stem reformulation (layers.s2d_fold_7x7_s2) —
    #: same params, same math, MXU-friendly layout. bf16 path only; under
    #: quant the stem keeps the QConv layout (pending a measured win).
    s2d_stem: bool = False
    #: bottleneck chains as fused Pallas programs
    #: (ops/pallas/fused_resnet_kernel.py): layer1 whole (its projection
    #: entry is stride 1 here), layers 2-4 identity tails (stride-2 entries
    #: stay in XLA; 512-plane chains chunk to 1 block — ~8.7 MB of folded
    #: weights per block must fit VMEM). Exact math over the same
    #: checkpoint tree; inference bf16/f32 non-quant path only.
    fused: bool = False
    #: with ``fused``, also fuse the stride-2 entry blocks of layers 2-3
    #: into their chains ("s2pre" kernel blocks: this TF-v1 flavor strides
    #: conv1 + the projection, so the entry collapses to a band subsample
    #: — fused_resnet_kernel docstring). layer4's entry stays in XLA
    #: (512-plane folded weights ~12 MB/block exceed VMEM headroom).
    fused_entries: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_act4: bool = False
    ):
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        ph, pw = same_pad(h, 7, 2), same_pad(w, 7, 2)
        if self.s2d_stem and not self.quant:
            h_ = _S2dStem(dtype=self.dtype, name="conv_stem")(x, ph, pw)
        else:
            stem_cls = QConv if self.quant else nn.Conv
            h_ = stem_cls(
                64, (7, 7), strides=(2, 2), padding=(ph, pw), use_bias=False,
                dtype=self.dtype, name="conv_stem",
            )(x)
        h_ = TorchBatchNorm(eps=BN_EPS, momentum=BN_MOMENTUM, dtype=self.dtype,
                            name="batch_norm1")(h_, not train)
        h_ = nn.relu(h_)
        h_ = nn.max_pool(h_, (3, 3), strides=(2, 2), padding="VALID")

        planes = (64, 128, 256, 512)
        in_ch = 64
        # fused chains serve both the exact path and calibrated int8
        # (TVBottleneckFolded quant fold — same act_scales tree as QConv)
        use_fused = self.fused and not train
        for li, (blocks, p) in enumerate(zip(self.layer_sizes, planes)):
            stride = 1 if li == 0 else 2
            if use_fused:
                from avcer_tpu.models.retinaface import TVBottleneckFolded
                from avcer_tpu.ops.pallas.fused_resnet_kernel import fused_chain

                start = 0
                fuse_entry = self.fused_entries and 0 < li < 3
                if li > 0 and not fuse_entry:
                    # stride-2 projection entry stays in XLA
                    h_ = Bottleneck(
                        p, stride=stride, downsample=True, dtype=self.dtype,
                        quant=self.quant, name=f"layer{li + 1}_0",
                    )(h_, train)
                    in_ch = p * 4
                    start = 1
                tail = list(range(start, blocks))
                chunk_n = 1 if p >= 512 else 3
                while tail:
                    chunk, tail = tail[:chunk_n], tail[chunk_n:]
                    flat: list = []
                    sxs: list = []
                    for bi in chunk:
                        got = TVBottleneckFolded(
                            p, downsample=bi == 0, dtype=self.dtype,
                            eps=BN_EPS, bn_prefix="batch_norm",
                            quant=self.quant,
                            name=f"layer{li + 1}_{bi}",
                        )(in_ch if bi == 0 else p * 4)
                        if self.quant:
                            got, sx = got
                            sxs.append(sx)
                        flat += [t for tr in got for t in tr]
                    h_ = fused_chain(
                        h_.astype(self.dtype), tuple(flat),
                        tuple(
                            ("s2pre" if li > 0 else "ds") if bi == 0 else "id"
                            for bi in chunk
                        ),
                        interpret=jax.default_backend() == "cpu",
                        act_s=jnp.concatenate(sxs) if sxs else None,
                    )
                    in_ch = p * 4
                continue
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != p * 4)
                h_ = Bottleneck(
                    p, stride=s, downsample=ds, dtype=self.dtype,
                    quant=self.quant, name=f"layer{li + 1}_{bi}",
                )(h_, train)
                in_ch = p * 4

        pooled = jnp.mean(h_, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        feat_pre = nn.Dense(512, dtype=self.dtype, name="fc1")(pooled)
        features = nn.relu(feat_pre)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(features)
        if return_act4:
            # layer4 output, for Grad-CAM (get_prob_video.py:47-48 harvests it
            # with hooks; here it is just a second output)
            return logits, features, h_
        return logits, features
