"""RetinaFace face detector (resnet50 / mobilenet0.25 backbones) in Flax.

Behavior contract — /root/reference/src/data/face_detection/ibug/face_detection/
retina_face/{retina_face.py, retina_face_net.py, config.py}:

- torchvision resnet50 backbone (v1.5: stride on the 3x3 conv, BN eps 1e-5,
  padded maxpool), taps layer2/3/4 (config.py:36 return_layers)
- FPN to 256 ch: 1x1 lateral convs + nearest upsample + 3x3 merge convs
  (retina_face_net.py:70-100); LeakyReLU slope 0 == ReLU at 256 ch
- 3 SSH context modules (retina_face_net.py:41-67)
- per-level 1x1 heads with 2 anchors: class (softmax in test phase), bbox,
  landmark (retina_face.py:9-43, 95-115)
- anchor-row order: level, then row-major spatial, then anchor — identical to
  ops.boxes.prior_boxes

TPU design: NHWC, bf16 convs, fixed input bucket -> the whole
detect-decode-NMS stage is one jitted program (see pipeline.detect).
The mobilenet0.25 variant (retina_face_net.py:103-137) is provided for
parity with ``RetinaFacePredictor.get_model`` (retina_face_predictor.py:40-52).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avcer_tpu.models.layers import (
    Dtype, QConv, TorchBatchNorm, activation_amax as _activation_amax,
    int8_conv, s2d_fold_7x7_s2,
)


class ConvBN(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    leaky: float = 0.0
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.kernel - 1) // 2
        if self.quant and self.groups == 1:
            # grouped (depthwise) convs stay bf16: they are VPU-bound, not
            # MXU-bound, so int8 buys nothing there
            h = QConv(
                self.out_ch, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding=pad,
                use_bias=False, dtype=self.dtype, name="conv",
            )(x)
        else:
            h = nn.Conv(
                self.out_ch, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding=pad, use_bias=False,
                feature_group_count=self.groups, dtype=self.dtype, name="conv",
            )(x)
        h = TorchBatchNorm(eps=self.eps, dtype=self.dtype, name="bn")(h, not train)
        if self.relu:
            h = nn.leaky_relu(h, self.leaky) if self.leaky else nn.relu(h)
        return h


# ---------------------------------------------------------------------------
# torchvision-style ResNet50 backbone
# ---------------------------------------------------------------------------


class _DeclConvKernel(nn.Module):
    """Declares the same 'kernel' param an (un-called) nn.Conv would —
    lets TVBottleneck's fold mode materialize an identical parameter tree
    (same names, shapes, and path-derived init) without running the convs.
    With ``quant`` it also declares the QConv-compatible act_scales/amax
    variable (same path), so calibrated int8 checkpoints transfer."""

    shape: tuple[int, int, int, int]
    quant: bool = False

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        if not self.quant:
            return k
        amax = self.variable(
            "act_scales", "amax", lambda: jnp.asarray(0.0, jnp.float32)
        )
        return k, amax.value


class _DeclBN(nn.Module):
    """TorchBatchNorm's parameter/stat tree without the compute."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class TVBottleneckFolded(nn.Module):
    """Inference-folded weights of a TVBottleneck, for the fused Pallas
    layer1 kernel (ops/pallas/fused_resnet_kernel.py).

    Declares the SAME parameter tree as TVBottleneck — same child names,
    shapes, and path-derived init RNGs — so converted reference checkpoints
    and random inits are unaffected by which path runs; instead of
    computing, it returns per conv a matmul-shaped kernel plus the BN
    scale/shift fold y = conv(x)*inv + shift, numerically identical to
    conv -> TorchBatchNorm(inference)."""

    planes: int
    downsample: bool = False
    dtype: Dtype = jnp.float32
    eps: float = 1e-5
    #: BN child-name prefix: "bn" (torchvision RetinaFace backbone) or
    #: "batch_norm" (the TF-flavored emotion ResNet, same fold semantics)
    bn_prefix: str = "bn"
    #: int8 fold (layers.int8_conv semantics: per-output-channel symmetric
    #: weight scales, per-tensor CALIBRATED activation scale from the
    #: act_scales collection). Per conv, returns (wq int8, mult, shift)
    #: where mult = sx*sw*bn_inv folds the dequant into the BN scale, plus
    #: a separate sx vector (the kernel needs raw sx to QUANTIZE inputs).
    quant: bool = False

    @nn.compact
    def __call__(self, in_ch: int):
        sxs: list = []

        def conv_k(name: str, k: int, cin: int, cout: int):
            got = _DeclConvKernel((k, k, cin, cout), quant=self.quant,
                                  name=name)()
            if not self.quant:
                w = got
                return (w[0, 0] if k == 1 else w).astype(self.dtype)
            w, amax = got
            w = w[0, 0] if k == 1 else w
            red = tuple(range(w.ndim - 1))
            sw = jnp.max(jnp.abs(w), axis=red) / 127.0
            sw = jnp.maximum(sw, 1e-10)
            wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
            sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-10)
            sxs.append(sx)
            return wq, sw * sx

        def bn_fold(name: str, cout: int, dequant=None):
            scale, bias, mean, var = _DeclBN(name=name)(cout)
            inv = scale * jax.lax.rsqrt(var + self.eps)
            shift = bias - mean * inv
            if dequant is not None:  # int8: mult = sx*sw*inv, all f32
                return (dequant * inv).reshape(1, -1), shift.reshape(1, -1)
            return (inv.reshape(1, -1).astype(self.dtype),
                    shift.reshape(1, -1).astype(self.dtype))

        p, bn = self.planes, self.bn_prefix

        def entry(cname, bname, k, cin, cout):
            got = conv_k(cname, k, cin, cout)
            if self.quant:
                wq, dq = got
                return (wq, *bn_fold(bname, cout, dequant=dq))
            return (got, *bn_fold(bname, cout))

        out = [
            entry("conv1", f"{bn}1", 1, in_ch, p),
            entry("conv2", f"{bn}2", 3, p, p),
            entry("conv3", f"{bn}3", 1, p, p * 4),
        ]
        if self.downsample:
            out.append(entry("downsample_conv", "downsample_bn", 1,
                             in_ch, p * 4))
        if self.quant:
            return out, jnp.stack(sxs)
        return out


class _ConvBNFolded(nn.Module):
    """ConvBN's parameter tree (conv/kernel + bn stats) with the inference
    BN fold applied — for the fused SSH kernel. ``quant`` mirrors
    TVBottleneckFolded's int8 fold: (wq int8, mult = sx*sw*inv, shift) +
    the raw activation scale sx (QConv-identical act_scales tree)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    eps: float = 1e-5
    quant: bool = False
    kernel: int = 3  # 1 -> matmul-shaped fold (FPN laterals)

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.kernel
        got = _DeclConvKernel((k, k, in_ch, self.out_ch), quant=self.quant,
                              name="conv")()
        scale, bias, mean, var = _DeclBN(name="bn")(self.out_ch)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * inv
        if not self.quant:
            w = got[0, 0] if k == 1 else got
            return (w.astype(self.dtype),
                    inv.reshape(1, -1).astype(self.dtype),
                    shift.reshape(1, -1).astype(self.dtype))
        w, amax = got
        w = w[0, 0] if k == 1 else w
        sw = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
        sw = jnp.maximum(sw, 1e-10)
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-10)
        return (wq, (sw * sx * inv).reshape(1, -1),
                shift.reshape(1, -1)), sx


class SSHFolded(nn.Module):
    """Inference-folded weights of one SSH module (same parameter tree as
    SSH — same child names/shapes/path-derived init), for the fused
    SSH+heads kernel (ops/pallas/fused_ssh_kernel.py)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, in_ch: int):
        oc = self.out_ch
        out: list = []
        sxs: list = []
        for nm, ci, co in (
            ("conv3X3", in_ch, oc // 2),
            ("conv5X5_1", in_ch, oc // 4),
            ("conv5X5_2", oc // 4, oc // 4),
            ("conv7X7_2", oc // 4, oc // 4),
            ("conv7x7_3", oc // 4, oc // 4),
        ):
            got = _ConvBNFolded(co, dtype=self.dtype, quant=self.quant,
                                name=nm)(ci)
            if self.quant:
                got, sx = got
                sxs.append(sx)
            out += list(got)
        if self.quant:
            return tuple(out), jnp.stack(sxs)
        return tuple(out)


class FPNFolded(nn.Module):
    """Inference-folded weights of the FPN module (same parameter tree as
    FPN) for the fully-fused FPN+SSH+heads path: per scale a lateral
    (output{i}, 1x1, matmul-shaped) and for scales 1-2 a merge 3x3."""

    out_ch: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, in_chs: tuple[int, int, int]):
        def conv(nm: str, ci: int, k: int):
            return _ConvBNFolded(self.out_ch, dtype=self.dtype,
                                 quant=self.quant, kernel=k, name=nm)(ci)

        lats = [conv(f"output{i + 1}", ci, 1) for i, ci in enumerate(in_chs)]
        merges = [conv("merge1", self.out_ch, 3),
                  conv("merge2", self.out_ch, 3)]
        if self.quant:
            return ([t for t, _ in lats], [t for t, _ in merges],
                    [s for _, s in lats], [s for _, s in merges])
        return lats, merges, None, None


class _DeclHead(nn.Module):
    """The params an (un-called) head ``nn.Conv(out, (1,1))`` would declare
    (kernel + bias, same init), returned matmul-shaped."""

    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_ch: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, in_ch, self.out), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out,),
                       jnp.float32)
        return k[0, 0].astype(self.dtype), b.astype(self.dtype)


class TVBottleneck(nn.Module):
    """torchvision Bottleneck: stride on the 3x3 conv (v1.5), BN eps 1e-5."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def conv(ch, k, s, name):
            if self.quant:
                return QConv(ch, (k, k), strides=(s, s),
                             padding=(k - 1) // 2, use_bias=False,
                             dtype=self.dtype, name=name)
            return nn.Conv(ch, (k, k), strides=(s, s),
                           padding="VALID" if k == 1 else (k - 1) // 2,
                           use_bias=False, dtype=self.dtype, name=name)

        identity = x
        h = conv(self.planes, 1, 1, "conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(h, not train)
        h = nn.relu(h)
        h = conv(self.planes, 3, self.stride, "conv2")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="bn2")(h, not train)
        h = nn.relu(h)
        h = conv(self.planes * 4, 1, 1, "conv3")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="bn3")(h, not train)
        if self.downsample:
            identity = conv(self.planes * 4, 1, self.stride, "downsample_conv")(
                identity
            )
            identity = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, not train
            )
        return nn.relu(h + identity)


class StemConv(nn.Module):
    """The torchvision 7x7/stride-2 stem conv, with an optional exact
    space-to-depth reformulation for the TPU MXU.

    A 7x7 conv over 3 input channels keeps the MXU contraction dimension at
    3 (padded up to the 128-wide systolic lanes -> ~2% utilization). The
    space-to-depth form rearranges the input to [H/2, W/2, 12] and the 7x7/s2
    kernel to an equivalent 4x4/s1 kernel over 12 channels (zero-padding the
    7-tap kernel to 8 taps at the leading edge, then folding the 2x2 pixel
    blocks into channels) — the classic MLPerf-ResNet TPU stem. Same
    parameters, identical math (same products summed; only the accumulation
    grouping changes), so converted reference checkpoints work unchanged.
    """

    s2d: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64), jnp.float32
        )
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d:
            if self.quant:
                return int8_conv(
                    x, kernel, strides=(2, 2), padding=((3, 3), (3, 3)),
                    out_dtype=self.dtype, act_amax=_activation_amax(self, x),
                )
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=dn,
            )
        # fold derivation + exactness contract: layers.s2d_fold_7x7_s2
        xs, ks, pad = s2d_fold_7x7_s2(x, kernel, (3, 3), (3, 3))
        if self.quant:
            return int8_conv(
                xs, ks, strides=(1, 1), padding=pad,
                out_dtype=self.dtype, act_amax=_activation_amax(self, xs),
            )
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ks.astype(self.dtype),
            window_strides=(1, 1), padding=pad,
            dimension_numbers=dn,
        )


class ResNet50Backbone(nn.Module):
    dtype: Dtype = jnp.float32
    s2d_stem: bool = False
    quant: bool = False
    #: run layer1 (the worst-MFU, HBM-bound section) as one fused Pallas
    #: program — ops/pallas/fused_resnet_kernel.py. Inference-only exact
    #: reformulation over the SAME parameter tree; bf16 path only.
    fused_layer1: bool = False
    #: also run the stride-1 identity tails of layers 2-3 as fused chains
    #: (their stride-2 entry bottlenecks stay in XLA); layer3's 5-block
    #: tail splits into 3+2 chains to bound VMEM weight residency.
    fused_tails: bool = False
    #: fuse the stride-2 entry bottlenecks of layers 2-3 into their chains
    #: too ("s2ds" kernel blocks — conv3x3/s2 taps as stride-2
    #: reshape-split slices), so layer2 runs as ONE program and layer3 as
    #: entry+1 / 2 / 2. Requires fused_tails; layer4 stays in XLA (a single
    #: 512-plane block's folded weights are ~12 MB — no VMEM headroom).
    fused_entries: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        # stem stays bf16 even in quant mode: a 3-input-channel conv gets no
        # MXU win from int8 (contraction depth 3) but pays the quantize
        # round-trip — measured 0.101 ms/frame int8 vs 0.072 bf16 at the 640
        # bucket (experiments/exp_r6_results.jsonl, loop_cum_int8_stem vs
        # r4b loop_cum_stem); every deeper section converts at 1.3-2.0x.
        h = StemConv(s2d=self.s2d_stem, dtype=self.dtype, quant=False,
                     name="conv1")(x)
        h = TorchBatchNorm(dtype=self.dtype, name="bn1")(h, not train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        in_ch = 64
        # fused chains run in inference for both the exact bf16 path and
        # the calibrated-int8 path (TVBottleneckFolded quant mode: same
        # act_scales tree as the QConv path)
        inference = not train
        use_fused1 = self.fused_layer1 and inference
        use_tails = self.fused_tails and inference
        interp = jax.default_backend() == "cpu"

        def fold_blocks(li: int, bis, planes: int):
            """-> (flat folded weights, act_s or None) for a chunk."""
            flat: list = []
            sxs: list = []
            for bi in bis:
                got = TVBottleneckFolded(
                    planes, downsample=bi == 0, dtype=self.dtype,
                    quant=self.quant,
                    name=f"layer{li + 1}_{bi}",
                )(in_ch if bi == 0 else planes * 4)
                if self.quant:
                    got, sx = got
                    sxs.append(sx)
                flat += [t for triple in got for t in triple]
            return tuple(flat), (jnp.concatenate(sxs) if sxs else None)

        for li, (blocks, planes) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            stride = 1 if li == 0 else 2
            if li == 0 and use_fused1:
                from avcer_tpu.ops.pallas.fused_resnet_kernel import fused_chain

                flat, act_s = fold_blocks(0, range(blocks), planes)
                h = fused_chain(
                    h.astype(self.dtype), flat, ("ds", "id", "id"),
                    interpret=interp, act_s=act_s,
                )
                in_ch = planes * 4
                continue
            if li in (1, 2) and use_tails:
                from avcer_tpu.ops.pallas.fused_resnet_kernel import fused_chain

                if self.fused_entries and inference:
                    # stride-2 entry fused into its chain ("s2ds"); layer3
                    # takes only 1 id with the entry (the 1024-ch folded
                    # weights are ~2.2 MB/block — VMEM residency cap)
                    first = blocks if li == 1 else 2
                    chunks = [list(range(first))]
                    tail = list(range(first, blocks))
                else:
                    # stride-2 entry bottleneck stays in XLA
                    h = TVBottleneck(planes, stride=stride, downsample=True,
                                     dtype=self.dtype, quant=self.quant,
                                     name=f"layer{li + 1}_0")(h, train)
                    in_ch = planes * 4
                    chunks = []
                    tail = list(range(1, blocks))
                # cap chains at 3 blocks: bounds per-call VMEM weight
                # residency (layer3's 1024-ch conv3 weights are ~2.2 MB
                # per block)
                while tail:
                    chunk, tail = tail[:3], tail[3:]
                    chunks.append(chunk)
                for chunk in chunks:
                    kinds = tuple(
                        "s2ds" if bi == 0 else "id" for bi in chunk
                    )
                    flat, act_s = fold_blocks(li, chunk, planes)
                    h = fused_chain(
                        h.astype(self.dtype),
                        flat,
                        kinds,
                        interpret=interp,
                        band=16 if li == 2 else 24,
                        act_s=act_s,
                    )
                    in_ch = planes * 4
                outs.append(h)
                continue
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or in_ch != planes * 4)
                h = TVBottleneck(planes, stride=s, downsample=ds, dtype=self.dtype,
                                 quant=self.quant,
                                 name=f"layer{li + 1}_{bi}")(h, train)
                in_ch = planes * 4
            if li >= 1:
                outs.append(h)
        return tuple(outs)  # layer2, layer3, layer4


# ---------------------------------------------------------------------------
# MobileNetV1-0.25 backbone (retina_face_net.py:103-137)
# ---------------------------------------------------------------------------


class ConvDW(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        # depthwise half is never quantized (VPU-bound); pointwise is MXU work
        h = ConvBN(in_ch, 3, self.stride, groups=in_ch, leaky=0.1,
                   dtype=self.dtype, name="dw")(x, train)
        return ConvBN(self.out_ch, 1, 1, leaky=0.1, dtype=self.dtype,
                      quant=self.quant, name="pw")(h, train)


class MobileNetV1Backbone(nn.Module):
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        q = self.quant
        # first conv stays bf16 in quant mode: 3 input channels -> no MXU
        # win from int8, only quantize overhead (same physics as the r50
        # stem, measured in exp_r6 loop_cum_int8_stem)
        h = ConvBN(8, 3, 2, leaky=0.1, dtype=self.dtype, quant=False,
                   name="stage1_0")(x, train)
        for i, (ch, s) in enumerate([(16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]):
            h = ConvDW(ch, s, dtype=self.dtype, quant=q, name=f"stage1_{i + 1}")(h, train)
        s1 = h
        for i, (ch, s) in enumerate([(128, 2)] + [(128, 1)] * 5):
            h = ConvDW(ch, s, dtype=self.dtype, quant=q, name=f"stage2_{i}")(h, train)
        s2 = h
        for i, (ch, s) in enumerate([(256, 2), (256, 1)]):
            h = ConvDW(ch, s, dtype=self.dtype, quant=q, name=f"stage3_{i}")(h, train)
        return s1, s2, h


# ---------------------------------------------------------------------------
# FPN + SSH + heads
# ---------------------------------------------------------------------------


def _upsample_nearest_to(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """F.interpolate(mode='nearest') to an exact size: index map
    floor(i * in / out) (torch nearest semantics). Two single-axis takes with
    trace-time-constant indices — a combined 2-D fancy index lowers to a slow
    general gather on TPU."""
    import numpy as np

    h, w = x.shape[1], x.shape[2]
    ri = (np.arange(hw[0]) * h) // hw[0]
    ci = (np.arange(hw[1]) * w) // hw[1]
    x = jnp.take(x, jnp.asarray(ri), axis=1)
    return jnp.take(x, jnp.asarray(ci), axis=2)


class FPN(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        leaky = 0.1 if self.out_ch <= 64 else 0.0
        q = self.quant
        o1 = ConvBN(self.out_ch, 1, leaky=leaky, dtype=self.dtype, quant=q,
                    name="output1")(feats[0], train)
        o2 = ConvBN(self.out_ch, 1, leaky=leaky, dtype=self.dtype, quant=q,
                    name="output2")(feats[1], train)
        o3 = ConvBN(self.out_ch, 1, leaky=leaky, dtype=self.dtype, quant=q,
                    name="output3")(feats[2], train)
        o2 = o2 + _upsample_nearest_to(o3, (o2.shape[1], o2.shape[2]))
        o2 = ConvBN(self.out_ch, 3, leaky=leaky, dtype=self.dtype, quant=q,
                    name="merge2")(o2, train)
        o1 = o1 + _upsample_nearest_to(o2, (o1.shape[1], o1.shape[2]))
        o1 = ConvBN(self.out_ch, 3, leaky=leaky, dtype=self.dtype, quant=q,
                    name="merge1")(o1, train)
        return o1, o2, o3


class SSH(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        leaky = 0.1 if self.out_ch <= 64 else 0.0
        q = self.quant
        c3 = ConvBN(self.out_ch // 2, 3, relu=False, dtype=self.dtype, quant=q,
                    name="conv3X3")(x, train)
        c5_1 = ConvBN(self.out_ch // 4, 3, leaky=leaky, dtype=self.dtype, quant=q,
                      name="conv5X5_1")(x, train)
        c5 = ConvBN(self.out_ch // 4, 3, relu=False, dtype=self.dtype, quant=q,
                    name="conv5X5_2")(c5_1, train)
        c7_2 = ConvBN(self.out_ch // 4, 3, leaky=leaky, dtype=self.dtype, quant=q,
                      name="conv7X7_2")(c5_1, train)
        c7 = ConvBN(self.out_ch // 4, 3, relu=False, dtype=self.dtype, quant=q,
                    name="conv7x7_3")(c7_2, train)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    """Full detector. Input: normalized BGR frames [B, H, W, 3].

    Returns (loc [B, A, 4], conf [B, A, 2] softmaxed, landms [B, A, 10]) with
    anchor rows ordered to match ``ops.boxes.prior_boxes((H, W))``.
    """

    backbone: str = "resnet50"
    dtype: Dtype = jnp.float32
    num_anchors: int = 2
    #: True = return raw class logits (the reference's phase='train' output,
    #: retina_face.py:111-115) for the multibox training loss; False =
    #: softmaxed scores (phase='test').
    raw_conf: bool = False
    #: exact space-to-depth stem reformulation (see StemConv) — same params,
    #: same math, MXU-friendly layout; inference-speed option.
    s2d_stem: bool = False
    #: resnet50 layer1 as one fused Pallas program (same checkpoint tree,
    #: inference-only — ResNet50Backbone.fused_layer1).
    fused_layer1: bool = False
    #: also fuse the stride-1 identity tails of layers 2-3
    #: (ResNet50Backbone.fused_tails).
    fused_tails: bool = False
    #: fuse the stride-2 entry bottlenecks of layers 2-3 too
    #: (ResNet50Backbone.fused_entries; requires fused_tails).
    fused_entries: bool = False
    #: run each SSH context module + its three 1x1 heads as ONE fused
    #: Pallas program per FPN scale — the SSH output never touches HBM
    #: (ops/pallas/fused_ssh_kernel.py). Exact reformulation; int8 under
    #: quant (heads stay in the compute dtype, as in the XLA path).
    fused_ssh: bool = False
    #: with fused_ssh, fold the FPN into the same per-scale programs:
    #: lateral 1x1 + top-down upsample-add + merge 3x3 feed the SSH DAG in
    #: VMEM, so the only FPN tensors touching HBM are the two small
    #: upsample sources the scale-2/3 kernels emit. Same exactness.
    fused_fpn: bool = False
    #: dynamically-quantized int8 serving path (layers.int8_conv): backbone +
    #: FPN + SSH convs run int8 on the MXU (~1.85x conv speedup on v5e);
    #: heads stay bf16 for box-regression precision. Same checkpoint tree as
    #: the exact path; quality drift quantified in PARITY.md.
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        if self.backbone == "resnet50":
            feats = ResNet50Backbone(
                dtype=self.dtype, s2d_stem=self.s2d_stem, quant=self.quant,
                fused_layer1=self.fused_layer1, fused_tails=self.fused_tails,
                fused_entries=self.fused_entries,
                name="body",
            )(x, train)
            out_ch = 256
        elif self.backbone == "mobilenet0.25":
            feats = MobileNetV1Backbone(
                dtype=self.dtype, quant=self.quant, name="body"
            )(x, train)
            out_ch = 64
        else:
            raise ValueError(self.backbone)

        if self.fused_ssh and self.fused_fpn and not train:
            # fully-fused FPN+SSH+heads: one Pallas program per scale,
            # sequenced top-down (scale 3 emits its lateral for the scale-2
            # upsample; scale 2 emits its merged feature for scale 1)
            from avcer_tpu.ops.pallas.fused_ssh_kernel import fused_ssh_heads

            leaky = 0.1 if out_ch <= 64 else 0.0
            interp = jax.default_backend() == "cpu"
            lats, merges, lat_sx, mer_sx = FPNFolded(
                out_ch, dtype=self.dtype, quant=self.quant, name="fpn"
            )(tuple(f.shape[-1] for f in feats))

            def scale_decls(i: int):
                got = SSHFolded(out_ch, dtype=self.dtype, quant=self.quant,
                                name=f"ssh{i + 1}")(out_ch)
                convs, ssh_sx = got if self.quant else (got, None)
                heads: list = []
                for nm, width in (("BboxHead", 4), ("ClassHead", 2),
                                  ("LandmarkHead", 10)):
                    heads += list(_DeclHead(
                        self.num_anchors * width, dtype=self.dtype,
                        name=f"{nm}_{i}")(out_ch))
                return convs, tuple(heads), ssh_sx

            per_scale: list = [None, None, None]
            feat_prev = None
            for i in (2, 1, 0):
                convs, heads, ssh_sx = scale_decls(i)
                has_merge = i < 2
                act_s = None
                if self.quant:
                    parts = [lat_sx[i][None]]
                    if has_merge:
                        parts.append(mer_sx[i][None])
                    parts.append(ssh_sx)
                    act_s = jnp.concatenate(parts)
                up = None
                if feat_prev is not None:
                    up = _upsample_nearest_to(
                        feat_prev, (feats[i].shape[1], feats[i].shape[2]))
                res = fused_ssh_heads(
                    feats[i].astype(self.dtype), convs, heads,
                    leaky=leaky, interpret=interp, act_s=act_s,
                    fpn_lat=tuple(lats[i]),
                    fpn_merge=tuple(merges[i]) if has_merge else None,
                    up=up, emit_feature=i > 0,
                )
                if i > 0:
                    lo, co, ld, feat_prev = res
                else:
                    lo, co, ld = res
                per_scale[i] = (lo.reshape(lo.shape[0], -1, 4),
                                co.reshape(co.shape[0], -1, 2),
                                ld.reshape(ld.shape[0], -1, 10))
            loc = jnp.concatenate([o[0] for o in per_scale], axis=1)
            conf = jnp.concatenate([o[1] for o in per_scale], axis=1)
            landms = jnp.concatenate([o[2] for o in per_scale], axis=1)
            if not self.raw_conf:
                conf = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
            return loc, conf, landms

        fpn = FPN(out_ch, dtype=self.dtype, quant=self.quant, name="fpn")(
            feats, train)

        if self.fused_ssh and not train:
            from avcer_tpu.ops.pallas.fused_ssh_kernel import fused_ssh_heads

            leaky = 0.1 if out_ch <= 64 else 0.0
            interp = jax.default_backend() == "cpu"
            locs, confs, ldms = [], [], []
            for i, f in enumerate(fpn):
                got = SSHFolded(out_ch, dtype=self.dtype, quant=self.quant,
                                name=f"ssh{i + 1}")(f.shape[-1])
                convs, act_s = got if self.quant else (got, None)
                heads: list = []
                for nm, width in (("BboxHead", 4), ("ClassHead", 2),
                                  ("LandmarkHead", 10)):
                    heads += list(_DeclHead(
                        self.num_anchors * width, dtype=self.dtype,
                        name=f"{nm}_{i}")(out_ch))
                lo, co, ld = fused_ssh_heads(
                    f.astype(self.dtype), convs, tuple(heads),
                    leaky=leaky, interpret=interp, act_s=act_s,
                )
                # rows (h, w, anchor) — same ordering as the unfused reshape
                locs.append(lo.reshape(lo.shape[0], -1, 4))
                confs.append(co.reshape(co.shape[0], -1, 2))
                ldms.append(ld.reshape(ld.shape[0], -1, 10))
            loc = jnp.concatenate(locs, axis=1)
            conf = jnp.concatenate(confs, axis=1)
            landms = jnp.concatenate(ldms, axis=1)
            if not self.raw_conf:
                conf = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
            return loc, conf, landms

        features = [
            SSH(out_ch, dtype=self.dtype, quant=self.quant, name=f"ssh{i + 1}")(
                f, train)
            for i, f in enumerate(fpn)
        ]

        def head(f: jax.Array, width: int, name: str) -> jax.Array:
            out = nn.Conv(
                self.num_anchors * width, (1, 1), padding="VALID",
                dtype=self.dtype, name=name,
            )(f)
            # NHWC -> rows (h, w, anchor): torch permutes NCHW->NHWC then
            # reshapes (retina_face.py:15-18); NHWC makes that a plain reshape.
            return out.reshape(out.shape[0], -1, width)

        loc = jnp.concatenate(
            [head(f, 4, f"BboxHead_{i}") for i, f in enumerate(features)], axis=1
        )
        conf = jnp.concatenate(
            [head(f, 2, f"ClassHead_{i}") for i, f in enumerate(features)], axis=1
        )
        landms = jnp.concatenate(
            [head(f, 10, f"LandmarkHead_{i}") for i, f in enumerate(features)], axis=1
        )
        if not self.raw_conf:
            conf = jax.nn.softmax(conf.astype(jnp.float32), axis=-1)
        return loc, conf, landms
