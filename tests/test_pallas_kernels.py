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


def _layer1_backbones(dtype, **kw):
    from avcer_tpu.models.retinaface import ResNet50Backbone

    exact = ResNet50Backbone(dtype=dtype)
    fused = ResNet50Backbone(dtype=dtype, fused_layer1=True, **kw)
    return exact, fused


def test_fused_layer1_matches_xla(rng):
    """The fused Pallas layer1 program (interpret mode) reproduces the
    unfused bottleneck chain over the SAME variable tree, including the
    non-divisible band-height path (h=13 with band 8 -> padded tail)."""
    from avcer_tpu.ops.pallas import fused_resnet_kernel as frk

    exact, fused = _layer1_backbones(jnp.float32)
    for hw in ((2, 32, 48, 3), (1, 52, 40, 3)):
        x = jnp.asarray(rng.normal(size=hw).astype(np.float32))
        variables = exact.init(jax.random.PRNGKey(0), x)
        want = exact.apply(variables, x)
        orig = frk._pick_band
        try:
            frk._pick_band = lambda h, cap=32: min(h, 8)  # force multi-band
            got = fused.apply(variables, x)
        finally:
            frk._pick_band = orig
        for w_, g_ in zip(want, got):
            np.testing.assert_allclose(
                np.asarray(g_), np.asarray(w_), atol=2e-4, rtol=1e-3
            )


def test_fused_chain_flat_matches_banded(rng):
    """The v2 flat-layout kernel (fused_chain_flat: 2-D band, SAME-shaped
    taps as row-offset slices, constant geometry) is bit-identical to the
    banded 3-D kernel on stride-1 chains, across band splits, non-divisible
    dims, and both the projection-entry and 128-channel identity cases."""
    from avcer_tpu.ops.pallas import fused_resnet_kernel as frk

    def mk(k, cin, co):
        w = jnp.asarray(rng.normal(size=(k, k, cin, co)) * 0.1, jnp.float32)
        inv = jnp.asarray(rng.normal(size=(1, co)) * 0.2 + 1, jnp.float32)
        sh = jnp.asarray(rng.normal(size=(1, co)) * 0.1, jnp.float32)
        return (w[0, 0] if k == 1 else w), inv, sh

    for shape, blocks, band in (
            ((2, 13, 17, 64), ("ds", "id", "id"), 8),
            ((1, 37, 29, 128), ("id", "id"), 16),
            ((1, 24, 16, 64), ("ds",), 24),
    ):
        cin = shape[-1]
        p, co = 24, cin if blocks[0] == "id" else 64
        folded: list = []
        for kind in blocks:
            folded += [*mk(1, cin, p), *mk(3, p, p), *mk(1, p, co)]
            if kind == "ds":
                folded += [*mk(1, cin, co)]
            cin = co
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        want = frk.fused_chain(x, tuple(folded), blocks, interpret=True,
                               band=band)
        got = frk.fused_chain_flat(x, tuple(folded), blocks, interpret=True,
                                   band=band)
        assert want.shape == got.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_layer1_bf16_close(rng):
    """bf16 serving dtype: same rounding points as the unfused path —
    outputs agree to bf16 resolution."""
    exact, fused = _layer1_backbones(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = exact.init(jax.random.PRNGKey(1), x)
    want = np.asarray(exact.apply(variables, x)[0], np.float32)
    got = np.asarray(fused.apply(variables, x)[0], np.float32)
    scale = max(np.abs(want).max(), 1.0)
    assert np.abs(got - want).max() / scale < 0.05


def test_fused_tails_match_xla(rng):
    """fused_tails (layer2/3 identity chains, incl. layer3's 3+2 chunk
    split; stride-2 entries in XLA) reproduces the exact backbone."""
    exact, fused = _layer1_backbones(jnp.float32, fused_tails=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 48, 3)).astype(np.float32))
    variables = exact.init(jax.random.PRNGKey(3), x)
    want = exact.apply(variables, x)
    got = fused.apply(variables, x)
    for w_, g_ in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), atol=2e-4, rtol=1e-3
        )


def test_fused_entries_match_xla(rng):
    """fused_entries ("s2ds" blocks: the stride-2 entry bottlenecks of
    layers 2-3 fused into their chains — layer2 as ONE program, layer3 as
    entry+1/2/2 chunks) reproduces the exact backbone, including odd
    feature dims (64x48 input -> 45->23->12-row stage maps exercise the
    ceil-div output rule and padded-band tails)."""
    exact, fused = _layer1_backbones(
        jnp.float32, fused_tails=True, fused_entries=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 48, 3)).astype(np.float32))
    variables = exact.init(jax.random.PRNGKey(3), x)
    want = exact.apply(variables, x)
    got = fused.apply(variables, x)
    for w_, g_ in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), atol=2e-4, rtol=1e-3
        )


def test_fused_entries_same_init_tree(rng):
    """fused_entries declares the identical parameter/stat tree — the
    stride-2 entry blocks' folded declarations match TVBottleneck's."""
    exact, fused = _layer1_backbones(
        jnp.float32, fused_tails=True, fused_entries=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    va = exact.init(jax.random.PRNGKey(7), x)
    vb = fused.init(jax.random.PRNGKey(7), x)
    la, lb = jax.tree_util.tree_leaves_with_path(va), \
        jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, a), (_, b) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_ssh_heads_match_xla(rng):
    """fused_ssh (SSH context DAG + the three 1x1 heads as one Pallas
    program per FPN scale, relu(concat) decomposed into per-segment head
    matmuls) reproduces the exact RetinaFace outputs for both backbones
    (mobilenet exercises the leaky-relu branches), with identical
    parameter trees."""
    from avcer_tpu.models.retinaface import RetinaFace

    key = jax.random.PRNGKey(0)
    for backbone in ("resnet50", "mobilenet0.25"):
        exact = RetinaFace(backbone=backbone, dtype=jnp.float32)
        fused = RetinaFace(backbone=backbone, dtype=jnp.float32,
                           fused_ssh=True)
        x = jnp.asarray(rng.normal(size=(1, 72, 56, 3)).astype(np.float32))
        v = exact.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
        want = exact.apply(v, x)
        got = fused.apply(v, x)
        for wv, gv in zip(want, got):
            np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                       atol=2e-5, rtol=1e-4)
        va = exact.init(jax.random.PRNGKey(7), x)
        vb = fused.init(jax.random.PRNGKey(7), x)
        la = jax.tree_util.tree_leaves_with_path(va)
        lb = jax.tree_util.tree_leaves_with_path(vb)
        assert [p for p, _ in la] == [p for p, _ in lb]
        for (_, a), (_, b) in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_fpn_ssh_heads_match_xla(rng):
    """fused_fpn + fused_ssh: the WHOLE post-backbone detector (FPN
    lateral + top-down upsample-add + merge + SSH DAG + heads) as one
    Pallas program per scale, sequenced top-down — exact and int8, both
    backbones. Parameter trees identical (act_scales init values are
    calibration state and excluded)."""
    from avcer_tpu.models.retinaface import RetinaFace

    key = jax.random.PRNGKey(0)
    for backbone, quant in (("resnet50", False), ("resnet50", True),
                            ("mobilenet0.25", False)):
        exact = RetinaFace(backbone=backbone, dtype=jnp.float32, quant=quant)
        fused = RetinaFace(backbone=backbone, dtype=jnp.float32, quant=quant,
                           fused_ssh=True, fused_fpn=True)
        x = jnp.asarray(rng.normal(size=(1, 72, 56, 3)).astype(np.float32))
        v = exact.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
        if quant:
            _, upd = exact.apply(v, x, mutable=["act_scales"])
            v = {**v, "act_scales": upd["act_scales"]}
        want = exact.apply(v, x)
        got = fused.apply(v, x)
        for wv, gv in zip(want, got):
            wv, gv = np.asarray(wv), np.asarray(gv)
            rel = np.abs(wv - gv).max() / max(np.abs(wv).max(), 1e-6)
            assert rel < 1e-4, (backbone, quant, rel)
        va = exact.init(jax.random.PRNGKey(7), x)
        vb = fused.init(jax.random.PRNGKey(7), x)
        la = jax.tree_util.tree_leaves_with_path(va)
        lb = jax.tree_util.tree_leaves_with_path(vb)
        assert [p for p, _ in la] == [p for p, _ in lb]
        for (pa, a), (_, b) in zip(la, lb):
            if "act_scales" in str(pa):
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_ssh_heads_int8_matches_xla_int8(rng):
    """fused_ssh under quant: the 5 SSH convs run int8 inside the kernel
    (heads stay exact, as in the XLA int8 path) and reproduce the XLA
    QConv model over the same calibrated variables."""
    from avcer_tpu.models.retinaface import RetinaFace

    key = jax.random.PRNGKey(0)
    exact = RetinaFace(backbone="resnet50", dtype=jnp.float32, quant=True)
    fused = RetinaFace(backbone="resnet50", dtype=jnp.float32, quant=True,
                       fused_ssh=True)
    x = jnp.asarray(rng.normal(size=(1, 72, 56, 3)).astype(np.float32))
    v = exact.init(key, jnp.zeros((1, 64, 64, 3), jnp.float32))
    _, upd = exact.apply(v, x, mutable=["act_scales"])  # calibrate
    v = {**v, "act_scales": upd["act_scales"]}
    want = exact.apply(v, x)
    got = fused.apply(v, x)
    for wv, gv in zip(want, got):
        wv, gv = np.asarray(wv), np.asarray(gv)
        rel = np.abs(wv - gv).max() / max(np.abs(wv).max(), 1e-6)
        assert rel < 1e-4, rel
    va = exact.init(jax.random.PRNGKey(7), x)
    vb = fused.init(jax.random.PRNGKey(7), x)
    la = jax.tree_util.tree_leaves_with_path(va)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]


def test_fused_chain_int8_matches_xla_int8(rng):
    """int8 fused chains (TVBottleneckFolded quant fold: per-channel int8
    weights, calibrated per-tensor activation scales via the SAME
    act_scales tree as the QConv path, int32 MXU accumulation) reproduce
    the XLA int8 chain — stride-1 and stride-2-entry variants. The only
    reformulation is merging the dequant multiply into the folded BN scale
    (f32 associativity), so f32 outputs match to ~1e-5 relative."""
    import flax.linen as nn

    from avcer_tpu.models.retinaface import TVBottleneck, TVBottleneckFolded
    from avcer_tpu.ops.pallas.fused_resnet_kernel import fused_chain

    class Chain(nn.Module):
        planes: int
        n: int
        s2: bool = False
        fused: bool = False

        @nn.compact
        def __call__(self, x):
            in_ch = x.shape[-1]
            if self.fused:
                folded, sxs = [], []
                for bi in range(self.n):
                    out, sx = TVBottleneckFolded(
                        self.planes, downsample=bi == 0, dtype=jnp.float32,
                        quant=True,
                        name=f"b{bi}")(in_ch if bi == 0 else self.planes * 4)
                    folded += out
                    sxs.append(sx)
                flat = tuple(t for tr in folded for t in tr)
                kinds = (("s2ds" if self.s2 else "ds"),) \
                    + ("id",) * (self.n - 1)
                return fused_chain(x, flat, kinds, interpret=True, band=8,
                                   act_s=jnp.concatenate(sxs))
            h = x
            for bi in range(self.n):
                h = TVBottleneck(self.planes,
                                 stride=2 if (bi == 0 and self.s2) else 1,
                                 downsample=bi == 0, dtype=jnp.float32,
                                 quant=True, name=f"b{bi}")(h)
            return h

    key = jax.random.PRNGKey(0)
    for s2 in (False, True):
        x = jnp.asarray(rng.normal(size=(2, 23, 17, 16)).astype(np.float32))
        ref = Chain(8, 3, s2=s2)
        v = ref.init(key, jnp.zeros((1, 16, 16, 16), jnp.float32))
        _, upd = ref.apply(v, x, mutable=["act_scales"])  # calibrate
        v = {**v, "act_scales": upd["act_scales"]}
        want = np.asarray(ref.apply(v, x))
        got = np.asarray(Chain(8, 3, s2=s2, fused=True).apply(v, x))
        assert want.shape == got.shape
        rel = np.abs(want - got).max() / max(np.abs(want).max(), 1e-6)
        assert rel < 1e-4, (s2, rel)


def test_fused_backbone_int8_matches_xla_int8(rng):
    """ResNet50Backbone(quant=True) with all fused flags reproduces the
    XLA QConv backbone over the same calibrated variables (the serving
    combination the int8 profiles run)."""
    from avcer_tpu.models.retinaface import ResNet50Backbone

    exact = ResNet50Backbone(dtype=jnp.float32, quant=True)
    fused = ResNet50Backbone(dtype=jnp.float32, quant=True,
                             fused_layer1=True, fused_tails=True,
                             fused_entries=True)
    x = jnp.asarray(rng.normal(size=(1, 64, 48, 3)).astype(np.float32))
    variables = exact.init(jax.random.PRNGKey(3), x)
    _, upd = exact.apply(variables, x, mutable=["act_scales"])
    variables = {**variables, "act_scales": upd["act_scales"]}
    want = exact.apply(variables, x)
    got = fused.apply(variables, x)
    for w_, g_ in zip(want, got):
        w_, g_ = np.asarray(w_), np.asarray(g_)
        rel = np.abs(w_ - g_).max() / max(np.abs(w_).max(), 1e-6)
        assert rel < 1e-4, rel
    # identical variable trees (params + batch_stats + act_scales paths)
    vb = fused.init(jax.random.PRNGKey(7), x)
    va = exact.init(jax.random.PRNGKey(7), x)
    la = jax.tree_util.tree_leaves_with_path(va)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]


def test_fused_emotion_cnn_int8_matches_xla_int8(rng):
    """EmotionResNet50(quant=True, fused=True, fused_entries=True) — the
    int8 serving CNN with fused chains — reproduces the XLA QConv model
    over the same calibrated variables."""
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    exact = EmotionResNet50(num_classes=7, dtype=jnp.float32, quant=True)
    fused = EmotionResNet50(num_classes=7, dtype=jnp.float32, quant=True,
                            fused=True, fused_entries=True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 50)
    variables = exact.init(jax.random.PRNGKey(5), x)
    _, upd = exact.apply(variables, x, mutable=["act_scales"])
    variables = {**variables, "act_scales": upd["act_scales"]}
    want_l, want_f = exact.apply(variables, x)
    got_l, got_f = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=2e-3, rtol=1e-3)
    vb = fused.init(jax.random.PRNGKey(9), x)
    va = exact.init(jax.random.PRNGKey(9), x)
    la = jax.tree_util.tree_leaves_with_path(va)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]


def test_fused_chain_s2pre_matches_tf_entry(rng):
    """"s2pre" kernel blocks (TF-v1 stride placement: conv1 + projection
    stride 2, 3x3 stride-1 SAME — the emotion CNN's convention) reproduce
    the XLA Bottleneck chain, odd and even input dims."""
    import flax.linen as nn

    from avcer_tpu.models.emotion_resnet import Bottleneck
    from avcer_tpu.models.retinaface import TVBottleneckFolded
    from avcer_tpu.ops.pallas.fused_resnet_kernel import fused_chain

    class Chain(nn.Module):
        planes: int
        n: int
        fused: bool = False

        @nn.compact
        def __call__(self, x):
            in_ch = x.shape[-1]
            if self.fused:
                folded = []
                for bi in range(self.n):
                    folded += TVBottleneckFolded(
                        self.planes, downsample=bi == 0, dtype=jnp.float32,
                        eps=1e-3, bn_prefix="batch_norm",
                        name=f"b{bi}")(in_ch if bi == 0 else self.planes * 4)
                flat = tuple(t for tr in folded for t in tr)
                return fused_chain(
                    x, flat, ("s2pre",) + ("id",) * (self.n - 1),
                    interpret=True, band=8)
            h = x
            for bi in range(self.n):
                h = Bottleneck(self.planes, stride=2 if bi == 0 else 1,
                               downsample=bi == 0, dtype=jnp.float32,
                               name=f"b{bi}")(h)
            return h

    key = jax.random.PRNGKey(0)
    for (hh, ww, cin, planes, n) in [(25, 19, 16, 8, 3), (14, 14, 16, 8, 1)]:
        x = jnp.asarray(rng.normal(size=(2, hh, ww, cin)).astype(np.float32))
        ref = Chain(planes, n)
        v = ref.init(key, jnp.zeros((1, 16, 16, cin), jnp.float32))
        want = np.asarray(ref.apply(v, x))
        got = np.asarray(Chain(planes, n, fused=True).apply(v, x))
        assert want.shape == got.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_emotion_cnn_entries_match_xla(rng):
    """EmotionResNet50(fused=True, fused_entries=True): layers 2-3 fuse
    WHOLE (stride-2 entries as "s2pre" blocks); layer4's entry stays in
    XLA. Same outputs, same init tree."""
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    exact = EmotionResNet50(num_classes=7, dtype=jnp.float32)
    fused = EmotionResNet50(num_classes=7, dtype=jnp.float32, fused=True,
                            fused_entries=True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 50)
    variables = exact.init(jax.random.PRNGKey(5), x)
    want_l, want_f = exact.apply(variables, x)
    got_l, got_f = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=2e-3, rtol=1e-3)
    vb = fused.init(jax.random.PRNGKey(9), x)
    va = exact.init(jax.random.PRNGKey(9), x)
    la = jax.tree_util.tree_leaves_with_path(va)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]


def test_fused_emotion_cnn_matches_xla(rng):
    """EmotionResNet50(fused=True): layer1 whole + layer2-4 identity tails
    as fused chains (TF-flavored blocks: batch_norm names, eps 1e-3)
    reproduce the exact model over the same variable tree."""
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    exact = EmotionResNet50(num_classes=7, dtype=jnp.float32)
    fused = EmotionResNet50(num_classes=7, dtype=jnp.float32, fused=True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 50)
    variables = exact.init(jax.random.PRNGKey(5), x)
    want_l, want_f = exact.apply(variables, x)
    got_l, got_f = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               atol=2e-3, rtol=1e-3)
    va = exact.init(jax.random.PRNGKey(9), x)
    vb = fused.init(jax.random.PRNGKey(9), x)
    la = jax.tree_util.tree_leaves_with_path(va)
    lb = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]


def test_fused_layer1_same_init_tree(rng):
    """fused_layer1=True declares the identical parameter/stat tree (same
    names, shapes, AND init values — init RNGs are path-derived)."""
    exact, fused = _layer1_backbones(jnp.float32, fused_tails=True)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    va = exact.init(jax.random.PRNGKey(7), x)
    vb = fused.init(jax.random.PRNGKey(7), x)
    la, lb = jax.tree_util.tree_leaves_with_path(va), \
        jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (_, a), (_, b) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
