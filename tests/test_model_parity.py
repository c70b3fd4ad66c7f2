"""Activation parity: torch reference twins (random weights) -> converter ->
avcer_tpu Flax models. Passing these is the load-correctness guarantee for
the published checkpoints (SURVEY.md §7 hard part #1).

Spatial sizes are reduced vs production (this CI host has one CPU core);
the ops under test are size-independent (padding arithmetic is exercised by
non-square, non-power-of-two inputs)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from avcer_tpu.core import convert
from avcer_tpu.models.attention import TransformerLayer
from avcer_tpu.models.audio_heads import ExprModel
from avcer_tpu.models.emotion_resnet import EmotionResNet50
from avcer_tpu.models.retinaface import RetinaFace
from avcer_tpu.models.temporal_lstm import TemporalLSTM
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config

import torch_twins as twins

torch.manual_seed(0)


def randomize_state(model: torch.nn.Module, scale: float = 0.05) -> None:
    """Random weights AND random running stats so BN conversion is exercised."""
    sd = model.state_dict()
    g = torch.Generator().manual_seed(42)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith(".pe"):
                # deterministic sinusoidal positional-encoding buffer — the
                # reference registers it persistently (attention_layers.py:
                # 209); randomizing it would diverge from the recomputed PE
                continue
            if k.endswith("running_var"):
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            elif k.endswith("running_mean"):
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
            else:
                sd[k] = torch.randn(v.shape, generator=g) * scale
    model.load_state_dict(sd)


@pytest.mark.slow
def test_emotion_resnet50_parity(rng):
    tw = twins.TwinEmotionResNet50(7).eval()
    randomize_state(tw)
    x = rng.normal(size=(2, 3, 96, 112)).astype(np.float32) * 3
    with torch.no_grad():
        want_logits, want_feat = tw(torch.from_numpy(x))

    variables = convert.convert_emotion_resnet50(tw.state_dict())
    model = EmotionResNet50(num_classes=7, dtype=jnp.float32)
    apply = jax.jit(model.apply)
    got_logits, got_feat = apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got_feat), want_feat.numpy(), atol=1e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits.numpy(), atol=1e-3, rtol=1e-2
    )


def test_temporal_lstm_parity(rng):
    tw = twins.TwinTemporalLSTM(7).eval()
    randomize_state(tw, scale=0.3)
    x = rng.normal(size=(3, 10, 512)).astype(np.float32)
    with torch.no_grad():
        want = tw(torch.from_numpy(x)).numpy()
    variables = convert.convert_temporal_lstm(tw.state_dict())
    got = jax.jit(TemporalLSTM(7, dtype=jnp.float32).apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_transformer_layer_parity(rng):
    tw = twins.TwinTransformerLayer(64, 8).eval()
    randomize_state(tw, scale=0.2)
    x = rng.normal(size=(2, 17, 64)).astype(np.float32)
    with torch.no_grad():
        want = tw(torch.from_numpy(x)).numpy()
    t = convert._Tree()
    convert._convert_transformer_layer(t, tw.state_dict(), "", "tl")
    variables = {"params": t.params["tl"]}
    got = jax.jit(TransformerLayer(64, 8, dtype=jnp.float32).apply)(
        variables, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["v1", "v3"])
def test_expr_model_parity(rng, variant):
    tw = twins.TwinExprModel(variant=variant, num_classes=8, num_layers=2).eval()
    randomize_state(tw, scale=0.05)
    x = rng.normal(size=(2, 17000)).astype(np.float32)
    with torch.no_grad():
        want = tw(torch.from_numpy(x)).numpy()

    variables = convert.convert_expr_model(tw.state_dict(), variant=variant, num_layers=2)
    model = ExprModel(
        variant=variant,
        num_classes=8,
        wav2vec2_config=Wav2Vec2Config(num_layers=2),
        dtype=jnp.float32,
    )
    got = jax.jit(model.apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_retinaface_parity(rng):
    tw = twins.TwinRetinaFace().eval()
    randomize_state(tw, scale=0.05)
    x = rng.normal(size=(1, 3, 96, 80)).astype(np.float32) * 20
    with torch.no_grad():
        want_loc, want_conf, want_landms = tw(torch.from_numpy(x))

    variables = convert.convert_retinaface(tw.state_dict())
    model = RetinaFace(backbone="resnet50", dtype=jnp.float32)
    loc, conf, landms = jax.jit(model.apply)(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(loc), want_loc.numpy(), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(conf), want_conf.numpy(), atol=1e-4, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(landms), want_landms.numpy(), atol=1e-3, rtol=1e-2)

def test_s2d_stem_exactness(rng):
    """The space-to-depth stem is the SAME function as the plain 7x7/s2 stem
    (identical params, identical products — only the accumulation grouping
    differs), on even and odd spatial sizes."""
    from avcer_tpu.models.retinaface import StemConv

    for h, w in ((64, 64), (90, 80), (45, 37)):
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        plain = StemConv(s2d=False, dtype=jnp.float32)
        variables = plain.init(jax.random.PRNGKey(0), x)
        want = jax.jit(plain.apply)(variables, x)
        got = jax.jit(StemConv(s2d=True, dtype=jnp.float32).apply)(variables, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_emotion_s2d_stem_exactness(rng):
    """EmotionResNet50's s2d stem (TF asymmetric same padding — low pad 2 at
    224, unlike the detector's pad-3 stem) is the same function as the plain
    stem, full-model, shared variables."""
    from avcer_tpu.models.emotion_resnet import EmotionResNet50

    for h, w in ((224, 224), (112, 96)):
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        base = EmotionResNet50(num_classes=7, dtype=jnp.float32)
        variables = base.init(jax.random.PRNGKey(0), x)
        logits, feats = jax.jit(base.apply)(variables, x)
        s2d = EmotionResNet50(num_classes=7, dtype=jnp.float32, s2d_stem=True)
        logits2, feats2 = jax.jit(s2d.apply)(variables, x)
        np.testing.assert_allclose(
            np.asarray(logits2), np.asarray(logits), atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(feats2), np.asarray(feats), atol=2e-5, rtol=1e-4)


def test_wav2vec2_int8_quant_close_to_exact(rng):
    """AudioConfig.quant='int8': quantized encoder projections stay within
    tolerance of the exact path (same checkpoint tree), dynamic and
    calibrated-static modes."""
    import dataclasses

    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    c = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    wav = jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32))
    base = Wav2Vec2Encoder(c, dtype=jnp.float32)
    variables = base.init(jax.random.PRNGKey(4), wav)
    want = jax.jit(base.apply)(variables, wav)
    q = Wav2Vec2Encoder(dataclasses.replace(c, quant=True), dtype=jnp.float32)
    qv = q.init(jax.random.PRNGKey(4), wav)
    assert jax.tree.structure(qv["params"]) == jax.tree.structure(
        variables["params"]
    )
    got_dyn = jax.jit(q.apply)(variables, wav)  # dynamic fallback
    _, upd = q.apply(variables, wav, mutable=["act_scales"])
    got_cal = jax.jit(q.apply)(
        {**variables, "act_scales": upd["act_scales"]}, wav
    )
    rms = float(jnp.std(want)) + 1e-6
    for got in (got_dyn, got_cal):
        assert float(jnp.mean(jnp.abs(got - want))) / rms < 0.15


def test_emotion_resnet_int8_quant_close_to_exact(rng):
    """VisualConfig.quant='int8': softmax probs of the quantized CNN stay
    within quantization tolerance of the exact path (same checkpoint tree),
    in both dynamic-fallback and calibrated-static modes."""
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 60)
    base = EmotionResNet50(num_classes=7, dtype=jnp.float32)
    variables = base.init(jax.random.PRNGKey(3), x)
    for i in range(8):
        xc = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 60)
        _, upd = base.apply(variables, xc, True, mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
    logits, feats = jax.jit(base.apply)(variables, x)
    probs = jax.nn.softmax(logits, -1)
    q = EmotionResNet50(num_classes=7, dtype=jnp.float32, quant=True)
    for coll in ("params", "batch_stats"):
        qv = q.init(jax.random.PRNGKey(3), x)
        assert jax.tree.structure(qv[coll]) == jax.tree.structure(
            variables[coll]
        ), coll
    logits2, feats2 = jax.jit(q.apply)(variables, x)  # dynamic fallback
    assert float(jnp.max(jnp.abs(jax.nn.softmax(logits2, -1) - probs))) < 0.10
    _, upd = q.apply(variables, x, mutable=["act_scales"])
    qv_cal = {**variables, "act_scales": upd["act_scales"]}
    logits3, feats3 = jax.jit(q.apply)(qv_cal, x)  # calibrated static
    assert float(jnp.max(jnp.abs(jax.nn.softmax(logits3, -1) - probs))) < 0.10
    f_rms = float(jnp.std(feats)) + 1e-6
    assert float(jnp.mean(jnp.abs(feats3 - feats))) / f_rms < 0.35


def test_retinaface_int8_quant_close_to_exact(rng):
    """The int8 serving path (QConv/int8_conv) shares the exact path's
    variable tree and stays within quantization tolerance of it on both
    backbones. Conf is softmaxed (bounded) -> tight atol; loc/landms are
    regression offsets -> relative band."""
    x = jnp.asarray(rng.normal(size=(2, 96, 80, 3)).astype(np.float32) * 20)
    for backbone in ("resnet50", "mobilenet0.25"):
        base = RetinaFace(backbone=backbone, dtype=jnp.float32)
        variables = base.init(jax.random.PRNGKey(2), x)
        # calibrate BN running stats to the actual activation distribution
        # (a raw random init leaves mean=0/var=1 stats wildly off, which
        # makes per-tensor activation scales outlier-dominated — trained
        # checkpoints don't look like that)
        for i in range(8):
            xc = jnp.asarray(
                rng.normal(size=(2, 96, 80, 3)).astype(np.float32) * 20
            )
            _, upd = base.apply(variables, xc, True, mutable=["batch_stats"])
            variables = {"params": variables["params"],
                         "batch_stats": upd["batch_stats"]}
        loc, conf, landms = jax.jit(base.apply)(variables, x)
        q = RetinaFace(backbone=backbone, dtype=jnp.float32, quant=True)
        # same checkpoint tree: quant init's params/batch_stats must match
        # the exact path exactly (act_scales is an extra, optional collection)
        qv = q.init(jax.random.PRNGKey(2), x)
        for coll in ("params", "batch_stats"):
            assert jax.tree.structure(qv[coll]) == jax.tree.structure(
                variables[coll]
            ), coll
        loc2, conf2, landms2 = jax.jit(q.apply)(variables, x)
        # bounds calibrated to the measured drift of a BN-calibrated random
        # net (conf max 0.046, loc mean/rms 0.21): catches catastrophic
        # breakage (wrong scales drift ~1.0); trained-net detection quality
        # is gated separately in test_detection_training.py
        assert float(jnp.max(jnp.abs(conf2 - conf))) < 0.10
        loc_rms = float(jnp.std(loc)) + 1e-6
        assert float(jnp.mean(jnp.abs(loc2 - loc))) / loc_rms < 0.35
        lm_rms = float(jnp.std(landms)) + 1e-6
        assert float(jnp.mean(jnp.abs(landms2 - landms))) / lm_rms < 0.35
        # static calibrated scales (the serving path) stay in the same band
        _, upd = q.apply(variables, x, mutable=["act_scales"])
        qv_cal = {**variables, "act_scales": upd["act_scales"]}
        loc3, conf3, landms3 = jax.jit(q.apply)(qv_cal, x)
        assert float(jnp.max(jnp.abs(conf3 - conf))) < 0.10
        assert float(jnp.mean(jnp.abs(loc3 - loc))) / loc_rms < 0.35
        assert float(jnp.mean(jnp.abs(landms3 - landms))) / lm_rms < 0.35


def test_detect_stage_refines_scales_on_first_real_batch(rng):
    """DetectStage(quant='int8') seeds act_scales on noise at construction
    and refines them (running max) from the FIRST dispatched real wire; the
    refinement happens exactly once."""
    from avcer_tpu.core.checkpoint import init_variables
    from avcer_tpu.core.config import DetectorConfig
    from avcer_tpu.pipeline.detect import DetectStage

    model = RetinaFace(backbone="mobilenet0.25", dtype=jnp.float32)
    variables = init_variables(model, (jnp.zeros((1, 64, 64, 3), jnp.float32),))
    cfg = DetectorConfig(
        long_side=64, batch_size=2, backbone="mobilenet0.25", quant="int8",
        transfer_format="bgr", dtype="float32",
    )
    stage = DetectStage(cfg, variables, dtype=jnp.float32)
    assert not stage._real_calibrated
    seed = jax.tree.map(np.asarray, stage.variables["act_scales"])
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    packed, scale, _ = stage.dispatch(frames)
    assert stage._real_calibrated
    refined = jax.tree.map(np.asarray, stage.variables["act_scales"])
    # running max: refined scales never shrink below the seed
    for s0, s1 in zip(jax.tree.leaves(seed), jax.tree.leaves(refined)):
        assert s1 >= s0
    assert np.isfinite(np.asarray(packed)).all()
    v0 = refined
    stage.dispatch(frames)  # second dispatch must not recalibrate
    v1 = jax.tree.map(np.asarray, stage.variables["act_scales"])
    for s0, s1 in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert s0 == s1


def test_retinaface_s2d_stem_same_outputs(rng):
    """Full detector outputs match between stem implementations with shared
    variables (the conversion/param tree is unchanged by s2d_stem)."""
    x = jnp.asarray(rng.normal(size=(1, 96, 80, 3)).astype(np.float32) * 20)
    base = RetinaFace(backbone="resnet50", dtype=jnp.float32)
    variables = base.init(jax.random.PRNGKey(1), x)
    loc, conf, landms = jax.jit(base.apply)(variables, x)
    s2d = RetinaFace(backbone="resnet50", dtype=jnp.float32, s2d_stem=True)
    loc2, conf2, landms2 = jax.jit(s2d.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(loc2), np.asarray(loc), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(conf2), np.asarray(conf), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(landms2), np.asarray(landms), atol=1e-4, rtol=1e-4)


def test_int8_ops_ste_gradients(rng):
    """Differentiating through int8_matmul/int8_conv yields the EXACT op's
    gradient via the straight-through estimator (ADVICE r2: round/int8-cast
    otherwise carry zero gradient, so a quant=True model built inside the
    Trainer would silently train nothing)."""
    from avcer_tpu.models.layers import int8_conv, int8_matmul

    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))

    gq = jax.grad(lambda w_: jnp.sum(int8_matmul(x, w_, out_dtype=jnp.float32) * c))(w)
    ge = jax.grad(lambda w_: jnp.sum((x @ w_) * c))(w)
    assert float(jnp.max(jnp.abs(gq))) > 0
    np.testing.assert_allclose(np.asarray(gq), np.asarray(ge), rtol=1e-5, atol=1e-5)
    # gradient w.r.t. the activation too (upstream layers must keep training)
    gxq = jax.grad(lambda x_: jnp.sum(int8_matmul(x_, w, out_dtype=jnp.float32) * c))(x)
    gxe = jax.grad(lambda x_: jnp.sum((x_ @ w) * c))(x)
    np.testing.assert_allclose(np.asarray(gxq), np.asarray(gxe), rtol=1e-5, atol=1e-5)

    xc = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    cc = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))

    def q_loss(k_):
        y = int8_conv(xc, k_, strides=(1, 1), padding="SAME", out_dtype=jnp.float32)
        return jnp.sum(y * cc)

    def e_loss(k_):
        y = jax.lax.conv_general_dilated(
            xc, k_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y * cc)

    gq = jax.grad(q_loss)(k)
    ge = jax.grad(e_loss)(k)
    assert float(jnp.max(jnp.abs(gq))) > 0
    np.testing.assert_allclose(np.asarray(gq), np.asarray(ge), rtol=1e-4, atol=1e-4)
