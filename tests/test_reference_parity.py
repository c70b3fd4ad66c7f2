"""Differential activation parity against the REAL reference modules
(/root/reference/src), not the builder-written twins (VERDICT round-1,
Missing #1).

Same converter path the published checkpoints would take: build the real
torch class, randomize its state (weights + BN running stats), convert the
state_dict with avcer_tpu.core.convert, and compare activations in fp32.

The only non-reference code in the loop is the minimal torchvision stub
(tests/reference_loader.py) the resnet50 RetinaFace needs — torchvision is
not installed here; the stub replicates torchvision's resnet50 naming and
IntermediateLayerGetter semantics, which are exactly the converter contract
for Resnet50_Final.pth.
"""

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

import reference_loader
from test_model_parity import randomize_state

torch.manual_seed(0)


def test_real_emotion_resnet50_parity(rng):
    """/root/reference/src/architectures/video.py:94-166 (ResNet50 +
    extract_features) vs models.emotion_resnet. Exercises the TF-style BN
    (eps 1e-3) and Conv2dSame asymmetric padding on a non-square input."""
    ref_video, _ = reference_loader.load_reference_architectures()
    real = ref_video.ResNet50(num_classes=7, channels=3).eval()
    randomize_state(real)
    x = rng.normal(size=(2, 3, 96, 112)).astype(np.float32) * 3
    with torch.no_grad():
        want_logits = real(torch.from_numpy(x)).numpy()
        # the pipeline consumes relu(fc1): the fc1 forward-hook output gets
        # F.relu applied before the LSTM window (get_prob_video.py:115)
        want_feat = torch.relu(
            real.extract_features(torch.from_numpy(x))
        ).numpy()

    variables = convert.convert_emotion_resnet50(real.state_dict())
    model = EmotionResNet50(num_classes=7, dtype=jnp.float32)
    got_logits, got_feat = jax.jit(model.apply)(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_feat), want_feat, atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, atol=1e-3, rtol=1e-2)


def test_real_temporal_lstm_parity(rng):
    """video.py:169-185 LSTMPyTorch vs models.temporal_lstm (gate order)."""
    ref_video, _ = reference_loader.load_reference_architectures()
    real = ref_video.LSTMPyTorch().eval()
    randomize_state(real, scale=0.3)
    x = rng.normal(size=(3, 10, 512)).astype(np.float32)
    with torch.no_grad():
        want = real(torch.from_numpy(x)).numpy()
    variables = convert.convert_temporal_lstm(real.state_dict())
    got = jax.jit(TemporalLSTM(7, dtype=jnp.float32).apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_real_transformer_layer_parity(rng):
    """attention_layers.py:221-267 TransformerLayer (PE on Q/K/V, post-LN,
    residual-after-PE) vs models.attention.TransformerLayer."""
    _, ref_attn = reference_loader.load_reference_architectures()
    real = ref_attn.TransformerLayer(
        input_dim=64, num_heads=8, dropout=0.1, positional_encoding=True
    ).eval()
    randomize_state(real, scale=0.2)
    x = rng.normal(size=(2, 17, 64)).astype(np.float32)
    with torch.no_grad():
        want = real(
            key=torch.from_numpy(x), value=torch.from_numpy(x),
            query=torch.from_numpy(x),
        ).numpy()
    t = convert._Tree()
    convert._convert_transformer_layer(t, real.state_dict(), "", "tl")
    variables = {"params": t.params["tl"]}
    got = jax.jit(TransformerLayer(64, 8, dtype=jnp.float32).apply)(
        variables, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("variant,num_classes,num_layers", [
    ("v1", 8, 2), ("v3", 8, 4), ("v2", 7, 2),
])
def test_real_expr_model_parity(rng, variant, num_classes, num_layers):
    """audio_8_cl.py:18-190 / audio_7_cl.py ExprModelV{1,2,3} (real classes,
    real HF Wav2Vec2Model inside) vs models.audio_heads.ExprModel.

    num_layers is shrunk for CPU speed but must satisfy the real classes'
    unfreeze_last_n_blocks calls (V3 touches the last 4 encoder layers)."""
    mod = reference_loader.load_reference_audio_models(num_classes)
    import torch_twins as twins

    hf_cfg = twins.make_hf_wav2vec2(num_layers=num_layers).config
    cls = {"v1": mod.ExprModelV1, "v2": mod.ExprModelV2, "v3": mod.ExprModelV3}[variant]
    real = cls(hf_cfg).eval()
    randomize_state(real, scale=0.05)
    x = rng.normal(size=(2, 17000)).astype(np.float32)
    with torch.no_grad():
        want = real(torch.from_numpy(x)).numpy()

    variables = convert.convert_expr_model(
        real.state_dict(), variant=variant, num_layers=num_layers
    )
    model = ExprModel(
        variant=variant,
        num_classes=num_classes,
        wav2vec2_config=Wav2Vec2Config(num_layers=num_layers),
        dtype=jnp.float32,
    )
    got = jax.jit(model.apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("backbone,fused", [
    ("resnet50", False),
    # fused=True routes layer1 + whole layers 2-3 (stride-2 entries
    # included, "s2ds" blocks) through the Pallas fused chains (interpret
    # mode on CPU) — pins the kernels directly against the REAL reference
    # network on converted real-layout weights
    ("resnet50", True),
    ("mobilenet0.25", False),
])
def test_real_retinaface_parity(rng, backbone, fused):
    """retina_face.py:46-115 (real network; real retina_face_net FPN/SSH/
    MobileNetV1) vs models.retinaface. The mobilenet variant runs with zero
    stubbed code; the resnet50 variant uses the torchvision-naming stub."""
    ref_rf, ref_cfg = reference_loader.load_reference_retinaface()
    cfg = ref_cfg.cfg_re50 if backbone == "resnet50" else ref_cfg.cfg_mnet
    real = ref_rf.RetinaFace(cfg=cfg, phase="test").eval()
    randomize_state(real, scale=0.05)
    x = rng.normal(size=(1, 3, 96, 80)).astype(np.float32) * 20
    with torch.no_grad():
        want_loc, want_conf, want_landms = real(torch.from_numpy(x))

    variables = convert.convert_retinaface(real.state_dict(), backbone=backbone)
    model = RetinaFace(backbone=backbone, dtype=jnp.float32,
                       fused_layer1=fused, fused_tails=fused,
                       fused_entries=fused, fused_ssh=fused,
                       fused_fpn=fused)
    loc, conf, landms = jax.jit(model.apply)(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(loc), want_loc.numpy(), atol=1e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(conf), want_conf.numpy(), atol=1e-4, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(landms), want_landms.numpy(), atol=1e-3, rtol=1e-2
    )


def test_real_priorbox_parity(rng):
    """prior_box.py anchor order/values vs ops.boxes.prior_boxes."""
    ref_rf, ref_cfg = reference_loader.load_reference_retinaface()
    from ibug.face_detection.retina_face.prior_box import PriorBox

    from avcer_tpu.ops import boxes as box_ops

    for hw in [(96, 80), (360, 640), (250, 333)]:
        want = PriorBox(ref_cfg.cfg_re50, image_size=hw).forward().numpy()
        got = box_ops.prior_boxes(hw)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_real_decode_and_nms_parity(rng):
    """box_utils.decode/decode_landm + py_cpu_nms vs ops.boxes/ops.nms on
    random detections (the real greedy loop vs the fixed-K masked one)."""
    ref_rf, ref_cfg = reference_loader.load_reference_retinaface()
    from ibug.face_detection.retina_face.box_utils import decode, decode_landm
    from ibug.face_detection.retina_face.py_cpu_nms import py_cpu_nms

    from avcer_tpu.ops import boxes as box_ops
    from avcer_tpu.ops import nms as nms_ops

    priors = box_ops.prior_boxes((96, 80))
    a = priors.shape[0]
    loc = rng.normal(size=(a, 4)).astype(np.float32) * 0.3
    landms = rng.normal(size=(a, 10)).astype(np.float32) * 0.3
    # squared-uniform scores: ~11% of the 318 anchors land above 0.8 — inside
    # the fixed-K exactness precondition (<= 64 candidates above the final
    # threshold; ops/nms.py module docstring)
    scores = (rng.random(a) ** 2).astype(np.float32)

    want_boxes = decode(
        torch.from_numpy(loc), torch.from_numpy(priors), [0.1, 0.2]
    ).numpy() * np.array([80, 96, 80, 96], np.float32)
    want_landms = decode_landm(
        torch.from_numpy(landms), torch.from_numpy(priors), [0.1, 0.2]
    ).numpy() * np.tile(np.array([80, 96], np.float32), 5)

    got_boxes = np.asarray(
        box_ops.decode_boxes(jnp.asarray(loc), jnp.asarray(priors))
    ) * np.array([80, 96, 80, 96], np.float32)
    got_landms = np.asarray(
        box_ops.decode_landmarks(jnp.asarray(landms), jnp.asarray(priors))
    ) * np.tile(np.array([80, 96], np.float32), 5)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(got_landms, want_landms, atol=1e-3, rtol=1e-4)

    # NMS keep-set: the reference's EXACT postprocess order
    # (retina_face_predictor.py:85-109: conf_thresh 0.02 filter -> greedy
    # NMS over everything -> top 750 -> final >= 0.8) vs the fixed-K masked
    # NMS that only considers top-64 candidates above 0.8 — this is the
    # ops/nms.py exactness argument tested against the real loop.
    thresh = 0.8
    inds = np.where(scores > 0.02)[0]
    dets = np.hstack(
        [want_boxes[inds], scores[inds, None]]
    ).astype(np.float32)
    keep_ref = py_cpu_nms(dets, 0.4, 5000)
    ref_out = dets[keep_ref][:750]
    ref_out = ref_out[ref_out[:, 4] >= thresh]
    ref_kept = {tuple(np.round(r[:4], 3)) for r in ref_out}

    cb, cs, valid, idx = nms_ops.topk_candidates(
        jnp.asarray(want_boxes)[None], jnp.asarray(scores)[None], 64, thresh
    )
    # the reference keeps score >= thresh (strict > in topk_candidates is the
    # pipeline's final-threshold convention; equality has measure zero here)
    keep = np.asarray(nms_ops.nms_mask(cb, valid, 0.4))[0]
    got_kept = {
        tuple(np.round(np.asarray(cb)[0][i][:4], 3))
        for i in range(64)
        if keep[i]
    }
    assert got_kept == ref_kept
