"""Detector training codec + synthetic bucket-quality harness tests."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from avcer_tpu.ops import boxes as box_ops
from avcer_tpu.train import detection

import reference_loader


def test_match_encode_parity_vs_reference(rng):
    """match_anchors/encode_boxes_np vs the REAL box_utils.match
    (/root/reference/.../box_utils.py:96-178) on random ground truths."""
    reference_loader.install_torchvision_stub()  # package __init__ chain
    reference_loader.add_reference_paths()
    from ibug.face_detection.retina_face.box_utils import match as ref_match

    priors = box_ops.prior_boxes((64, 80))
    a = priors.shape[0]
    for trial in range(5):
        n = int(rng.integers(1, 5))
        cxy = rng.uniform(0.1, 0.9, (n, 2))
        wh = rng.uniform(0.05, 0.4, (n, 2))
        truths = np.concatenate(
            [cxy - wh / 2, cxy + wh / 2], axis=1
        ).clip(0, 1).astype(np.float32)

        loc_t = torch.zeros(1, a, 4)
        conf_t = torch.zeros(1, a, dtype=torch.long)
        landm_t = torch.zeros(1, a, 10)
        ref_match(
            0.35, torch.from_numpy(truths), torch.from_numpy(priors),
            [0.1, 0.2], torch.ones(n, dtype=torch.long),
            torch.zeros(n, 10), loc_t, conf_t, landm_t, 0,
        )
        got_loc, got_conf = detection.match_anchors(truths, priors, 0.35)
        np.testing.assert_array_equal(got_conf, conf_t[0].numpy())
        # loc targets only matter on positive anchors (loss masks the rest)
        pos = got_conf > 0
        np.testing.assert_allclose(
            got_loc[pos], loc_t[0].numpy()[pos], atol=1e-5
        )
        assert pos.sum() > 0, "fixture produced no positive anchors"


def test_multibox_loss_mining_shape(rng):
    b, a = 2, 200
    loc_pred = jnp.asarray(rng.normal(size=(b, a, 4)).astype(np.float32))
    conf = jnp.asarray(rng.normal(size=(b, a, 2)).astype(np.float32))
    loc_t = jnp.asarray(rng.normal(size=(b, a, 4)).astype(np.float32))
    conf_t = np.zeros((b, a), np.int32)
    conf_t[:, :5] = 1
    loss = detection.multibox_loss(loc_pred, conf, loc_t, jnp.asarray(conf_t))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect predictions -> loss collapses toward the mined-negative floor
    good_conf = np.full((b, a, 2), [5.0, -5.0], np.float32)
    good_conf[:, :5] = [-5.0, 5.0]
    loss2 = detection.multibox_loss(
        loc_t, jnp.asarray(good_conf), loc_t, jnp.asarray(conf_t)
    )
    assert float(loss2) < 0.01 * float(loss)


@pytest.mark.slow
def test_synthetic_detector_learns_and_bucket_recall(tmp_path):
    """Mini bucket-quality study: a briefly trained detector finds synthetic
    faces; downscaling to a smaller bucket loses the small faces first
    (the architecture-level native-vs-bucket drift)."""
    variables, losses = detection.train_synthetic_detector(
        steps=140, image_size=128, batch=4, face_size_range=(14, 80)
    )
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])

    res = detection.evaluate_bucket_recall(
        variables, scene_hw=(256, 320), buckets=[0, 160],
        size_bins=[16, 48, 96], n_scenes=6, threshold=0.4,
    )
    # native: the detector works on mid/large faces
    assert res[0][48]["recall"] >= 0.5
    assert res[0][96]["recall"] >= 0.5
    # the halved bucket keeps large faces but hurts the 16 px ones
    # (16 px * 0.5 = 8 px, below the stride-8 anchor band)
    assert res[160][96]["recall"] >= 0.5
    assert res[160][16]["recall"] <= res[0][16]["recall"]

    # int8 serving path: detection quality of the TRAINED detector holds
    # (this is the real quality gate for DetectorConfig.quant — the unit
    # drift bounds in test_model_parity.py only catch gross breakage)
    res_q = detection.evaluate_bucket_recall(
        variables, scene_hw=(256, 320), buckets=[0],
        size_bins=[16, 48, 96], n_scenes=6, threshold=0.4, quant="int8",
    )
    for s in (48, 96):
        assert res_q[0][s]["recall"] >= res[0][s]["recall"] - 0.2, (s, res_q)
        if res_q[0][s]["recall"] > 0:
            assert res_q[0][s]["mean_iou"] >= res[0][s]["mean_iou"] - 0.1
