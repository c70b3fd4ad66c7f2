"""Prior-box, decode, and NMS parity vs direct statements of the reference
algorithms (.../retina_face/prior_box.py, box_utils.py, py_cpu_nms.py)."""

import math
from itertools import product

import numpy as np
import jax.numpy as jnp

from avcer_tpu.ops import boxes as box_ops
from avcer_tpu.ops import nms as nms_ops


def reference_priors(h, w):
    """Direct loop transliteration of prior_box.py:16-33 (the spec)."""
    min_sizes = [[16, 32], [64, 128], [256, 512]]
    steps = [8, 16, 32]
    fmaps = [[math.ceil(h / s), math.ceil(w / s)] for s in steps]
    anchors = []
    for k, f in enumerate(fmaps):
        for i, j in product(range(f[0]), range(f[1])):
            for m in min_sizes[k]:
                anchors.append(
                    [(j + 0.5) * steps[k] / w, (i + 0.5) * steps[k] / h, m / w, m / h]
                )
    return np.asarray(anchors, dtype=np.float32)


def reference_greedy_nms(dets, thresh):
    """Spec: py_cpu_nms.py greedy loop (dets already score-sorted desc)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.arange(len(dets))
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        wdt = np.maximum(0.0, xx2 - xx1 + 1)
        hgt = np.maximum(0.0, yy2 - yy1 + 1)
        inter = wdt * hgt
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


def test_priors_match_reference_order_and_values():
    for hw in [(360, 640), (224, 224), (263, 517)]:
        got = box_ops.prior_boxes(hw)
        want = reference_priors(*hw)
        assert got.shape == want.shape == (box_ops.num_anchors(hw), 4)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_decode_boxes_and_landmarks(rng):
    priors = box_ops.prior_boxes((120, 160))
    loc = rng.normal(size=priors.shape).astype(np.float32) * 0.3
    got = np.asarray(box_ops.decode_boxes(jnp.asarray(loc), jnp.asarray(priors)))
    centers = priors[:, :2] + loc[:, :2] * 0.1 * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * 0.2)
    want = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    pre = rng.normal(size=(priors.shape[0], 10)).astype(np.float32) * 0.3
    gotl = np.asarray(box_ops.decode_landmarks(jnp.asarray(pre), jnp.asarray(priors)))
    wantl = np.concatenate(
        [priors[:, :2] + pre[:, 2 * i : 2 * i + 2] * 0.1 * priors[:, 2:] for i in range(5)],
        axis=1,
    )
    np.testing.assert_allclose(gotl, wantl, rtol=2e-5, atol=1e-6)


def random_dets(rng, n, spread=200.0):
    cx = rng.uniform(0, spread, n)
    cy = rng.uniform(0, spread, n)
    w = rng.uniform(5, 80, n)
    h = rng.uniform(5, 80, n)
    scores = rng.uniform(0.8, 1.0, n)
    dets = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, scores], axis=1)
    return dets[np.argsort(-scores)].astype(np.float32)


def test_nms_mask_matches_reference_greedy(rng):
    for trial in range(20):
        n = int(rng.integers(1, 40))
        dets = random_dets(rng, n)
        want_keep = set(reference_greedy_nms(dets, 0.4))
        k = 64
        boxes = np.zeros((1, k, 4), np.float32)
        valid = np.zeros((1, k), bool)
        boxes[0, :n] = dets[:, :4]
        valid[0, :n] = True
        keep = np.asarray(nms_ops.nms_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.4))
        got_keep = set(np.nonzero(keep[0])[0].tolist())
        assert got_keep == want_keep, f"trial {trial}: {got_keep} != {want_keep}"


def test_batched_nms_threshold_and_sort(rng):
    a = 200
    boxes = np.tile(random_dets(rng, a)[:, :4], (2, 1, 1)).astype(np.float32)
    scores = np.concatenate(
        [rng.uniform(0.0, 1.0, (1, a)), rng.uniform(0.0, 0.5, (1, a))]
    ).astype(np.float32)
    b, s, keep = nms_ops.batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), k=64, score_thresh=0.8
    )
    s, keep = np.asarray(s), np.asarray(keep)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # sorted desc
    assert not keep[1].any()  # all below threshold
    assert np.all(s[keep] > 0.8)
