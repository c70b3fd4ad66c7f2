"""Fusion/compound op parity vs an independent numpy statement of the
reference math (/root/reference/src/run.py:104-165, data/utils.py:222-241)."""

import numpy as np
import jax.numpy as jnp

from avcer_tpu.core import registry
from avcer_tpu.ops import fusion


def np_softmax(m):
    e = np.exp(m - m.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def np_compound(pred, ce_weights_type, ce_mask):
    """Ground truth: direct per-pair loop as specified by data/utils.py:222-241."""
    pred = np.asarray(pred, dtype=np.float64)
    pairs = list(registry.COMPOUND_PAIRS.values())
    prob = np.zeros((len(pred), len(pairs)))
    dw = registry.EMOTION_PRIOR_WEIGHTS
    if ce_mask:
        pred = np.where(pred > 1 / 7, pred, 0)
    for idx, (i1, i2) in enumerate(pairs):
        if ce_weights_type:
            s = dw[i1] + dw[i2]
            w1, w2 = dw[i1] / s, dw[i2] / s
        else:
            w1 = w2 = 1.0
        prob[:, idx] = pred[:, i1] * w1 + pred[:, i2] * w2
    return prob


def test_softmax_matches_numpy(rng):
    x = rng.normal(size=(13, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fusion.softmax(jnp.asarray(x))), np_softmax(x), rtol=1e-6
    )


def test_compound_probabilities_all_rule_combos(rng):
    pred = np_softmax(rng.normal(size=(31, 7)).astype(np.float64))
    for wt in (False, True):
        for mask in (False, True):
            got = np.asarray(
                fusion.compound_probabilities(jnp.asarray(pred), wt, mask)
            )
            np.testing.assert_allclose(got, np_compound(pred, wt, mask), rtol=1e-6)


def test_fuse_probabilities_weighted_and_mean(rng):
    preds = rng.random((3, 11, 7))
    w1 = rng.random((3, 7))
    w2 = np.array([1.0, 1.0, 1.0])
    want = sum(preds[m] * w1[m] * w2[m] for m in range(3))
    got = np.asarray(
        fusion.fuse_probabilities(jnp.asarray(preds), jnp.asarray(w1), jnp.asarray(w2))
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fusion.fuse_probabilities(jnp.asarray(preds), None, None)),
        preds.mean(axis=0),
        rtol=1e-6,
    )


def test_fused_compound_decision_end_to_end(rng):
    """Whole decision stage vs step-by-step numpy replication of run.py:104-165."""
    t = 23
    stat = np_softmax(rng.normal(size=(t, 7)))
    dyn_logits = rng.normal(size=(t, 7))
    audio_logits = rng.normal(size=(t, 7))
    w1 = registry.AV_WEIGHTS_8CL
    w2 = np.ones(3)

    preds = [stat, np_softmax(dyn_logits), np_softmax(audio_logits)]
    fused = sum(preds[m] * w1[m] * w2[m] for m in range(3))
    for wt, mask in [(False, True), (True, False)]:
        want_av = np.argmax(np_compound(fused, wt, mask)[:, :7], axis=1)
        want_vs = np.argmax(np_compound(preds[0] * w1[0] * w2[0], wt, mask)[:, :7], axis=1)
        want_a = np.argmax(np_compound(preds[2] * w1[2] * w2[2], wt, mask)[:, :7], axis=1)

        out = fusion.fused_compound_decision(
            jnp.asarray(stat),
            jnp.asarray(dyn_logits),
            jnp.asarray(audio_logits),
            jnp.asarray(w1),
            jnp.asarray(w2),
            ce_weights_type=wt,
            ce_mask=mask,
        )
        np.testing.assert_array_equal(np.asarray(out["av"]), want_av)
        np.testing.assert_array_equal(np.asarray(out["vs"]), want_vs)
        np.testing.assert_array_equal(np.asarray(out["a"]), want_a)


def test_reorder_video_to_fusion():
    row = np.arange(7, dtype=np.float32)[None, :]  # video order identity
    got = np.asarray(fusion.reorder_video_to_fusion(jnp.asarray(row)))[0]
    # video order: Ne Ha Sa Su Fe Di An ; fusion order: Ne An Di Fe Ha Sa Su
    np.testing.assert_array_equal(got, [0, 6, 5, 4, 1, 2, 3])


def test_segment_mean_by_frame(rng):
    wprobs = rng.random((4, 8)).astype(np.float32)
    # windows cover frames with overlap: rows = (frame_id, window)
    rows = [(0, 0), (1, 0), (2, 0), (1, 1), (2, 1), (3, 1), (3, 2), (4, 3)]
    fid = np.array([r[0] for r in rows])
    wid = np.array([r[1] for r in rows])
    got = np.asarray(
        fusion.segment_mean_by_frame(
            jnp.asarray(wprobs), jnp.asarray(fid), jnp.asarray(wid), num_frames=5
        )
    )
    import pandas as pd

    df = pd.DataFrame(wprobs[wid])
    df["frames"] = fid
    want = df.groupby("frames").mean().values
    np.testing.assert_allclose(got, want, rtol=1e-5)
