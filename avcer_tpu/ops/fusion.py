"""Fusion and compound-expression ops.

TPU-first restatement of the reference's fusion math:

- row softmax                     /root/reference/src/data/utils.py:125-127
- weighted probability fusion     /root/reference/src/run.py:108-114
- compound-expression op          /root/reference/src/data/utils.py:222-241
- per-modality + AV decisions     /root/reference/src/run.py:125-165

The reference computes these with Python loops over pandas frames; here the
whole decision for all T frames, M models, and K compound classes is one
fused jitted program (a couple of gathers + elementwise ops + argmax), so it
is O(T) VPU work with no host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core import registry


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically-shifted softmax matching data/utils.py:125-127."""
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def fuse_probabilities(
    preds: jax.Array,  # [M, T, C] per-model probabilities (fusion order)
    weights_1: jax.Array | None,  # [M, C] per-(model, emotion) weights
    weights_2: jax.Array | None,  # [M] scalar per-model weights
) -> jax.Array:
    """Weighted sum over models: out[t, c] = sum_m p[m,t,c] * w1[m,c] * w2[m].

    With ``weights_1 is None`` falls back to the plain mean
    (/root/reference/src/run.py:113-114).
    """
    if weights_1 is None:
        return jnp.mean(preds, axis=0)
    w = weights_1 * weights_2[:, None]  # [M, C]
    return jnp.einsum("mtc,mc->tc", preds, w)


def compound_probabilities(
    pred: jax.Array,  # [T, C>=7] basic-emotion probabilities, fusion order
    ce_weights_type: bool,
    ce_mask: bool,
) -> jax.Array:
    """Pair-wise compound-expression probabilities, shape [T, K].

    prob[t, k] = pred[t, i1_k] * w1_k + pred[t, i2_k] * w2_k with Rule 1
    (mask probs <= 1/7 to zero) and/or Rule 2 (pair-normalized prior weights)
    (/root/reference/src/data/utils.py:222-241). Static rule flags keep the
    jitted program branch-free.
    """
    i1, i2 = registry.compound_index_arrays()
    i1 = jnp.asarray(i1)
    i2 = jnp.asarray(i2)
    if ce_weights_type:
        w1_np, w2_np = registry.rule2_pair_weights()
        w1 = jnp.asarray(w1_np, dtype=pred.dtype)
        w2 = jnp.asarray(w2_np, dtype=pred.dtype)
    else:
        k = len(registry.COMPOUND_NAMES)
        w1 = jnp.ones((k,), dtype=pred.dtype)
        w2 = jnp.ones((k,), dtype=pred.dtype)
    if ce_mask:
        pred = jnp.where(pred > registry.RULE1_MASK_THRESHOLD, pred, 0.0)
    return pred[:, i1] * w1[None, :] + pred[:, i2] * w2[None, :]


@functools.partial(
    jax.jit, static_argnames=("ce_weights_type", "ce_mask", "use_weights")
)
def fused_compound_decision(
    stat: jax.Array,  # [T, 7] static visual probs (already softmaxed)
    dyn_logits: jax.Array,  # [T, 7] dynamic visual raw logits
    audio_logits: jax.Array,  # [T, 7] per-frame audio logits (already averaged)
    weights_1: jax.Array,  # [3, 7]
    weights_2: jax.Array,  # [3]
    ce_weights_type: bool = False,
    ce_mask: bool = True,
    use_weights: bool = True,
) -> dict[str, jax.Array]:
    """The whole decision stage of run.py:104-165 as one jitted program.

    Inputs are in fusion (audio) order. Returns per-modality and AV compound
    class ids [T] plus the AV compound probabilities [T, K].
    """
    dyn = softmax(dyn_logits)
    aud = softmax(audio_logits)
    preds = jnp.stack([stat, dyn, aud])  # [3, T, 7]

    if use_weights:
        scaled = preds * (weights_1 * weights_2[:, None])[:, None, :]
        fused = jnp.sum(scaled, axis=0)
    else:
        scaled = preds
        fused = jnp.mean(preds, axis=0)

    def decide(p: jax.Array) -> tuple[jax.Array, jax.Array]:
        prob = compound_probabilities(p, ce_weights_type, ce_mask)
        return jnp.argmax(prob[:, :7], axis=1), prob

    av_ce, av_prob = decide(fused)
    vs_ce, _ = decide(scaled[0])
    vd_ce, _ = decide(scaled[1])
    a_ce, _ = decide(scaled[2])
    return {
        "av": av_ce,
        "vs": vs_ce,
        "vd": vd_ce,
        "a": a_ce,
        "av_prob": av_prob,
    }


def reorder_video_to_fusion(probs_video_order: jax.Array) -> jax.Array:
    """Gather video-model columns into fusion order — the explicit version of
    the reference's pandas column-name reindexing (/root/reference/src/run.py:85-87).
    """
    perm = jnp.asarray(np.asarray(registry.VIDEO_TO_FUSION))
    return probs_video_order[..., perm]


def segment_mean_by_frame(
    window_probs: jax.Array,  # [W, C] one row per audio window
    frame_ids: jax.Array,  # [R] int frame id of each replicated row
    window_of_row: jax.Array,  # [R] int window index of each replicated row
    num_frames: int,
) -> jax.Array:
    """Average overlapping audio-window probabilities per frame.

    The reference replicates each window's prob row once per covered frame
    name and later does ``groupby("frames").mean()``
    (/root/reference/src/get_prob_audio_8_cl.py:94-101, run.py:90).
    Here that is a segment-sum over a static frame count.
    """
    rows = window_probs[window_of_row]  # [R, C]
    sums = jax.ops.segment_sum(rows, frame_ids, num_segments=num_frames)
    counts = jax.ops.segment_sum(
        jnp.ones((frame_ids.shape[0],), rows.dtype), frame_ids, num_segments=num_frames
    )
    return sums / jnp.maximum(counts, 1.0)[:, None]
