"""Clip-level compound-expression decision (get_c_expr_db_pred equivalent).

Behavior contract — /root/reference/src/run.py:25-189:

- frame naming ``{video}/{frame+1:05d}.jpg`` (:76-81)
- static rows used as-is; dynamic rows softmaxed (:85-88)
- audio rows: per-frame groupby-mean of replicated window rows, 0-based
  window frame ids mapped +1 (:90-97 via data/utils.py:244-247), rows beyond
  the video's frame count dropped (the ``isin`` filter), softmax AFTER the
  mean, tail forward-filled with the last audio row when the video outlives
  the audio (:99-103)
- fusion + Rule-1/Rule-2 compound probabilities + argmax over the 7 classes
  (:105-165) — executed as one jitted program (ops.fusion)
- the video-order -> fusion-order column gather replaces the reference's
  implicit pandas column selection (:85-87, SURVEY.md §2.7)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from avcer_tpu.core import registry
from avcer_tpu.core.config import FusionConfig
from avcer_tpu.ops import fusion as fusion_ops


@dataclass
class CompoundResult:
    av: np.ndarray  # [T] compound class ids
    vs: np.ndarray
    vd: np.ndarray
    a: np.ndarray
    av_prob: np.ndarray  # [T, K]
    image_locations: list[str]


def align_audio_to_frames(
    window_logits: np.ndarray,  # [W, C]
    frame_ids: np.ndarray,  # [R]
    window_of_row: np.ndarray,  # [R]
    num_frames: int,
) -> np.ndarray:
    """Per-frame audio logits [T, C]: groupby(frame).mean over replicated
    window rows, frames beyond audio coverage forward-filled with the last
    covered row (run.py:90-103)."""
    c = window_logits.shape[1]
    if window_logits.size == 0 or frame_ids.size == 0:
        return np.zeros((num_frames, c), np.float32)
    in_range = frame_ids < num_frames
    fids = frame_ids[in_range]
    rows = window_logits[window_of_row[in_range]]
    sums = np.zeros((num_frames, c), np.float64)
    counts = np.zeros(num_frames, np.float64)
    np.add.at(sums, fids, rows)
    np.add.at(counts, fids, 1.0)
    covered = counts > 0
    out = np.zeros((num_frames, c), np.float32)
    out[covered] = (sums[covered] / counts[covered, None]).astype(np.float32)
    # forward-fill the uncovered tail with the last covered row
    if covered.any() and not covered.all():
        last = np.max(np.nonzero(covered)[0])
        out[last + 1 :] = out[last]
    return out


def decide(
    stat_video_order: np.ndarray,  # [T, 7] softmax probs, video order
    dyn_logits_video_order: np.ndarray,  # [T, 7] raw logits, video order
    audio_frame_logits: np.ndarray,  # [T, C>=7] raw logits, fusion order
    name_video: str,
    cfg: FusionConfig,
) -> CompoundResult:
    t = stat_video_order.shape[0]
    perm = np.asarray(registry.VIDEO_TO_FUSION)
    stat = stat_video_order[:, perm]
    dyn = dyn_logits_video_order[:, perm]
    audio = audio_frame_logits[:, :7]

    if cfg.use_published_weights:
        w1 = jnp.asarray(registry.AV_WEIGHTS_8CL, jnp.float32)
    else:
        w1 = jnp.ones((3, 7), jnp.float32)
    w2 = jnp.asarray(cfg.model_weights, jnp.float32)

    out = fusion_ops.fused_compound_decision(
        jnp.asarray(stat, jnp.float32),
        jnp.asarray(dyn, jnp.float32),
        jnp.asarray(audio, jnp.float32),
        w1,
        w2,
        ce_weights_type=cfg.ce_weights_type,
        ce_mask=cfg.ce_mask,
        use_weights=cfg.use_published_weights,
    )
    locations = [f"{name_video}/{str(f + 1).zfill(5)}.jpg" for f in range(t)]
    return CompoundResult(
        av=np.asarray(out["av"]),
        vs=np.asarray(out["vs"]),
        vd=np.asarray(out["vd"]),
        a=np.asarray(out["a"]),
        av_prob=np.asarray(out["av_prob"]),
        image_locations=locations,
    )


def save_compound_txt(path: str, locations: list[str], labels: np.ndarray) -> None:
    """Challenge submission txt (run.py:167-188 + data/utils.py:212-219)."""
    lines = [",".join(registry.COMPOUND_TXT_COLUMNS)]
    lines += [f"{loc},{int(lab)}" for loc, lab in zip(locations, labels)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
