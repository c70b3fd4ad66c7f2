"""Offline multi-corpus evaluation + weight optimization + submissions.

Capability parity with /root/reference/src/get_pred_{av,video,audio}.py:

- per-video prediction caches are CSVs in the formats the pipeline writes
  (static__*/dynamic__* in video order, audio CSVs in fusion order with a
  ``frames`` column)
- alignment semantics (get_pred_av.py:77-195): label rows with class -1/7
  drop; dynamic/audio logits softmax AFTER audio's frame groupby-mean; when
  a modality runs short of the labels, its last row forward-fills
- fused metrics: UAR/Acc/F1/precision + confusion matrix artifact +
  metrics pickle (get_pred_av.py:19-74)
- weight optimization on the validation corpus: Dirichlet 10k draws + 3-way
  grid (get_pred_av.py:391-406 -> fusion.weight_search, vectorized on TPU)
- C-EXPR-DB challenge txts per rule combination (get_pred_av.py:198-334 ->
  fusion.compound)
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from avcer_tpu.core import registry
from avcer_tpu.train.metrics import confusion, reference_metrics
from avcer_tpu.ops import fusion as fusion_ops


def np_softmax(m: np.ndarray) -> np.ndarray:
    e = np.exp(m - m.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


@dataclass
class AlignedPredictions:
    trues: np.ndarray  # [N]
    stat: np.ndarray  # [N, 7] fusion order, probabilities
    dyn: np.ndarray  # [N, 7]
    audio: np.ndarray  # [N, 7]


def load_video_csvs(path_stat: str, path_dyn: str) -> tuple[np.ndarray, np.ndarray]:
    """Read static/dynamic CSVs (video-order columns) into fusion order."""
    import pandas as pd

    emo = list(registry.AUDIO_EMOTIONS_7)
    stat = pd.read_csv(path_stat)[emo].values
    dyn = pd.read_csv(path_dyn)[emo].values
    return stat, dyn


def load_audio_csv(path: str) -> np.ndarray:
    """Audio CSV -> per-frame mean logits (fusion order, first 7 cols)."""
    import pandas as pd

    df = pd.read_csv(path)
    df = df.groupby(["frames"]).mean().reset_index()
    return df[list(registry.AUDIO_EMOTIONS_7)].values


def align_video(
    labels: np.ndarray,  # per-frame int labels; -1/7 rows are dropped
    stat: np.ndarray,
    dyn: np.ndarray,
    audio_frame_logits: np.ndarray,
) -> AlignedPredictions:
    """get_pred_av.py:107-135 semantics for one video."""
    keep = ~np.isin(labels, (-1, 7))
    idx = np.nonzero(keep)[0]
    trues = labels[idx]

    def take(arr: np.ndarray, n_target: int) -> np.ndarray:
        rows = arr[idx[idx < len(arr)]]
        if len(rows) < n_target and len(rows) > 0:
            rows = np.vstack([rows, np.repeat(rows[-1:], n_target - len(rows), 0)])
        return rows

    n = len(trues)
    stat_a = take(stat, n)
    dyn_a = np_softmax(take(dyn, n))
    audio_a = np_softmax(take(audio_frame_logits[:, :7], n))
    return AlignedPredictions(trues=trues, stat=stat_a, dyn=dyn_a, audio=audio_a)


def evaluate_fusion(
    aligned: AlignedPredictions,
    weights_1: np.ndarray,  # [3, 7]
    weights_2: Sequence[float] = (1.0, 1.0, 1.0),
    corpus: str = "corpus",
    modality: str = "av",
    weight_type: str = "sd",
    save_root: Optional[str] = None,
) -> dict:
    """get_metrics equivalent: fused argmax -> UAR/Acc/F1/precision +
    optional confusion-matrix pdf + metrics pickle."""
    preds = [aligned.stat, aligned.dyn, aligned.audio]
    fused = sum(p * w1[None, :] * w2 for p, w1, w2 in zip(preds, weights_1, weights_2))
    pred_cls = fused.argmax(-1).astype(np.int32)
    u, a, f, p, m = reference_metrics(aligned.trues, pred_cls)
    out = {
        "uar_av": u, "acc_av": a, "f1_av": f, "precision_av": p, "mean_av": m,
        "weights_1_av": np.asarray(weights_1), "weights_2_av": list(weights_2),
    }
    if save_root:
        from avcer_tpu.utils import viz

        cm = confusion(aligned.trues, pred_cls, 7)
        cm_dir = os.path.join(save_root, "confusion_matrices")
        os.makedirs(cm_dir, exist_ok=True)
        viz.plot_conf_matrix(
            cm, list(registry.AUDIO_EMOTIONS_7),
            save_path=os.path.join(cm_dir, f"{corpus}_{modality}_sd_{weight_type}.pdf"),
            title=f"Audio-Video fusion. {corpus}. UAR = {u * 100:.2f}%",
        )
        md_dir = os.path.join(save_root, "metrics_dicts")
        os.makedirs(md_dir, exist_ok=True)
        with open(
            os.path.join(md_dir, f"{corpus}_metrics_dict_{modality}_{weight_type}.pickle"),
            "wb",
        ) as fh:
            pickle.dump(out, fh)
    return out


def compound_submission(
    stat: np.ndarray,
    dyn: np.ndarray,
    audio: np.ndarray,
    name_video: str,
    weights_1: np.ndarray,
    weights_2: Sequence[float],
    ce_weights_type: bool,
    ce_mask: bool,
    out_dir: str,
) -> str:
    """Per-rule challenge txt for one video (get_pred_av.py:198-334 pattern)."""
    import jax.numpy as jnp

    from avcer_tpu.fusion.compound import save_compound_txt

    out = fusion_ops.fused_compound_decision(
        jnp.asarray(stat), jnp.asarray(dyn), jnp.asarray(audio),
        jnp.asarray(weights_1, jnp.float32), jnp.asarray(list(weights_2), jnp.float32),
        ce_weights_type=ce_weights_type, ce_mask=ce_mask,
    )
    locations = [f"{name_video}/{str(f + 1).zfill(5)}.jpg" for f in range(len(stat))]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"C_EXPR_DB_av_{ce_weights_type}_{ce_mask}_{name_video}.txt"
    )
    save_compound_txt(path, locations, np.asarray(out["av"]))
    return path
