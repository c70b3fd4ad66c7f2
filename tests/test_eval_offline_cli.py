"""End-to-end test of the offline evaluation CLI over synthetic prediction
caches in the pipeline's CSV formats (get_pred_av.py capability)."""

import json
import os

import numpy as np
import pandas as pd

from avcer_tpu.core import registry


def write_caches(root, rng, n_videos=3, frames=40):
    ann = root / "ann"
    preds_v = root / "preds" / "video"
    preds_a = root / "preds" / "audio"
    for d in (ann, preds_v, preds_a):
        os.makedirs(d, exist_ok=True)
    emo_v = list(registry.VIDEO_EMOTIONS)
    emo_a = list(registry.AUDIO_EMOTIONS_8)
    for i in range(n_videos):
        name = f"vid{i}"
        labels = rng.integers(0, 7, frames)
        labels[0] = -1  # dropped row
        pd.DataFrame({"Neutral": labels}).to_csv(ann / f"{name}.csv", index=False)
        # static: probabilities in video order; make them informative
        onehot = np.eye(7)[labels.clip(0)] * 2 + rng.random((frames, 7))
        stat = onehot / onehot.sum(1, keepdims=True)
        # static CSV columns are video-order names; values indexed in fusion
        # order when read back — write a frame whose fusion-order values are
        # stat by assigning via column names
        sdf = pd.DataFrame(index=range(frames))
        for j, emo in enumerate(registry.AUDIO_EMOTIONS_7):
            sdf[emo] = stat[:, j]
        sdf = sdf[emo_v]  # reorder columns to video order like the pipeline
        sdf.to_csv(preds_v / f"static__{name}.csv", index=False)
        pd.DataFrame(rng.normal(size=(frames, 7)), columns=emo_v).to_csv(
            preds_v / f"dynamic__{name}.csv", index=False
        )
        # audio CSV: window rows replicated per frame name + frames column
        w = 6
        rows = np.repeat(rng.normal(size=(w, 8)), frames // w + 1, axis=0)[:frames]
        adf = pd.DataFrame(rows, columns=emo_a)
        adf["frames"] = [str(t).zfill(6) + ".jpg" for t in range(frames)]
        adf.to_csv(preds_a / f"{name}.csv", index=False)


def test_eval_offline_cli_end_to_end(tmp_path, rng, capsys):
    from avcer_tpu.cli.eval_offline import main

    write_caches(tmp_path, rng)
    rc = main([
        "--ann_root", str(tmp_path / "ann"),
        "--preds_root", str(tmp_path / "preds"),
        "--save_root", str(tmp_path / "report"),
        "--optimize_weights", "--num_dirichlet", "50",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [json.loads(line) for line in out.strip().splitlines() if line.startswith("{")]
    res = lines[-1]
    assert 0 <= res["uar_av"] <= 1
    # static stream is strongly informative -> fused UAR clearly above chance
    assert res["uar_av"] > 0.4
    assert os.path.exists(tmp_path / "report" / "confusion_matrices")
    assert os.path.exists(tmp_path / "report" / "metrics_dicts")
