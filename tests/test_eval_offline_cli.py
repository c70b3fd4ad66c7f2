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


def write_reference_tree(root, rng, n_videos=3, frames=40,
                         model_name="FLW-ExprModelV3-2024.03.02-11.42.11",
                         audio_folder="audio_mean_0.5"):
    """Synthetic caches arranged in the REFERENCE's directory layout
    (get_pred_av.py:77-137, get_pred_audio.py:265-312):
    <preds>/video/{static,dynamic}__NAME.csv and
    <preds>/<audio_folder>/<model_name>/NAME.csv."""
    ann = root / "ann"
    preds_v = root / "preds" / "video"
    preds_a = root / "preds" / audio_folder / model_name
    for d in (ann, preds_v, preds_a):
        os.makedirs(d, exist_ok=True)
    emo_v = list(registry.VIDEO_EMOTIONS)
    emo_a = list(registry.AUDIO_EMOTIONS_8)
    names = []
    for i in range(n_videos):
        name = f"vid{i}"
        names.append(name)
        labels = rng.integers(0, 7, frames)
        labels[1] = 7  # 'Other' row: dropped by the -1/7 filter
        pd.DataFrame({"Neutral": labels}).to_csv(ann / f"{name}.csv", index=False)
        onehot = np.eye(7)[labels.clip(0, 6)] * 2 + rng.random((frames, 7))
        stat = onehot / onehot.sum(1, keepdims=True)
        sdf = pd.DataFrame(index=range(frames))
        for j, emo in enumerate(registry.AUDIO_EMOTIONS_7):
            sdf[emo] = stat[:, j]
        sdf[emo_v].to_csv(preds_v / f"static__{name}.csv", index=False)
        pd.DataFrame(rng.normal(size=(frames, 7)), columns=emo_v).to_csv(
            preds_v / f"dynamic__{name}.csv", index=False
        )
        rows = np.repeat(rng.normal(size=(6, 8)), frames // 6 + 1, axis=0)[:frames]
        adf = pd.DataFrame(rows, columns=emo_a)
        adf["frames"] = [str(t).zfill(6) + ".jpg" for t in range(frames)]
        adf.to_csv(preds_a / f"{name}.csv", index=False)
    return names


def test_eval_offline_reference_layout(tmp_path, rng, capsys):
    """--layout reference consumes the reference's actual ABAW cache tree."""
    from avcer_tpu.cli.eval_offline import main

    write_reference_tree(tmp_path, rng)
    rc = main([
        "--ann_root", str(tmp_path / "ann"),
        "--preds_root", str(tmp_path / "preds"),
        "--save_root", str(tmp_path / "report"),
        "--layout", "reference",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["uar_av"] > 0.4  # informative static stream


def test_eval_offline_afew_layout(tmp_path, rng, capsys):
    """AFEW per-video alignment (get_pred_av.py:140-195): global data csv,
    one frame-averaged sample per clip."""
    from avcer_tpu.cli.eval_offline import main
    from avcer_tpu.fusion import offline_eval

    write_reference_tree(tmp_path, rng, n_videos=4)
    emos = ["Angry", "Happy", "Neutral", "Sad"]
    pd.DataFrame({
        "name_video": [f"vid{i}.avi" for i in range(4)],
        "emotion": emos,
    }).to_csv(tmp_path / "AFEW_data.csv", index=False)
    aligned = offline_eval.read_afew_tree(
        str(tmp_path / "AFEW_data.csv"), str(tmp_path / "preds"),
        ["video", "audio_mean_0.5", "FLW-ExprModelV3-2024.03.02-11.42.11"],
    )
    assert aligned.trues.tolist() == [
        offline_eval.AFEW_EMOTION_TO_CLASS[e] for e in emos
    ]
    assert aligned.stat.shape == (4, 7)
    np.testing.assert_allclose(aligned.dyn.sum(1), 1.0, atol=1e-6)

    rc = main([
        "--ann_root", str(tmp_path / "ann"),
        "--preds_root", str(tmp_path / "preds"),
        "--save_root", str(tmp_path / "report"),
        "--layout", "reference",
        "--afew_data", str(tmp_path / "AFEW_data.csv"),
        "--corpus", "AFEW",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 <= res["uar_av"] <= 1


def test_eval_offline_audio_sweep_tree(tmp_path, rng, capsys):
    """get_pred_audio.py:265-312 sweep over audio_{padding}_{step}/<model>
    folders, audio-only metrics per combination."""
    from avcer_tpu.cli.eval_offline import main

    model = "7cl-FLW-ExprModelV2-2024.03.04-11.52.11"
    for folder in ("audio_mean_0.5", "audio_repeat_2"):
        write_reference_tree(tmp_path, rng, audio_folder=folder,
                             model_name=model)
    rc = main([
        "--ann_root", str(tmp_path / "ann"),
        "--preds_root", str(tmp_path / "preds"),
        "--audio_sweep_root", str(tmp_path / "preds"),
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res) == {f"audio_mean_0.5/{model}", f"audio_repeat_2/{model}"}
    for v in res.values():
        assert 0 <= v["uar_a"] <= 1
