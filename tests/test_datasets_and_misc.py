"""Tests for windowing, weight search, augmentations, rounding, alignment,
and preprocessing helpers."""

import numpy as np
import pytest

from avcer_tpu.fusion import weight_search
from avcer_tpu.fusion.offline_eval import align_video, evaluate_fusion, np_softmax
from avcer_tpu.train import augment
from avcer_tpu.train.data import windowing
from avcer_tpu.utils.rounding import round_math


# ---------------------------------------------------------------------------
# round_math (spec: common_utils.py:111-130)
# ---------------------------------------------------------------------------


def test_round_math():
    assert round_math(2.5) == 3
    assert round_math(2.4) == 2
    assert round_math(-2.5) == -3
    assert round_math(-2.4) == -2
    assert round_math(29.97) == 30
    assert round_math(0.0) == 0


# ---------------------------------------------------------------------------
# windowing (spec: abaw_expr_dataset.py parse_features)
# ---------------------------------------------------------------------------


def reference_parse(frames, exprs, frame_rate, shift_s, min_s, max_s, num_classes):
    """Direct simulation of parse_features' windowing loop (:140-181)."""
    r = round_math(frame_rate)
    shift, max_w, min_w = int(shift_s * r), int(max_s * r), int(min_s * r)
    timings = []
    # split consecutive
    seqs, cur = [], [0]
    for i in range(1, len(frames)):
        if frames[i] - frames[i - 1] > 1:
            seqs.append(cur)
            cur = []
        cur.append(i)
    seqs.append(cur)
    for seq in seqs:
        f = [frames[i] for i in seq]
        e = [exprs[i] for i in seq]
        if len(f) < min_w:
            continue
        for seg in range(0, len(f), shift):
            window = e[seg : seg + max_w]
            start = f[seg]
            end_idx = seg + len(window)
            end = f[end_idx - 1] if end_idx > len(f) - 1 else f[end_idx]
            if len(window) < min_w:
                window = e[-max_w:]
                start = f[max(0, len(f) - max_w)]
                end = f[-1]
            # python max(set(...), key=count) tie order is set-iteration; use
            # min label on ties like the implementation under test
            vals, counts = np.unique(window, return_counts=True)
            lab = int(vals[np.argmax(counts)])
            if lab > num_classes - 1:
                continue
            timings.append((start / r, end / r, start, end, lab))
    return set(timings)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_make_windows_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 400
    # frame ids with gaps
    ids = np.sort(rng.choice(np.arange(1, 600), size=n, replace=False))
    labels = rng.integers(0, 9, n)
    fr = [24.0, 25.0, 29.97, 30.0][seed % 4]
    got = windowing.make_windows("f.txt", ids, labels, fr, 2, 2, 4, 8)
    got_set = {(w.start_t, w.end_t, w.start_f, w.end_f, w.label) for w in got}
    want = reference_parse(ids.tolist(), labels.tolist(), fr, 2, 2, 4, 8)
    assert got_set == want


def test_filter_mouth_closed():
    fr = 30.0  # threshold runs >= 15 frames get dropped unless label/open
    n = 60
    ids = np.arange(1, n + 1)
    labels = np.zeros(n, int)
    labels[5] = -1
    mouth = np.ones(n, int)
    mouth[10:30] = 0  # 20-frame closed run -> dropped
    mouth[40:45] = 0  # 5-frame closed run -> kept
    keep = windowing.filter_mouth_closed(ids, labels, mouth, fr, 0.5)
    assert not keep[5]  # label -1
    assert not keep[10:30].any()
    assert keep[40:45].all()
    assert keep[0] and keep[59]


def test_windows_from_segments_sample_space():
    sr = 16000
    segs = [(0, 5 * sr), (6 * sr, 7 * sr)]  # 5 s speech, 1 s speech (dropped)
    ws = windowing.windows_from_segments("a.wav", segs, sr, label=3,
                                         shift_sec=2, min_sec=2, max_sec=4)
    assert all(w.label == 3 for w in ws)
    assert ws[0].start_f == 0 and ws[0].end_f == 4 * sr
    # tail window re-anchors to the segment end
    assert ws[-1].end_f == 5 * sr
    assert all(w.end_f - w.start_f >= 2 * sr for w in ws)
    # 1 s segment skipped entirely
    assert all(w.end_f <= 5 * sr for w in ws)


# ---------------------------------------------------------------------------
# weight search (spec: data/utils.py:138-209)
# ---------------------------------------------------------------------------


def test_search_dirichlet_finds_planted_optimum(rng):
    n, c = 300, 7
    labels = rng.integers(0, c, n)
    # model 0 is perfect, models 1..2 are noise: best weights favor model 0
    perfect = np.eye(c)[labels] + rng.normal(0, 0.01, (n, c))
    noise1 = rng.random((n, c))
    noise2 = rng.random((n, c))
    best_w, best_uar = weight_search.search_dirichlet(
        labels, [perfect, noise1, noise2], num_weights=200, seed=42
    )
    assert best_uar > 0.9
    assert best_w.shape == (3, c)
    # deterministic: same seed -> same result
    w2, u2 = weight_search.search_dirichlet(
        labels, [perfect, noise1, noise2], num_weights=200, seed=42
    )
    np.testing.assert_array_equal(best_w, w2)
    assert best_uar == u2


def test_search_grid(rng):
    n, c = 200, 7
    labels = rng.integers(0, c, n)
    perfect = np.eye(c)[labels]
    noise = rng.random((n, c))
    combo, metric = weight_search.search_grid(labels, [perfect, noise])
    assert metric > 0.9
    assert len(combo) == 2


def test_evaluate_candidates_matches_host_metric(rng):
    from avcer_tpu.train.metrics import fusion_metric
    import jax.numpy as jnp

    n, c, m = 150, 7, 3
    labels = rng.integers(0, c, n)
    preds = rng.random((m, n, c))
    w = rng.random((4, m, c))
    uar, f1, prec = weight_search.evaluate_candidates(
        jnp.asarray(preds), jnp.asarray(labels), jnp.asarray(w)
    )
    for i in range(4):
        fused = np.einsum("mnc,mc->nc", preds, w[i])
        p_, f_, u_ = fusion_metric(labels, fused.argmax(-1))
        assert abs(float(uar[i]) - u_) < 1e-5
        assert abs(float(f1[i]) - f_) < 1e-5
        assert abs(float(prec[i]) - p_) < 1e-5


# ---------------------------------------------------------------------------
# augmentations (spec: wave_augmentation.py)
# ---------------------------------------------------------------------------


def test_augmentations(rng):
    wav = rng.normal(size=1000).astype(np.float32)
    assert np.array_equal(augment.polarity_inversion(wav, rng), -wav)
    noisy = augment.white_noise()(wav, rng)
    assert noisy.shape == wav.shape and not np.array_equal(noisy, wav)
    assert np.abs(noisy - wav).max() < 0.05
    g = augment.gain()(wav, rng)
    ratio = np.abs(g).max() / np.abs(wav).max()
    assert 10 ** (-20 / 20) <= ratio <= 10 ** (-1 / 20) + 1e-6
    out = augment.default_train_augmentation()(wav, rng)
    assert out.shape == wav.shape


# ---------------------------------------------------------------------------
# offline alignment (spec: get_pred_av.py:107-135)
# ---------------------------------------------------------------------------


def test_align_video_drops_and_forward_fills(rng):
    t = 20
    labels = rng.integers(0, 7, t)
    labels[3] = -1
    labels[7] = 7
    stat = np_softmax(rng.normal(size=(t, 7)))
    dyn = rng.normal(size=(t, 7))
    audio = rng.normal(size=(t - 5, 7))  # audio runs short
    a = align_video(labels, stat, dyn, audio)
    assert len(a.trues) == t - 2
    assert a.stat.shape == a.dyn.shape == a.audio.shape == (t - 2, 7)
    np.testing.assert_allclose(a.dyn.sum(1), 1.0, atol=1e-6)
    res = evaluate_fusion(a, np.ones((3, 7)))
    assert 0 <= res["uar_av"] <= 1


# ---------------------------------------------------------------------------
# preprocessing helpers
# ---------------------------------------------------------------------------


def test_energy_vad_finds_speech():
    from avcer_tpu.pipeline.preprocess import energy_vad

    sr = 16000
    rng = np.random.default_rng(0)
    quiet = rng.normal(0, 1e-4, sr).astype(np.float32)
    loud = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    wav = np.concatenate([quiet, loud, quiet])
    segs = energy_vad(wav, sr)
    assert len(segs) == 1
    assert abs(segs[0]["start"] - sr) < sr * 0.1
    assert abs(segs[0]["end"] - 2 * sr) < sr * 0.1


def test_mouth_open_threshold():
    from avcer_tpu.pipeline.preprocess import mouth_open_from_areas

    areas = np.concatenate([np.full(50, 1.0), np.full(50, 3.0)])
    flags = mouth_open_from_areas(areas)
    assert flags[:40].sum() == 0
    assert flags[-10:].all()


# ---------------------------------------------------------------------------
# FE windowing (spec: abaw_fe_dataset.py:103-175)
# ---------------------------------------------------------------------------


def test_fe_windows_exhaustive_and_downsample(rng):
    from avcer_tpu.train.data import fe_dataset

    fr = 30.0
    n = 200
    ids = np.arange(1, n + 1)
    labels = rng.integers(0, 9, n)
    mouth = rng.integers(0, 2, n)
    ws = fe_dataset.make_fe_windows("f.txt", ids, labels, mouth, fr,
                                    shift=2, max_w_len=4, num_classes=8)
    # exhaustive: windows at every shift over the whole timeline (label>7
    # windows dropped)
    assert len(ws) >= 1
    for w in ws:
        assert 0 <= w.label <= 7
        # 4 s at NEW_FPS=5 -> 20 downsampled labels, 4 per-second flags
        assert len(w.downsampled_labels) == 20
        assert len(w.mouth_open) == 4
        assert set(np.unique(w.mouth_open)) <= {0, 1}
    # first window starts at frame 1
    assert ws[0].start_f == 1


def test_fe_downsample_indices_spec():
    from avcer_tpu.train.data.fe_dataset import downsample_indices
    from avcer_tpu.utils.rounding import round_math

    # direct statement of abaw_fe_dataset.py:116-124
    fr, maxw = 29.97, 4
    r = round_math(fr)
    want = [round_math(v) for v in np.arange(0, r * maxw - 1, r / 5, dtype=float)]
    assert downsample_indices(fr, maxw) == want
    assert len(want) == 20


def test_spectral_vad_silero_equivalent():
    """Spectral VAD (silero-equivalent: probs model + silero segmentation
    state machine) finds modulated-harmonic 'speech' between silences and
    honors min-duration/padding parameters (run_vad.py schema)."""
    from avcer_tpu.pipeline.preprocess import spectral_vad

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr

    def speech(sec):
        tt = np.arange(int(sec * sr)) / sr
        mod = 0.55 + 0.45 * np.sin(2 * np.pi * 4 * tt)  # syllabic modulation
        harm = sum(np.sin(2 * np.pi * f * tt) for f in (220, 440, 880, 1320))
        return (0.2 * mod * harm).astype(np.float32)

    def silence(sec):
        return rng.normal(0, 1e-4, int(sec * sr)).astype(np.float32)

    wav = np.concatenate(
        [silence(1.0), speech(1.0), silence(0.8), speech(0.7), silence(0.5)]
    )
    segs = spectral_vad(wav, sr)
    assert len(segs) == 2
    assert abs(segs[0]["start"] - 1.0 * sr) < 0.15 * sr
    assert abs(segs[0]["end"] - 2.0 * sr) < 0.15 * sr
    assert abs(segs[1]["start"] - 2.8 * sr) < 0.15 * sr
    assert abs(segs[1]["end"] - 3.5 * sr) < 0.15 * sr
    # a blip shorter than min_speech_duration_ms is dropped
    wav2 = np.concatenate([silence(1.0), speech(0.1), silence(1.0)])
    assert spectral_vad(wav2, sr) == []


def test_speech_timestamps_state_machine():
    """Exact silero postprocessing semantics on a hand-built prob series:
    hysteresis (neg threshold), min-silence bridge, min-speech drop, pad."""
    from avcer_tpu.pipeline.preprocess import speech_timestamps_from_probs

    sr, win = 16000, 512
    probs = np.zeros(200, np.float32)
    probs[20:60] = 0.9          # speech 1
    probs[60:62] = 0.4          # dip ABOVE neg threshold (0.35): bridged
    probs[62:80] = 0.9          # still speech 1
    probs[120:124] = 0.9        # too short (4*512 samples < 250 ms): dropped
    segs = speech_timestamps_from_probs(
        probs, 200 * win, sr, win, threshold=0.5,
        min_speech_duration_ms=250, min_silence_duration_ms=100,
        speech_pad_ms=30,
    )
    assert len(segs) == 1
    pad = int(sr * 0.03)
    assert segs[0]["start"] == 20 * win - pad
    assert segs[0]["end"] == 80 * win + pad


def test_mouth_open_first_window_matches_reference_nan_rule():
    """reference rolling(30).mean leaves the first 29 rows NaN -> flag 0
    (run_open_mouth_features_extraction.py:120-125)."""
    import pandas as pd

    from avcer_tpu.pipeline.preprocess import mouth_open_from_areas

    rng = np.random.default_rng(3)
    areas = rng.uniform(0.5, 3.0, 120)
    got = mouth_open_from_areas(areas)
    s = pd.Series(areas)
    mask = s[s.rolling(window=30).mean() > s.mean()]
    want = np.zeros(120, int)
    want[mask.index] = 1
    np.testing.assert_array_equal(got, want)


def _synthetic_face(open_mouth: bool, size: int = 112) -> np.ndarray:
    """Drawn face crop: skin-tone square, eyes, and a mouth that is either a
    thin line (closed) or a filled dark ellipse (open)."""
    import cv2

    img = np.full((size, size, 3), (140, 160, 200), np.uint8)  # BGR skin
    cv2.circle(img, (int(0.35 * size), int(0.35 * size)), size // 18, (30, 30, 30), -1)
    cv2.circle(img, (int(0.65 * size), int(0.35 * size)), size // 18, (30, 30, 30), -1)
    cx, cy = size // 2, int(0.75 * size)
    if open_mouth:
        cv2.ellipse(img, (cx, cy), (size // 6, size // 10), 0, 0, 360, (20, 20, 40), -1)
    else:
        cv2.line(img, (cx - size // 6, cy), (cx + size // 6, cy), (40, 40, 80), 2)
    return img


def test_mouth_open_extractor_end_to_end(tmp_path):
    """Pixel lip-area proxy separates open from closed mouths, and the
    extract_surface_area walk reproduces the reference's folder layout and
    CSV schema (frame, surface_area_mouth, mouth_open; index written)."""
    import cv2
    import pandas as pd

    from avcer_tpu.pipeline.preprocess import (
        extract_surface_area, lip_area_from_crop, mouth_open_from_areas,
    )

    a_open = lip_area_from_crop(_synthetic_face(True))
    a_closed = lip_area_from_crop(_synthetic_face(False))
    assert a_open > 2 * a_closed

    crop_dir = tmp_path / "faces" / "vid1" / "00"
    crop_dir.mkdir(parents=True)
    n = 64
    openness = [i >= n // 2 for i in range(n)]  # closed half, open half
    for i, is_open in enumerate(openness):
        cv2.imwrite(str(crop_dir / f"{i:06d}.jpg"), _synthetic_face(is_open))
    out = extract_surface_area(str(tmp_path / "faces"), str(tmp_path / "lm"))
    assert out == [str(tmp_path / "lm" / "vid1.csv")]
    df = pd.read_csv(out[0], index_col=0)
    assert list(df.columns) == ["frame", "surface_area_mouth", "mouth_open"]
    assert len(df) == n
    np.testing.assert_array_equal(
        df["mouth_open"].values,
        mouth_open_from_areas(df["surface_area_mouth"].values),
    )
    # the open-mouth half trips the threshold; the closed half does not
    assert df["mouth_open"].values[-8:].all()
    assert not df["mouth_open"].values[:30].any()
