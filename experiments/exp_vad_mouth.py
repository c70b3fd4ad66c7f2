"""Validation study for the two builder-designed preprocessing proxies
(round-2 verdict Missing #2/#3):

1. **spectral_vad** (pipeline/preprocess.py) vs ground-truth speech
   segments on synthetic clips with KNOWN boundaries: voice-like signal
   (pitch drift + vibrato + formant AM harmonics) alternating with
   silence / white noise / music chords / drum hits, across SNR levels.
   Reports frame-level accuracy/precision/recall/F1 and mean boundary
   error, for a sweep of trigger thresholds (the tuning data the default
   threshold is chosen from). The reference runs silero-vad
   (run_vad.py:8-34); its weights are not fetchable here, so this is the
   agreement-with-truth study the round-2 verdict asked for instead.

2. **lip_area_from_crop + mouth_open_from_areas** vs ground truth on
   rendered face crops where the TRUE inner-mouth area is known (we draw
   it): parameterized mouth openness, skin tone, lighting gain, gaussian
   noise, blur, crop size. Reports the Pearson correlation of the proxy
   area against the true drawn area and the flag agreement of the full
   rolling-mean pipeline vs flags computed from the true areas — i.e.
   exactly the quantity ABAW's closed-mouth filtering consumes
   (run_open_mouth_features_extraction.py:120-125,
   abaw_expr_dataset.py:122-132).

Host-side numpy/cv2 only (the proxies are host preprocessing, like the
reference's). Writes experiments/vad_mouth_validation.json; summarized in
PARITY.md; regression-gated by tests/test_datasets_and_misc.py.
"""

from __future__ import annotations

import json
import os

import numpy as np

SR = 16_000


# ---------------------------------------------------------------------------
# VAD benchmark
# ---------------------------------------------------------------------------


def voice(rng: np.random.Generator, sec: float, sr: int = SR) -> np.ndarray:
    """Speech-like: drifting f0 with vibrato, 6 harmonics with formant-ish
    weighting, syllabic (3-5 Hz) amplitude modulation incl. closures."""
    t = np.arange(int(sec * sr)) / sr
    f0 = 140 + 60 * np.sin(2 * np.pi * rng.uniform(0.1, 0.3) * t + rng.uniform(0, 6))
    f0 = f0 + 8 * np.sin(2 * np.pi * 5.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    weights = [1.0, 0.8, 0.9, 0.4, 0.5, 0.2]  # crude formant envelope
    sig = sum(w * np.sin((k + 1) * phase) for k, w in enumerate(weights))
    syll = 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * rng.uniform(3, 5) * t + rng.uniform(0, 6)), -0.2, 1.0)
    return (sig * syll / 4.0).astype(np.float32)


def music(rng: np.random.Generator, sec: float, sr: int = SR) -> np.ndarray:
    """Accompaniment: chord PROGRESSION (root changes every ~2 s — round-4
    upgrade; the round-3 single static chord was easier than real music),
    a lead melody line (held notes, no vibrato), and drum hits."""
    n = int(sec * sr)
    t = np.arange(n) / sr
    roots = (130.8, 146.8, 174.6, 196.0)  # C3 D3 F3 G3
    chord = np.zeros(n)
    melody = np.zeros(n)
    pos = 0
    while pos < n:
        seg = min(n - pos, int(rng.uniform(1.6, 2.4) * sr))
        root = float(rng.choice(roots))
        ts = t[pos : pos + seg]
        for ratio in (1.0, 1.25, 1.5, 2.0):  # major triad + octave
            chord[pos : pos + seg] += np.sin(
                2 * np.pi * root * ratio * ts + rng.uniform(0, 6))
        pos += seg
    pos = 0
    while pos < n:  # melody: quarter-ish held notes from the scale
        seg = min(n - pos, int(rng.uniform(0.3, 0.7) * sr))
        f = float(rng.choice(roots)) * float(rng.choice([2.0, 2.5, 3.0]))
        env = np.minimum(1.0, np.arange(seg) / (0.02 * sr))  # attack ramp
        melody[pos : pos + seg] += env * np.sin(
            2 * np.pi * f * t[pos : pos + seg] + rng.uniform(0, 6))
        pos += seg
    drums = np.zeros(n)
    click = int(0.03 * sr)
    for s in np.arange(0.2, sec, 0.45):
        i = int(s * sr)
        m = min(click, n - i)
        if m > 0:
            drums[i : i + m] += rng.normal(0, 1, m) * np.hanning(click)[:m]
    return ((0.13 * chord + 0.18 * melody + 0.25 * drums) / 2.0).astype(
        np.float32)


def build_clip(rng: np.random.Generator, kind: str, snr_db: float):
    """~14 s clip of alternating speech / non-speech; returns wav and the
    per-sample ground-truth speech mask."""
    plan = []
    state = False
    while sum(d for d, _ in plan) < 14.0:
        dur = rng.uniform(0.8, 2.5) if state else rng.uniform(0.5, 2.0)
        plan.append((dur, state))
        state = not state
    wav, mask = [], []
    for dur, is_speech in plan:
        n = int(dur * SR)
        if is_speech:
            seg = voice(rng, dur)
        elif kind == "silence":
            seg = np.zeros(n, np.float32)
        elif kind == "noise":
            seg = rng.normal(0, 0.05, n).astype(np.float32)
        else:  # music
            seg = music(rng, dur)
        wav.append(seg[:n])
        mask.append(np.full(n, is_speech, bool))
    wav = np.concatenate(wav)
    mask = np.concatenate(mask)
    # background noise at the requested speech SNR
    sp = wav[mask]
    sp_pow = float((sp ** 2).mean()) if sp.size else 1e-6
    noise_pow = sp_pow / (10 ** (snr_db / 10))
    wav = wav + rng.normal(0, np.sqrt(noise_pow), len(wav)).astype(np.float32)
    return wav, mask


def segments_to_mask(segs, n):
    m = np.zeros(n, bool)
    for s in segs:
        m[s["start"] : s["end"]] = True
    return m


def boundary_error_ms(segs, mask, sr=SR) -> float:
    """Mean absolute distance between predicted and true segment edges."""
    edges_true = np.flatnonzero(np.diff(mask.astype(int)) != 0)
    edges_pred = sorted(
        [s["start"] for s in segs] + [s["end"] for s in segs]
    )
    if not edges_pred or edges_true.size == 0:
        return float("nan")
    errs = [min(abs(e - p) for p in edges_pred) for e in edges_true]
    return float(np.mean(errs) / sr * 1000)


def run_vad_study(out: dict) -> None:
    from avcer_tpu.pipeline.preprocess import spectral_vad

    rng = np.random.default_rng(42)
    cases = [(kind, snr) for kind in ("silence", "noise", "music")
             for snr in (20.0, 10.0, 5.0)]
    clips = {c: [build_clip(rng, c[0], c[1]) for _ in range(4)] for c in cases}

    sweep = {}
    for thr in (0.3, 0.4, 0.5, 0.6, 0.7):
        tp = fp = fn = tn = 0
        for c, pairs in clips.items():
            for wav, mask in pairs:
                pred = segments_to_mask(spectral_vad(wav, SR, threshold=thr), len(wav))
                tp += int((pred & mask).sum())
                fp += int((pred & ~mask).sum())
                fn += int((~pred & mask).sum())
                tn += int((~pred & ~mask).sum())
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        sweep[str(thr)] = {
            "accuracy": (tp + tn) / (tp + tn + fp + fn),
            "precision": prec,
            "recall": rec,
            "f1": 2 * prec * rec / max(prec + rec, 1e-9),
        }
    best_thr = max(sweep, key=lambda k: sweep[k]["f1"])

    per_case = {}
    for (kind, snr), pairs in clips.items():
        accs, f1s, bnds = [], [], []
        for wav, mask in pairs:
            segs = spectral_vad(wav, SR, threshold=float(best_thr))
            pred = segments_to_mask(segs, len(wav))
            tp = (pred & mask).sum(); fp = (pred & ~mask).sum()
            fn = (~pred & mask).sum(); tn = (~pred & ~mask).sum()
            prec = tp / max(tp + fp, 1); rec = tp / max(tp + fn, 1)
            accs.append((tp + tn) / len(mask))
            f1s.append(2 * prec * rec / max(prec + rec, 1e-9))
            bnds.append(boundary_error_ms(segs, mask))
        per_case[f"{kind}_snr{int(snr)}"] = {
            "frame_accuracy": float(np.mean(accs)),
            "frame_f1": float(np.mean(f1s)),
            "boundary_mae_ms": float(np.nanmean(bnds)),
        }
    out["vad"] = {
        "threshold_sweep": sweep,
        "best_threshold": float(best_thr),
        "per_case_at_best": per_case,
    }


# ---------------------------------------------------------------------------
# Mouth-open benchmark
# ---------------------------------------------------------------------------


def render_face(
    rng: np.random.Generator, openness: float, size: int, skin, gain: float,
    noise: float, blur: int, beard: float = 0.0, lipstick: bool = False,
    shadow: float = 0.0,
) -> tuple[np.ndarray, float]:
    """Face crop with a known inner-mouth area. openness in [0, 1]: 0 =
    closed (thin lip line), 1 = fully open dark cavity. Round-4
    adversarial appearance factors (VERDICT r3 Missing #4: the round-3
    study only used clean faces): ``beard`` = dark stubble density on
    chin/jaw + a moustache band directly above the lips; ``lipstick`` =
    saturated dark-red lips; ``shadow`` = lateral illumination ramp
    darkening one side of the face by that fraction. Returns (crop, true
    normalized mouth area)."""
    import cv2

    img = np.full((size, size, 3), skin, np.uint8)
    # eyes + brows + nose shading for realism
    cv2.circle(img, (int(0.33 * size), int(0.36 * size)), size // 16, (25, 28, 30), -1)
    cv2.circle(img, (int(0.67 * size), int(0.36 * size)), size // 16, (25, 28, 30), -1)
    cv2.line(img, (int(0.25 * size), int(0.28 * size)), (int(0.42 * size), int(0.27 * size)), (40, 45, 50), 2)
    cv2.line(img, (int(0.58 * size), int(0.27 * size)), (int(0.75 * size), int(0.28 * size)), (40, 45, 50), 2)
    cv2.line(img, (int(0.5 * size), int(0.42 * size)), (int(0.47 * size), int(0.58 * size)), tuple(int(c * 0.8) for c in skin), 2)
    cx, cy = size // 2, int(0.76 * size)
    half_w = int(size * rng.uniform(0.13, 0.19))
    # lips (always drawn)
    lip = tuple(int(c * 0.55) for c in skin)
    cv2.ellipse(img, (cx, cy), (half_w, max(2, int(size * 0.035))), 0, 0, 360, lip, -1)
    true_area = 0.0
    if openness > 0:
        half_h = max(1, int(size * 0.09 * openness))
        cv2.ellipse(img, (cx, cy), (int(half_w * 0.85), half_h), 0, 0, 360, (15, 12, 25), -1)
        true_area = np.pi * (half_w * 0.85) * half_h / (size * size)
    if beard > 0:
        dark = np.array([int(c * 0.3) for c in skin], np.float32)
        # stubble: chin/jaw below the mouth + cheeks beside it
        ys, xs = np.mgrid[0:size, 0:size]
        jaw = (ys > cy + int(size * 0.06)) | (
            (ys > int(0.62 * size)) & ((xs < cx - half_w - 2)
                                       | (xs > cx + half_w + 2)))
        speckle = rng.random((size, size)) < beard * 0.6
        m = jaw & speckle
        img[m] = dark.astype(np.uint8)
        # moustache band directly above the upper lip — the adversarial
        # case: dark pixels ADJACENT to the cavity region
        mst = (ys >= cy - int(size * 0.09)) & (ys <= cy - int(size * 0.045)) \
            & (xs > cx - half_w) & (xs < cx + half_w)
        m2 = mst & (rng.random((size, size)) < beard)
        img[m2] = dark.astype(np.uint8)
    if lipstick:
        # saturated dark red replaces the skin-toned lips (BGR)
        lip_mask = np.zeros((size, size), np.uint8)
        cv2.ellipse(lip_mask, (cx, cy),
                    (half_w, max(2, int(size * 0.035))), 0, 0, 360, 1, -1)
        if openness > 0:
            cv2.ellipse(lip_mask, (cx, cy),
                        (int(half_w * 0.85), max(1, int(size * 0.09 * openness))),
                        0, 0, 360, 0, -1)  # keep the cavity dark, not red
        img[lip_mask == 1] = (35, 25, 150)
    img = np.clip(img.astype(np.float32) * gain, 0, 255)
    if shadow > 0:
        ramp = (1.0 - shadow * np.linspace(0, 1, size))[None, :, None]
        img = img * ramp
    img += rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if blur > 1:
        img = cv2.blur(img, (blur, blur))
    return img, float(true_area)


def run_mouth_study(out: dict) -> None:
    from avcer_tpu.pipeline.preprocess import (
        lip_area_from_crop, mouth_open_from_areas,
    )

    rng = np.random.default_rng(7)
    skins = [(120, 140, 190), (80, 100, 150), (60, 70, 110), (150, 170, 210)]
    conds = []
    proxy_all, true_all = [], []
    for skin in skins:
        for size in (64, 112, 160):
            for gain in (0.8, 1.0, 1.2):
                conds.append((skin, size, gain))
    # correlation study: random openness per sample
    for skin, size, gain in conds:
        for _ in range(6):
            openness = float(rng.choice([0.0, 0.0, 0.3, 0.6, 1.0]))
            crop, true_area = render_face(
                rng, openness, size, skin, gain,
                noise=rng.uniform(0, 6), blur=int(rng.choice([1, 1, 3])),
            )
            proxy_all.append(lip_area_from_crop(crop))
            true_all.append(true_area)
    proxy_all = np.asarray(proxy_all); true_all = np.asarray(true_all)
    corr = float(np.corrcoef(proxy_all, true_all)[0, 1])

    # pipeline flag agreement: per-"video" series of open/closed phases.
    # Appearance factors are constant WITHIN a video (a beard doesn't
    # flicker frame to frame) — the interesting question is whether the
    # per-video adaptive threshold (rolling mean > global mean of the
    # same series) absorbs a constant dark offset.
    def video_agreement(render_kwargs: dict) -> float:
        skin, size, gain = conds[rng.integers(0, len(conds))]
        n = 120
        states = np.zeros(n, float)
        i = 0
        while i < n:
            run = int(rng.integers(20, 45))
            states[i : i + run] = rng.choice([0.0, 0.0, 0.5, 1.0])
            i += run
        proxy_series, true_series = [], []
        for s in states:
            crop, ta = render_face(rng, s, size, skin, gain,
                                   noise=rng.uniform(0, 5), blur=1,
                                   **render_kwargs)
            proxy_series.append(lip_area_from_crop(crop))
            true_series.append(ta)
        flags_proxy = mouth_open_from_areas(np.asarray(proxy_series))
        flags_true = mouth_open_from_areas(np.asarray(true_series))
        # skip the rolling-window warmup (both are zeros there by contract)
        return float((flags_proxy[30:] == flags_true[30:]).mean())

    agreements = [video_agreement({}) for _ in range(8)]
    out["mouth"] = {
        "proxy_vs_true_area_pearson": corr,
        "n_correlation_samples": int(len(proxy_all)),
        "flag_agreement_mean": float(np.mean(agreements)),
        "flag_agreement_min": float(np.min(agreements)),
        "n_videos": len(agreements),
    }

    # round-4 hard-appearance study (VERDICT r3 Missing #4): the factors
    # a darkness-fraction proxy should fear — facial hair adjacent to the
    # cavity region, dark saturated lips, lateral shadow — measured
    # per-factor so failures are attributable
    hard = {}
    for factor, kwargs_list in (
        ("beard", [{"beard": 0.4}, {"beard": 0.8}]),
        ("lipstick", [{"lipstick": True}]),
        ("shadow", [{"shadow": 0.35}, {"shadow": 0.6}]),
        ("combined", [{"beard": 0.6, "lipstick": True, "shadow": 0.4}]),
    ):
        ag = []
        for kw in kwargs_list:
            ag.extend(video_agreement(kw) for _ in range(4))
        hard[factor] = {
            "flag_agreement_mean": float(np.mean(ag)),
            "flag_agreement_min": float(np.min(ag)),
            "n_videos": len(ag),
        }
    out["mouth"]["hard_appearance"] = hard


def main() -> None:
    out: dict = {}
    run_vad_study(out)
    run_mouth_study(out)
    path = os.path.join(os.path.dirname(__file__), "vad_mouth_validation.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
