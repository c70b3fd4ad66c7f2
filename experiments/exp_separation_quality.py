"""Separation-quality bound for the HPSS vocal separator (VERDICT r3
Next #8): the substitute for the reference's Spleeter stage
(/root/reference/src/audio/run_convert_video_to_audio.py:36-95) satisfies
the duration contract and passes an e2e mix test, but its vocal-isolation
QUALITY was a shrug. This study makes it a number.

Method: synthetic mixes with KNOWN stems — the voice/music generators
from exp_vad_mouth.py (speech-like vibrato harmonics; chord progression +
held-note melody + drums) — at several vocal/accompaniment ratios.

Metrics:
  - SI-SDR of the separated estimate vs the true vocal stem, against the
    SI-SDR of the unseparated mix (the do-nothing baseline): the
    improvement is the separator's worth in dB;
  - vocal leakage: residual accompaniment energy in the estimate relative
    to the accompaniment energy in the mix (dB suppression);
  - the VAD interaction (the two round-3 weaknesses compound): frame F1
    of spectral_vad on speech-with-music clips, raw mix vs separated.

Writes experiments/separation_quality.json; summarized in PARITY.md;
regression-gated in tests/test_datasets_and_misc.py.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
SR = 16_000


def _load_vad_mouth():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_vad_mouth.py")
    spec = importlib.util.spec_from_file_location("exp_vad_mouth", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def si_sdr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SDR (Le Roux et al. 2019): project the estimate
    onto the reference, report target/residual energy ratio in dB."""
    est = est.astype(np.float64) - est.mean()
    ref = ref.astype(np.float64) - ref.mean()
    alpha = float(est @ ref) / (float(ref @ ref) + 1e-12)
    target = alpha * ref
    noise = est - target
    return 10.0 * np.log10(
        (target @ target + 1e-12) / (noise @ noise + 1e-12))


def make_mix(exp, rng: np.random.Generator, sec: float, acc_gain_db: float):
    """Continuous vocal stem + accompaniment stem, mixed at the given
    accompaniment gain relative to the vocal power."""
    voc = exp.voice(rng, sec)
    acc = exp.music(rng, sec)
    n = min(len(voc), len(acc))
    voc, acc = voc[:n], acc[:n]
    vp = float((voc ** 2).mean()) + 1e-12
    ap = float((acc ** 2).mean()) + 1e-12
    acc = acc * np.sqrt(vp / ap * 10 ** (acc_gain_db / 10))
    return voc, acc, (voc + acc).astype(np.float32)


def run_separation_study(out: dict) -> None:
    from avcer_tpu.pipeline.separate import hpss_vocals

    exp = _load_vad_mouth()
    rng = np.random.default_rng(7)
    rows = {}
    for gain_db in (-5.0, 0.0, 5.0):
        sdr_mix, sdr_est, leak = [], [], []
        for _ in range(4):
            voc, acc, mix = make_mix(exp, rng, 12.0, gain_db)
            est = hpss_vocals(mix, SR)[: len(voc)]
            sdr_mix.append(si_sdr(mix, voc))
            sdr_est.append(si_sdr(est, voc))
            # accompaniment suppression: energy of the accompaniment that
            # survives into the estimate (projection onto acc) vs its
            # energy in the mix
            a = acc.astype(np.float64)
            proj_est = float(est.astype(np.float64) @ a) ** 2 / (
                float(a @ a) + 1e-12)
            proj_mix = float(mix.astype(np.float64) @ a) ** 2 / (
                float(a @ a) + 1e-12)
            leak.append(10 * np.log10((proj_est + 1e-12) /
                                      (proj_mix + 1e-12)))
        rows[f"acc_gain_{int(gain_db)}dB"] = {
            "si_sdr_mix_db": round(float(np.mean(sdr_mix)), 2),
            "si_sdr_separated_db": round(float(np.mean(sdr_est)), 2),
            "si_sdr_improvement_db": round(
                float(np.mean(sdr_est) - np.mean(sdr_mix)), 2),
            "accompaniment_suppression_db": round(-float(np.mean(leak)), 2),
        }
    out["separation"] = rows


def run_vad_interaction(out: dict) -> None:
    """Does separating first help the VAD on speech-over-music clips?"""
    from avcer_tpu.pipeline.preprocess import spectral_vad
    from avcer_tpu.pipeline.separate import hpss_vocals

    exp = _load_vad_mouth()
    rng = np.random.default_rng(9)
    rows = {}
    for snr in (10.0, 5.0):
        f1s: dict[str, list] = {"raw": [], "sep": [], "fused": []}
        for _ in range(4):
            wav, mask = exp.build_clip(rng, "music", snr)
            arms = (
                ("raw", np.asarray(wav, np.float32), {}),
                ("sep", np.asarray(hpss_vocals(wav, SR), np.float32), {}),
                # round-5 product mode: raw+separated max-fusion
                ("fused", np.asarray(wav, np.float32),
                 {"separate_fusion": True}),
            )
            for tag, sig, kw in arms:
                pred = exp.segments_to_mask(
                    spectral_vad(sig, SR, **kw), len(sig))
                m = mask[: len(sig)]
                tp = (pred & m).sum(); fp = (pred & ~m).sum()
                fn = (~pred & m).sum()
                prec = tp / max(tp + fp, 1); rec = tp / max(tp + fn, 1)
                f1s[tag].append(2 * prec * rec / max(prec + rec, 1e-9))
        rows[f"music_snr{int(snr)}"] = {
            "vad_f1_raw_mix": round(float(np.mean(f1s["raw"])), 3),
            "vad_f1_after_separation": round(float(np.mean(f1s["sep"])), 3),
            "vad_f1_separate_fusion": round(float(np.mean(f1s["fused"])), 3),
        }
    out["vad_interaction"] = rows


def main() -> None:
    out: dict = {}
    run_separation_study(out)
    run_vad_interaction(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "separation_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
