"""Shared-extractor drift on NON-stationary audio.

The main profile-drift study's wavs are statistically stationary (constant
pitch-modulated envelope), so per-window mean/std ~= per-clip mean/std and
the shared-per-clip-normalization approximation measures ~0 drift by
construction. Real speech is not stationary: pauses and loudness swings
make window stats diverge from clip stats — that is where the
approximation actually bites (get_prob_audio_8_cl.py:83-90 normalizes per
window). This study uses wavs with 20 dB loudness steps and silence gaps
and reports unrounded drift, appended to profile_drift.json under
"shared_extractor_fp32_nonstationary".
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import exp_profile_drift as base  # noqa: E402

SR = base.SR


def nonstationary_wav(seed: int, seconds: float = 8.0) -> np.ndarray:
    """Speech-like harmonics whose loudness steps 20 dB per second and with
    two hard silence gaps — worst-case window-vs-clip statistics."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    tt = np.arange(n) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 3.1 * tt + seed)
    wav = np.zeros(n, np.float32)
    for h in range(1, 6):
        wav += np.sin(2 * np.pi * f0 * h * tt).astype(np.float32) / h
    # per-second loudness steps spanning 20 dB (x10 amplitude)
    gains = 10 ** rng.uniform(-1.0, 0.0, size=int(seconds) + 1)
    wav *= gains[(tt).astype(int)].astype(np.float32)
    # two silence gaps of 0.7 s
    for g0 in (1.3, 5.1):
        wav[int(g0 * SR):int((g0 + 0.7) * SR)] = 0.0
    wav += rng.standard_normal(n).astype(np.float32) * 1e-3
    return wav * 0.1


def feature_level_study(expr_v, wavs) -> dict:
    """Conv-extractor FEATURE drift, exact vs shared normalization.

    The logit-level drift below passes through the randomized-twin
    transformer head, whose small random weights contract perturbations
    ~1e4x (measured: a 3x+1 input affine gives 7e-3 relative feature drift
    but 1e-8 absolute logit drift). Real checkpoints need not contract, so
    the conservative published bound is at the FEATURE level: slice the
    shared per-clip-normalized stream vs the per-window-normalized exact
    extractor output, relative MAD over full windows."""
    import jax as _jax
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.ops import audio as audio_ops

    m = ExprModel(variant="v3", num_classes=8,
                  wav2vec2_config=Wav2Vec2Config(num_layers=base.W2V2_LAYERS),
                  dtype=jnp.float32)
    window, step = 4 * SR, SR // 2
    stride_total = 320
    fpw = m.wav2vec2_config.num_output_frames(window)
    rel, mx = [], []
    for wav in wavs:
        wavj = jnp.asarray(wav)
        xn_clip = (wavj - wavj.mean()) / jnp.sqrt(wavj.var() + 1e-7)
        stream = m.apply(expr_v, xn_clip[None], w2v_mode="features_only")[0]
        starts = list(range(0, len(wav) - window + 1, step))
        wins = jnp.stack([wavj[s:s + window] for s in starts])
        exact = m.apply(expr_v, audio_ops.feature_extractor_normalize(wins),
                        w2v_mode="features_only")
        for i, s in enumerate(starts):
            sl = stream[s // stride_total:s // stride_total + fpw]
            d = jnp.abs(exact[i] - sl)
            rel.append(float(d.mean() / jnp.abs(exact[i]).mean()))
            mx.append(float(d.max()))
    return {
        "feature_rel_mad": float(np.mean(rel)),
        "feature_rel_mad_max": float(np.max(rel)),
        "feature_abs_max": float(np.max(mx)),
        "windows": len(rel),
    }


def study(expr_v, wavs) -> dict:
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    stages = {
        mode: AudioStage(
            expr_v,
            AudioConfig(num_classes=8, head="v3", dtype="float32",
                        batch_size=8, shared_extractor=mode == "shared"),
            Wav2Vec2Config(num_layers=base.W2V2_LAYERS),
            dtype=jnp.float32,
        )
        for mode in ("exact", "shared")
    }
    mads, maxs, flips, nwin = [], [], 0, 0
    probs_mads = []
    for wav in wavs:
        le, _ = stages["exact"].run_from_wav(wav, base.FPS)
        ls, _ = stages["shared"].run_from_wav(wav, base.FPS)
        d = np.abs(le.astype(np.float64) - ls.astype(np.float64))
        mads.append(d.mean())
        maxs.append(d.max())
        pe = jax.nn.softmax(le.astype(np.float64), axis=1)
        ps = jax.nn.softmax(ls.astype(np.float64), axis=1)
        probs_mads.append(float(np.abs(np.asarray(pe) - np.asarray(ps)).mean()))
        flips += int((le.argmax(1) != ls.argmax(1)).sum())
        nwin += le.shape[0]
    return {
        "logit_mad": float(np.mean(mads)),
        "logit_max": float(np.max(maxs)),
        "prob_mad": float(np.mean(probs_mads)),
        "argmax_flips": flips,
        "windows": nwin,
        "flip_rate": round(flips / max(nwin, 1), 4),
    }


def main() -> None:
    base.log("twin audio weights...")
    _, _, expr_v = base.twin_weights()
    wavs = [nonstationary_wav(seed=20 + i) for i in range(3)]
    base.log("non-stationary shared-extractor study...")
    res = study(expr_v, wavs)
    res["window_std_range_after_clip_norm"] = [
        round(float(min(np.std(w[s:s + 4 * SR] / np.std(w))
                        for s in range(0, len(w) - 4 * SR + 1, SR // 2))), 3)
        for w in wavs
    ]
    base.log("feature-level isolated study...")
    feat = feature_level_study(expr_v, wavs)
    out_path = base.OUT
    with open(out_path) as f:
        doc = json.load(f)
    doc["shared_extractor_fp32_nonstationary"] = res
    doc["shared_extractor_feature_level"] = feat
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({**res, **feat}, indent=1))


if __name__ == "__main__":
    main()
