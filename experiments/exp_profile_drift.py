"""Per-profile speed/quality frontier study (round-3; VERDICT r2 weak #3).

The serving presets trade accuracy for throughput (int8 convs, the
reference's mobilenet0.25 backbone, a 448 letterbox bucket, detect stride
2, a shared audio conv-feature extractor). BENCH_NOTES records what each
buys in ms; this experiment records what each costs in OUTPUT drift, so
the frontier is published with both axes (PARITY.md table).

Method: full end-to-end `Pipeline.run` per profile on synthetic clips with
TRAINED synthetic-face detectors (train/detection.py — mobilenet AND
resnet50, so the fast/turbo backbone swap is measured with detectors that
actually detect), plus randomized-BN torch-twin weights for the emotion
CNN / LSTM / audio model (converted through the production converters —
the same fixtures the parity suite uses; published checkpoints are not in
this image, the standing caveat). Each profile is diffed against the
parity profile:

  - detection: present-flag agreement + box IoU (ClipResult.face_boxes);
  - per-stage output drift: static probs, dynamic logits, audio window
    logits (mean/max abs over the full [T, C] arrays);
  - decision agreement: AV / VS / VD / A compound-label match rate.

Plus the standalone shared-extractor study the ROADMAP owes: exact
per-window HF normalization (get_prob_audio_8_cl.py:83-90) vs the shared
per-clip normalization, same weights, fp32 — per-window logit drift and
argmax flip rate, isolated from every other approximation.

CPU-only (jax_platforms=cpu): drift is a function of the program, not the
chip; int8 rounding and bf16 accumulate identically. Results append to
experiments/profile_drift.json.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
# int8 contractions accumulate in f32 on this CPU-only study: XLA:CPU has
# no fast int8 conv/dot (scalar emulation stalled the first attempt at ~50x
# slower); quantize/round/clip stay byte-identical and the accumulation
# deviation is <=1e-7 relative (models/layers._int8_f32_accum), three
# orders below the int8 drift measured here. TPU serving always runs int32.
os.environ["AVCER_INT8_CPU_F32_ACCUM"] = "1"

import jax.numpy as jnp  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "profile_drift.json")
FPS = 25
SR = 16_000
N_FRAMES = 200  # 8 s @ 25 fps -> 9 full 4 s audio windows per clip
W, H = 640, 360
N_CLIPS = 3
W2V2_LAYERS = 4  # CPU-tractable stand-in (full 12 layers: same drift mechanism)
T0 = time.time()


def summarize(recs):
    """Aggregate per-clip drift records into the per-profile summary row —
    the ONE definition of the summary schema shared by the main study and
    the extra/resume continuation scripts (a missed lockstep edit would
    silently mix schemas inside profile_drift.json)."""
    return {
        "present_agree": round(float(np.mean(
            [r["present_agree"] for r in recs])), 4),
        "box_iou": round(float(np.nanmean(
            [r["box_iou"] for r in recs])), 4),
        "static_mad": round(float(np.mean(
            [r["static"]["mad"] for r in recs])), 5),
        "dynamic_mad": round(float(np.mean(
            [r["dynamic"]["mad"] for r in recs])), 5),
        "audio_mad": round(float(np.mean(
            [r["audio"]["mad"] for r in recs])), 5),
        "av_agree": round(float(np.mean(
            [r["av_agree"] for r in recs])), 4),
        "vs_agree": round(float(np.mean(
            [r["vs_agree"] for r in recs])), 4),
        "vd_agree": round(float(np.mean(
            [r["vd_agree"] for r in recs])), 4),
        "a_agree": round(float(np.mean(
            [r["a_agree"] for r in recs])), 4),
    }


def log(msg: str) -> None:
    print(f"[{(time.time() - T0) / 60:5.1f}m] {msg}", flush=True)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def synth_detector(backbone: str):
    """Train (or load cached) a synthetic-face RetinaFace for ``backbone``."""
    cache = os.path.join(HERE, f".synthdet_{backbone.replace('.', '')}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    from avcer_tpu.train import detection

    steps = 400 if backbone == "mobilenet0.25" else 250
    log(f"training synthetic {backbone} detector ({steps} steps, CPU)...")
    variables, losses = detection.train_synthetic_detector(
        steps=steps, image_size=256, batch=4, face_size_range=(24, 160),
        seed=0, backbone=backbone,
    )
    log(f"  loss {np.mean(losses[:10]):.3f} -> {np.mean(losses[-10:]):.3f}")
    variables = jax.device_get(variables)
    with open(cache, "wb") as f:
        pickle.dump(variables, f)
    return variables


def twin_weights():
    """Randomized-BN torch twins -> production converters (the parity-suite
    fixture recipe, tests/test_model_parity.py)."""
    import torch

    import torch_twins as twins
    from avcer_tpu.core import convert

    def randomize(model, scale=0.05, seed=42):
        sd = model.state_dict()
        g = torch.Generator().manual_seed(seed)
        for k, v in sd.items():
            if v.dtype.is_floating_point:
                if k.endswith(".pe"):
                    continue
                if k.endswith("running_var"):
                    sd[k] = torch.rand(v.shape, generator=g) + 0.5
                elif k.endswith("running_mean"):
                    sd[k] = torch.randn(v.shape, generator=g) * 0.1
                else:
                    sd[k] = torch.randn(v.shape, generator=g) * scale
        model.load_state_dict(sd)

    cnn = twins.TwinEmotionResNet50(num_classes=7)
    randomize(cnn, seed=1)
    lstm = twins.TwinTemporalLSTM()
    randomize(lstm, scale=0.3, seed=2)
    expr = twins.TwinExprModel(variant="v3", num_classes=8,
                               num_layers=W2V2_LAYERS)
    randomize(expr, scale=0.05, seed=3)
    return (
        convert.convert_emotion_resnet50(cnn.state_dict()),
        convert.convert_temporal_lstm(lstm.state_dict()),
        convert.convert_expr_model(expr.state_dict(), variant="v3",
                                   num_layers=W2V2_LAYERS),
    )


def write_clip(path: str, seed: int) -> np.ndarray:
    """Moving/zooming rendered face over textured background + a synthetic
    speech-like wav. Returns the float32 mono 16 kHz wav."""
    import cv2

    from avcer_tpu.train.detection import render_face_scene

    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (W, H))
    # reuse the trained detector's face style, but place it ourselves so the
    # trajectory is smooth (tracker-friendly) and the size sweeps scales
    for t in range(N_FRAMES):
        ph = 2 * np.pi * t / N_FRAMES
        size = int(70 + 45 * np.sin(ph * 2 + seed))
        base, _ = render_face_scene(rng, (H, W), [])
        x = int((W - size) * (0.5 + 0.35 * np.sin(ph)))
        y = int((H - int(size * 1.25)) * (0.5 + 0.3 * np.cos(ph)))
        face_img, _ = render_face_scene(
            np.random.default_rng(seed * 97 + 11), (int(size * 1.25), size),
            [size - 8],
        )
        base[y:y + int(size * 1.25), x:x + size] = face_img
        vw.write(base)
    vw.release()

    n = N_FRAMES * SR // FPS
    tt = np.arange(n) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 3.1 * tt + seed)
    wav = np.zeros(n, np.float32)
    for h in range(1, 6):
        wav += np.sin(2 * np.pi * f0 * h * tt).astype(np.float32) / h
    env = 0.5 * (1 + np.sin(2 * np.pi * 4.7 * tt + seed * 2)).astype(np.float32)
    wav = wav * env * 0.1 + rng.standard_normal(n).astype(np.float32) * 0.01
    return wav


# ---------------------------------------------------------------------------
# profiles
# ---------------------------------------------------------------------------


def build_pipeline(profile: str, det_r50, det_mnet, cnn_v, lstm_v, expr_v):
    from avcer_tpu.core.config import (AudioConfig, DetectorConfig,
                                       FusionConfig, PipelineConfig,
                                       VisualConfig)
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.runner import Pipeline

    quant = "none" if profile in ("parity", "balanced") else "int8"
    backbone = "mobilenet0.25" if profile in (
        "fast", "turbo", "turbo_exact_audio", "max", "max_astep1",
    ) else "resnet50"
    turbo = (profile.startswith("turbo") or profile.startswith("max"))
    cfg = PipelineConfig(
        detector=DetectorConfig(
            backbone=backbone,
            long_side=448
            if (turbo or profile in ("balanced", "int8_448", "int8_448_s2"))
            else 640,
            stride=2
            if (turbo or profile in ("int8_s2", "int8_448_s2")) else 1,
            quant=quant,
            threshold=0.5,  # synthetic detectors: same calibration everywhere
            batch_size=16,
        ),
        # max (round-5): turbo + static CNN at the dynamic step cadence
        # (cnn_stride=0 -> every step frame; held rows between).
        # max_astep1: additionally the documented --audio_step 1.0 variant
        # (4 s windows, 1 s step — within the reference's own sweep space;
        # audio_mad in compare() is then apples-to-oranges per window, but
        # the per-frame agreement columns remain the quality metric)
        visual=VisualConfig(quant=quant, batch_size=64,
                            cnn_stride=0 if profile.startswith("max")
                            else 1),
        audio=AudioConfig(
            num_classes=8, head="v3", quant=quant,
            step_sec=1.0 if profile == "max_astep1" else 0.5,
            # round-4 preset semantics (core/config.py): every quantized
            # preset shares the conv extractor; turbo_exact_audio stays the
            # isolation control for the approximation
            shared_extractor=(quant == "int8"
                              and profile != "turbo_exact_audio"),
            batch_size=8,
        ),
        fusion=FusionConfig(use_published_weights=True),
    )
    det = det_mnet if backbone == "mobilenet0.25" else det_r50
    # AudioStage flips Wav2Vec2Config.quant itself when cfg.audio.quant=int8
    return Pipeline(cfg, det, cnn_v, lstm_v, expr_v,
                    Wav2Vec2Config(num_layers=W2V2_LAYERS))


def drift(a: np.ndarray, b: np.ndarray) -> dict:
    n = min(len(a), len(b))
    d = np.abs(np.asarray(a[:n], np.float64) - np.asarray(b[:n], np.float64))
    return {"mad": round(float(d.mean()), 5), "max": round(float(d.max()), 4)}


def compare(ref, got) -> dict:
    """Diff one profile's ClipResult against the parity profile's."""
    pr = ref.face_boxes[:, 0] >= 0
    pg = got.face_boxes[:, 0] >= 0
    n = min(len(pr), len(pg))
    both = pr[:n] & pg[:n]
    iou = float("nan")
    if both.any():
        a, b = ref.face_boxes[:n][both].astype(np.float64), \
            got.face_boxes[:n][both].astype(np.float64)
        lt = np.maximum(a[:, :2], b[:, :2])
        rb = np.minimum(a[:, 2:], b[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        ar = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        br = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = float((inter / np.maximum(ar + br - inter, 1e-9)).mean())
    out = {
        "present_agree": round(float((pr[:n] == pg[:n]).mean()), 4),
        "box_iou": round(iou, 4),
        "static": drift(ref.stat_probs, got.stat_probs),
        "dynamic": drift(ref.dyn_logits, got.dyn_logits),
        "audio": drift(ref.audio_window_logits, got.audio_window_logits),
    }
    for k in ("av", "vs", "vd", "a"):
        r, g = getattr(ref.compound, k), getattr(got.compound, k)
        m = min(len(r), len(g))
        out[f"{k}_agree"] = round(float((r[:m] == g[:m]).mean()), 4)
    return out


def shared_extractor_study(expr_v, wavs) -> dict:
    """Exact per-window normalization vs shared per-clip extractor, fp32,
    same weights — the isolated approximation (ROADMAP r2 #1)."""
    from avcer_tpu.core.config import AudioConfig
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.pipeline.audio_stage import AudioStage

    stages = {
        mode: AudioStage(
            expr_v,
            AudioConfig(num_classes=8, head="v3", dtype="float32",
                        batch_size=8, shared_extractor=mode == "shared"),
            Wav2Vec2Config(num_layers=W2V2_LAYERS),
            dtype=jnp.float32,
        )
        for mode in ("exact", "shared")
    }
    mads, maxs, flips, nwin = [], [], 0, 0
    for wav in wavs:
        le, _ = stages["exact"].run_from_wav(wav, FPS)
        ls, _ = stages["shared"].run_from_wav(wav, FPS)
        d = np.abs(le.astype(np.float64) - ls.astype(np.float64))
        mads.append(d.mean())
        maxs.append(d.max())
        flips += int((le.argmax(1) != ls.argmax(1)).sum())
        nwin += le.shape[0]
    return {
        "logit_mad": round(float(np.mean(mads)), 5),
        "logit_max": round(float(np.max(maxs)), 4),
        "argmax_flips": flips,
        "windows": nwin,
        "flip_rate": round(flips / max(nwin, 1), 4),
    }


def main() -> None:
    det_mnet = synth_detector("mobilenet0.25")
    det_r50 = synth_detector("resnet50")
    log("converting twin weights...")
    cnn_v, lstm_v, expr_v = twin_weights()

    clips, wavs = [], []
    for i in range(N_CLIPS):
        path = os.path.join("/tmp", f"drift_clip{i}.avi")
        wavs.append(write_clip(path, seed=10 + i))
        clips.append(path)
    log(f"{N_CLIPS} clips rendered")

    profiles = ["parity", "balanced", "int8", "fast", "turbo_exact_audio",
                "turbo", "max", "max_astep1"]
    results: dict[str, list] = {p: [] for p in profiles}
    parity_runs = []
    for profile in profiles:
        pipe = build_pipeline(profile, det_r50, det_mnet, cnn_v, lstm_v, expr_v)
        for ci, (path, wav) in enumerate(zip(clips, wavs)):
            clip = pipe.run(path, wav=wav)
            if profile == "parity":
                parity_runs.append(clip)
                results[profile].append({
                    "present_frac": round(
                        float((clip.face_boxes[:, 0] >= 0).mean()), 4),
                })
            else:
                results[profile].append(compare(parity_runs[ci], clip))
        log(f"profile {profile}: done")
        with open(OUT + ".partial", "w") as f:  # survive interruption
            json.dump({"per_clip": results,
                       "minutes": round((time.time() - T0) / 60, 1)}, f)

    log("shared-extractor isolated study...")
    shared = shared_extractor_study(expr_v, wavs)

    summary = {}
    for p in profiles[1:]:
        recs = results[p]
        summary[p] = summarize(recs)

    out = {
        "config": {
            "clips": N_CLIPS, "frames": N_FRAMES, "fps": FPS,
            "resolution": [W, H], "w2v2_layers": W2V2_LAYERS,
            "weights": "trained synthetic detectors (mnet+r50); "
                       "randomized-BN twins for CNN/LSTM/audio "
                       "(published checkpoints unavailable in image)",
        },
        "per_clip": results,
        "summary": summary,
        "shared_extractor_fp32": shared,
        "minutes": round((time.time() - T0) / 60, 1),
    }
    # merge, don't clobber: sections other experiments attach to this file
    # (exp_cnn_hold.py's cnn_hold_sensitivity) survive a base-study rerun
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        for k, v in prev.items():
            out.setdefault(k, v)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log("summary:")
    print(json.dumps({"summary": summary, "shared_extractor_fp32": shared},
                     indent=1))


if __name__ == "__main__":
    main()
