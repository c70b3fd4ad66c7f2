"""CNN-hold sensitivity study (round 5).

The main profile-drift benchmark cannot see the `max` preset's static-CNN
hold: its rendered faces are time-invariant, so per-frame static probs
are ~98% consecutive-identical even in the per-frame arm and holding them
costs exactly nothing (profile_drift.json: max == turbo in every column).
This study stresses the approximation directly: clips whose face
APPEARANCE changes continuously (mouth opening/closing, eye size and
face brightness morphing), driven through two pipelines that differ ONLY
in VisualConfig.cnn_stride (turbo vs max — same detector, bucket, quant,
audio). Every output difference is therefore attributable to the hold.

Metrics per clip:
  - static probs MAD + max between arms;
  - VS / AV compound-decision agreement between arms;
  - decision-flip DELAY: for each VS decision change in the per-frame
    arm, how many frames later the held arm switches (the hold's real
    product-level cost is a bounded decision latency, <= cnn_stride - 1
    frames = 160 ms at 25 fps).

Results merge into experiments/profile_drift.json under
"cnn_hold_sensitivity" (PARITY.md frontier table cites it).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["AVCER_INT8_CPU_F32_ACCUM"] = "1"

import exp_profile_drift as base  # noqa: E402

FPS = base.FPS
W, H = base.W, base.H
N_FRAMES = base.N_FRAMES
N_CLIPS = base.N_CLIPS


def write_morph_clip(path: str, seed: int) -> np.ndarray:
    """A schematic face whose mouth aperture, eye size and skin brightness
    morph continuously (several cycles per clip) while it translates —
    same face family the synthetic detectors were trained on
    (train/detection.render_face_scene), but time-varying."""
    import cv2

    rng = np.random.default_rng(seed)
    bg = rng.integers(60, 120, (H // 8, W // 8, 3), np.uint8)
    bg = cv2.resize(bg, (W, H), interpolation=cv2.INTER_LINEAR)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (W, H))
    s = 96  # face width
    fh = int(s * 1.25)
    for t in range(N_FRAMES):
        ph = 2 * np.pi * t / N_FRAMES
        img = bg.copy()
        x = int((W - s) * (0.5 + 0.3 * np.sin(ph + seed)))
        y = int((H - fh) * (0.5 + 0.25 * np.cos(ph * 1.3 + seed)))
        cx, cy = x + s // 2, y + fh // 2
        # appearance morphs: ~3 expression cycles per clip
        m = 0.5 * (1 + np.sin(2 * np.pi * 3 * t / N_FRAMES + seed))
        skin = (int(150 + 40 * m), int(170 + 20 * m), int(215 - 30 * m))
        cv2.ellipse(img, (cx, cy), (s // 2, fh // 2), 0, 0, 360, skin, -1)
        er = max(1, int(s // 10 * (0.6 + 0.8 * (1 - m))))
        cv2.circle(img, (cx - s // 4, cy - fh // 6), er, (25, 25, 25), -1)
        cv2.circle(img, (cx + s // 4, cy - fh // 6), er, (25, 25, 25), -1)
        mouth_h = max(1, int(fh // 12 * (0.3 + 2.2 * m)))
        cv2.ellipse(img, (cx, cy + fh // 4),
                    (max(1, s // 5), mouth_h), 0, 0, 360, (30, 30, 60), -1)
        vw.write(img)
    vw.release()

    n = N_FRAMES * base.SR // FPS
    tt = np.arange(n) / base.SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 3.1 * tt + seed)
    wav = np.zeros(n, np.float32)
    for h in range(1, 6):
        wav += np.sin(2 * np.pi * f0 * h * tt).astype(np.float32) / h
    env = 0.5 * (1 + np.sin(2 * np.pi * 4.7 * tt + seed * 2)).astype(np.float32)
    return wav * env * 0.1 + rng.standard_normal(n).astype(np.float32) * 0.01


def flip_delays(ref_dec: np.ndarray, held_dec: np.ndarray,
                max_look: int = 10) -> list[int]:
    """For each decision change in the per-frame arm, frames until the
    held arm shows the new value (capped at max_look; changes the held arm
    never adopts are recorded as max_look)."""
    delays = []
    n = min(len(ref_dec), len(held_dec))
    for t in range(1, n):
        if ref_dec[t] != ref_dec[t - 1]:
            d = max_look
            for k in range(max_look):
                if t + k < n and held_dec[t + k] == ref_dec[t]:
                    d = k
                    break
            delays.append(d)
    return delays


def decision_sim(cnn_strides=(2, 5, 10), switch_periods_s=(2.0, 0.5),
                 t_frames: int = 1500, n_runs: int = 12) -> dict:
    """Decision-layer simulation: the model-free measurement the clip
    study cannot give (random-twin CNNs never flip their argmax, so
    holding their probs costs 0 by construction — see per_clip records).

    Static-logit streams follow a regime-switching OU process (attractor
    = one expression class, switch every ``switch_period`` seconds on
    average, OU pull 0.2, noise 0.3, class gap 2.0 — i.e., a stream that
    DOES change its mind at a controlled rate), fed through the REAL
    fused compound decision (ops/fusion.fused_compound_decision with the
    published weight matrices) twice: per-frame vs held at cnn_stride
    (exact cnn_compute_sel/subset_forward_fill serving semantics; the
    dynamic and audio streams are arm-identical, as they are in the real
    pipeline — the dynamic stream is bit-exact under the hold)."""
    from avcer_tpu.core.config import FusionConfig
    from avcer_tpu.fusion.compound import decide
    from avcer_tpu.pipeline.visual import cnn_compute_sel, subset_forward_fill

    step = 5  # dynamic cadence at 25 fps
    cfgf = FusionConfig(use_published_weights=True)
    out: dict[str, dict] = {}
    for sp in switch_periods_s:
        p_switch = 1.0 / (sp * FPS)
        for cs in cnn_strides:
            vs_agrees, av_agrees, delays = [], [], []
            for run in range(n_runs):
                rng = np.random.default_rng(1000 * run + int(sp * 10) + cs)
                z = np.zeros(7)
                mu = np.zeros(7)
                zs = np.empty((t_frames, 7), np.float32)
                for t in range(t_frames):
                    if t == 0 or rng.random() < p_switch:
                        mu = np.zeros(7)
                        mu[rng.integers(7)] = 2.0
                    z = z + 0.2 * (mu - z) + 0.3 * rng.standard_normal(7)
                    zs[t] = z
                ez = np.exp(zs - zs.max(1, keepdims=True))
                stat = (ez / ez.sum(1, keepdims=True)).astype(np.float32)
                # dynamic/audio streams: smoothed copies, arm-identical
                dyn = np.empty_like(zs)
                dyn[0] = zs[0]
                for t in range(1, t_frames):
                    dyn[t] = 0.9 * dyn[t - 1] + 0.1 * zs[t]
                audio = np.repeat(zs[::12], 12, axis=0)[:t_frames]
                ids = np.arange(t_frames)
                sel, _ = cnn_compute_sel(ids, step, cs)
                held, _ = subset_forward_fill(sel, stat[sel], None)
                a = decide(stat, dyn, audio, "sim", cfgf)
                b = decide(held, dyn, audio, "sim", cfgf)
                vs_agrees.append(float((a.vs == b.vs).mean()))
                av_agrees.append(float((a.av == b.av).mean()))
                delays.extend(flip_delays(a.vs, b.vs))
            out[f"switch_{sp}s_stride_{cs}"] = {
                "vs_agree": round(float(np.mean(vs_agrees)), 4),
                "av_agree": round(float(np.mean(av_agrees)), 4),
                "vs_flips": len(delays),
                "flip_delay_mean_frames": round(float(np.mean(delays)), 2)
                if delays else 0.0,
                "flip_delay_p95_frames": int(np.percentile(delays, 95))
                if delays else 0,
            }
            base.log(f"sim {sp}s/{cs}: {out[f'switch_{sp}s_stride_{cs}']}")
    return out


def main() -> None:
    det_mnet = base.synth_detector("mobilenet0.25")
    det_r50 = base.synth_detector("resnet50")
    base.log("converting twin weights...")
    cnn_v, lstm_v, expr_v = base.twin_weights()

    clips, wavs = [], []
    for i in range(N_CLIPS):
        path = os.path.join("/tmp", f"morph_clip{i}.avi")
        wavs.append(write_morph_clip(path, seed=30 + i))
        clips.append(path)
    base.log(f"{N_CLIPS} morph clips rendered")

    arm_pf = base.build_pipeline("turbo", det_r50, det_mnet,
                                 cnn_v, lstm_v, expr_v)   # per-frame CNN
    arm_h = base.build_pipeline("max", det_r50, det_mnet,
                                cnn_v, lstm_v, expr_v)    # held CNN
    recs = []
    for path, wav in zip(clips, wavs):
        a = arm_pf.run(path, wav=wav)
        b = arm_h.run(path, wav=wav)
        d = np.abs(a.stat_probs - b.stat_probs)
        var = float(np.mean(
            np.any(a.stat_probs[1:] != a.stat_probs[:-1], axis=1)))
        delays = flip_delays(a.compound.vs, b.compound.vs)
        recs.append({
            "static_mad": round(float(d.mean()), 5),
            "static_max": round(float(d.max()), 4),
            "perframe_variability": round(var, 4),
            "vs_agree": round(float(
                (a.compound.vs == b.compound.vs).mean()), 4),
            "av_agree": round(float(
                (a.compound.av == b.compound.av).mean()), 4),
            "vs_flips": len(delays),
            "vs_flip_delay_mean": round(float(np.mean(delays)), 2)
            if delays else 0.0,
            "vs_flip_delay_max": int(np.max(delays)) if delays else 0,
        })
        base.log(f"clip done: {recs[-1]}")

    summary = {
        "method": "turbo (per-frame CNN) vs max (held CNN) on morphing-"
                  "face clips; arms differ ONLY in cnn_stride",
        "per_clip": recs,
        "static_mad": round(float(np.mean([r["static_mad"] for r in recs])), 5),
        "vs_agree": round(float(np.mean([r["vs_agree"] for r in recs])), 4),
        "av_agree": round(float(np.mean([r["av_agree"] for r in recs])), 4),
        "perframe_variability": round(float(np.mean(
            [r["perframe_variability"] for r in recs])), 4),
        "vs_flip_delay_mean": round(float(np.mean(
            [r["vs_flip_delay_mean"] for r in recs])), 2),
        "vs_flip_delay_max": int(np.max(
            [r["vs_flip_delay_max"] for r in recs])),
    }
    base.log("decision-layer simulation...")
    summary["decision_sim"] = decision_sim()

    with open(base.OUT) as f:
        doc = json.load(f)
    doc["cnn_hold_sensitivity"] = summary
    with open(base.OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
