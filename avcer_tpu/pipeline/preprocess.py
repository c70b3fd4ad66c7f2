"""Corpus preprocessing (L1): audio extraction, VAD, mouth-open features.

Reference mechanisms and their status here:

- video -> wav via ffmpeg, optional Spleeter vocal separation with duration
  sanity checks (/root/reference/src/audio/run_convert_video_to_audio.py:
  28-95). ffmpeg-gated; Spleeter is not available in this image, so vocal
  separation raises with guidance unless a separator callable is injected.
- silero VAD via torch.hub (/root/reference/src/audio/run_vad.py:8-34).
  torch.hub needs network; when unavailable an energy-based VAD with the
  same output schema ({"start": sample, "end": sample} dicts) is used.
- mediapipe FaceMesh mouth-open features
  (/root/reference/src/audio/run_open_mouth_features_extraction.py:22-130).
  mediapipe is not in this image; the rolling-mean thresholding (:120-125)
  is implemented over any per-frame lip-area series, with a pluggable
  area extractor.
"""

from __future__ import annotations

import os
import pickle
import shutil
import subprocess
from typing import Callable, Optional

import numpy as np


def convert_video_to_audio(
    path_video: str,
    path_wav: str,
    sample_rate: int = 16_000,
    vocal_separation: bool = False,
    separator: Optional[Callable[[str, str], None]] = None,
) -> str:
    """ffmpeg extraction (run_convert_video_to_audio.py:28: 16 kHz mono
    pcm_s16le). ``separator(in_wav, out_wav)`` hook replaces Spleeter."""
    if os.path.exists(path_wav):
        return path_wav
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not available; cannot extract audio")
    if vocal_separation:
        tmp = path_wav + ".full.wav"
        subprocess.run(
            [ffmpeg, "-y", "-i", path_video, "-vn", "-acodec", "pcm_s16le",
             "-ar", "44100", "-ac", "1", tmp],
            check=True, capture_output=True,
        )
        if separator is None:
            raise RuntimeError(
                "vocal separation requested but no separator available "
                "(the reference uses Spleeter, not present in this image)"
            )
        separator(tmp, path_wav)
        _check_durations(tmp, path_wav)
        os.remove(tmp)
    else:
        subprocess.run(
            [ffmpeg, "-y", "-i", path_video, "-vn", "-acodec", "pcm_s16le",
             "-ar", str(sample_rate), "-ac", "1", path_wav],
            check=True, capture_output=True,
        )
    return path_wav


def _check_durations(a: str, b: str, tol: float = 0.1) -> None:
    """Duration sanity check (run_convert_video_to_audio.py:87-95)."""
    from avcer_tpu.pipeline.media import read_wav

    wa, sa = read_wav(a)
    wb, sb = read_wav(b)
    da, db = wa.shape[-1] / sa, wb.shape[-1] / sb
    if abs(da - db) > tol:
        raise RuntimeError(f"duration mismatch after separation: {da} vs {db}")


# ---------------------------------------------------------------------------
# VAD
# ---------------------------------------------------------------------------


def energy_vad(
    wav: np.ndarray,
    sr: int = 16_000,
    frame_ms: float = 30.0,
    threshold_db: float = -35.0,
    min_speech_ms: float = 250.0,
    min_silence_ms: float = 100.0,
) -> list[dict]:
    """Energy-gate VAD emitting silero-schema segments
    ([{"start": sample, "end": sample}, ...], run_vad.py output format).
    Fallback when the silero torch.hub model cannot be fetched."""
    frame = int(sr * frame_ms / 1000)
    n = len(wav) // frame
    if n == 0:
        return []
    frames = wav[: n * frame].reshape(n, frame)
    rms = np.sqrt((frames.astype(np.float64) ** 2).mean(1)) + 1e-12
    db = 20 * np.log10(rms)
    active = db > threshold_db
    segs: list[dict] = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            segs.append({"start": start * frame, "end": i * frame})
            start = None
    if start is not None:
        segs.append({"start": start * frame, "end": n * frame})
    # merge close, drop short
    min_sil = int(sr * min_silence_ms / 1000)
    min_sp = int(sr * min_speech_ms / 1000)
    merged: list[dict] = []
    for s in segs:
        if merged and s["start"] - merged[-1]["end"] < min_sil:
            merged[-1]["end"] = s["end"]
        else:
            merged.append(dict(s))
    return [s for s in merged if s["end"] - s["start"] >= min_sp]


def silero_vad(wav: np.ndarray, sr: int = 16_000) -> list[dict]:
    """silero VAD if the hub cache is present (run_vad.py:8-34); falls back
    to ``energy_vad`` otherwise."""
    try:
        import torch

        model, utils = torch.hub.load(
            "snakers4/silero-vad", "silero_vad", trust_repo=True,
            skip_validation=True,
        )
        (get_speech_timestamps, *_rest) = utils
        return get_speech_timestamps(torch.from_numpy(wav), model, sampling_rate=sr)
    except Exception:
        return energy_vad(wav, sr)


def build_vad_pickle(wav_dir: str, out_path: str, sr: int = 16_000) -> str:
    """Per-file speech-timestamp pickle, the artifact MELD training consumes
    (run_vad.py output; meld_dataset.py:119-123 input)."""
    from avcer_tpu.pipeline.media import read_wav

    info = {}
    for name in sorted(os.listdir(wav_dir)):
        if not name.endswith(".wav"):
            continue
        data, file_sr = read_wav(os.path.join(wav_dir, name))
        mono = data.mean(0) if data.shape[0] > 1 else data[0]
        info[name] = silero_vad(mono, file_sr)
    with open(out_path, "wb") as fh:
        pickle.dump(info, fh)
    return out_path


# ---------------------------------------------------------------------------
# Mouth-open features
# ---------------------------------------------------------------------------


def mouth_open_from_areas(
    areas: np.ndarray, window: int = 30
) -> np.ndarray:
    """Rolling(30).mean > global mean thresholding
    (run_open_mouth_features_extraction.py:120-125). ``areas`` is the
    per-frame lip surface-area series (NaN where no face)."""
    import pandas as pd

    s = pd.Series(areas)
    rolled = s.rolling(window, min_periods=1).mean()
    return (rolled > np.nanmean(areas)).astype(int).values


def mouth_open_csv(
    areas: np.ndarray, out_path: str
) -> str:
    """Write the per-video CSV schema the ABAW dataset joins on
    (abaw_expr_dataset.py:240-247: columns feat_id, frame, surface_area_mouth,
    mouth_open; frame ids 1-based)."""
    import pandas as pd

    flags = mouth_open_from_areas(areas)
    df = pd.DataFrame(
        {
            "feat_id": np.arange(len(areas)),
            "frame": np.arange(1, len(areas) + 1),
            "surface_area_mouth": areas,
            "mouth_open": flags,
        }
    )
    df.to_csv(out_path, index=False)
    return out_path
