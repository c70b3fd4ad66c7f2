"""Audio front-end ops: padding, windowing, normalization, resampling.

Behavior contracts:

- repeat padding            /root/reference/src/data/utils.py:63-71
- constant / mean padding   /root/reference/src/data/utils.py:74-89
- window enumeration        /root/reference/src/get_prob_audio_8_cl.py:78-87
- window -> frame mapping   /root/reference/src/get_prob_audio_8_cl.py:94-101
- processor normalization:  HF Wav2Vec2FeatureExtractor zero-mean/unit-var
                            (used at get_prob_audio_8_cl.py:88-90)
- mono mixdown + resample   /root/reference/src/data/utils.py:50-58

The reference pads/normalizes one window at a time on host; here window
extraction is a single strided gather producing a fixed-shape [W, L] batch,
and normalization is fused into the jitted model program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def enumerate_windows(num_samples: int, window: int, step: int) -> list[tuple[int, int]]:
    """(start, end) pairs replicating ``range(0, len(wav)+1, step)`` with
    ``end = min(start+window, len)`` (get_prob_audio_8_cl.py:78-79).

    Note the reference's ``+1`` bound: when ``num_samples`` is a multiple of
    ``step`` the final window is empty (start == end == num_samples). We keep
    that window (its padded content is all-fill) for output parity.
    """
    return [
        (start, min(start + window, num_samples))
        for start in range(0, num_samples + 1, step)
    ]


def window_frame_names(start: int, end: int, sr: int, fps: float) -> list[int]:
    """0-based frame indices covered by a window: ``round(start/sr*fps)`` up to
    and including ``round(end/sr*fps)`` (get_prob_audio_8_cl.py:94-99)."""
    lo = round(start / sr * fps)
    hi = round(end / sr * fps + 1)
    return list(range(lo, hi))


def extract_windows(
    wav: np.ndarray, window: int, step: int, padding: str
) -> np.ndarray:
    """All windows of a clip as one [W, window] float32 batch.

    Host-side (numpy): runs once per clip, output feeds a single device
    transfer. Padding modes: "mean" | "constant" (zeros) | "repeat"
    (data/utils.py:63-89).
    """
    wav = np.asarray(wav, dtype=np.float32)
    spans = enumerate_windows(len(wav), window, step)
    out = np.empty((len(spans), window), dtype=np.float32)
    for i, (s, e) in enumerate(spans):
        chunk = wav[s:e]
        n = e - s
        if n >= window:
            out[i] = chunk[:window]
        elif padding == "repeat":
            if n == 0:
                out[i] = 0.0
            else:
                reps = (window + n - 1) // n
                out[i] = np.tile(chunk, reps)[:window]
        else:
            fill = float(chunk.mean()) if (padding == "mean" and n > 0) else 0.0
            out[i, :n] = chunk
            out[i, n:] = fill
    return out


def feature_extractor_normalize(batch: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Per-window zero-mean unit-variance normalization.

    Matches HF ``Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm`` (biased
    variance, eps=1e-7) which the reference applies window-by-window on host
    (get_prob_audio_8_cl.py:88-90). Fused into the device program here.
    """
    mean = jnp.mean(batch, axis=-1, keepdims=True)
    var = jnp.var(batch, axis=-1, keepdims=True)
    return (batch - mean) / jnp.sqrt(var + eps)


def mixdown_mono(wav: np.ndarray) -> np.ndarray:
    """Channel-mean mixdown (data/utils.py:51-52)."""
    wav = np.asarray(wav)
    if wav.ndim == 2 and wav.shape[0] > 1:
        return wav.mean(axis=0)
    return wav.reshape(-1)


# ---------------------------------------------------------------------------
# Sinc resampler (torchaudio.transforms.Resample equivalent)
# ---------------------------------------------------------------------------


def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    beta: float | None = 14.769656459379492,
) -> tuple[np.ndarray, int]:
    """Windowed-sinc polyphase kernel with torchaudio's default parameters
    (sinc_interp_hann is the reference default; torchaudio uses a Hann-windowed
    sinc for ``resampling_method="sinc_interp_hann"``).

    Returns (kernels [new//gcd, width], stride orig//gcd).
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2  # Hann
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base_freq / orig
    return kernel.astype(np.float32), orig


def resample(wav: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Bandlimited sinc resampling, numerically equivalent to
    ``torchaudio.transforms.Resample`` defaults (data/utils.py:54-57).

    Host-side numpy implementation (runs once per clip at ingest).
    """
    if orig_freq == new_freq:
        return np.asarray(wav, dtype=np.float32)
    wav = np.asarray(wav, dtype=np.float32)
    kernel, orig = _sinc_resample_kernel(orig_freq, new_freq)
    gcd = math.gcd(orig_freq, new_freq)
    new = new_freq // gcd
    length = wav.shape[-1]
    width = (kernel.shape[1] - orig) // 2
    num_wavs = int(np.prod(wav.shape[:-1])) if wav.ndim > 1 else 1
    flat = wav.reshape(num_wavs, length)
    padded = np.pad(flat, ((0, 0), (width, width + orig)))
    target_len = int(math.ceil(new * length / orig))
    n_frames = -(-target_len // new)  # ceil: frames needed to cover target_len
    out = np.zeros((num_wavs, new, n_frames), dtype=np.float32)
    # polyphase: out[:, p, j] = sum_k padded[:, j*orig + k] * kernel[p, k]
    for p in range(new):
        k = kernel[p]
        strided = np.lib.stride_tricks.sliding_window_view(padded, k.shape[0], axis=1)
        out[:, p, :] = strided[:, : n_frames * orig : orig] @ k
    out = out.transpose(0, 2, 1).reshape(num_wavs, -1)[:, :target_len]
    return out.reshape(*wav.shape[:-1], target_len) if wav.ndim > 1 else out[0]
