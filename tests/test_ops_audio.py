"""Audio front-end op tests: windowing/padding parity vs direct statements of
the reference semantics, resampler invariants."""

import numpy as np
import jax.numpy as jnp

from avcer_tpu.ops import audio as audio_ops


def ref_pad_repeat(wav, max_length):
    """Spec: data/utils.py:63-71."""
    n = len(wav)
    if n < max_length:
        reps = (max_length + n - 1) // n
        wav = np.concatenate([wav] * reps)[:max_length]
    elif n > max_length:
        wav = wav[:max_length]
    return wav


def test_enumerate_windows_includes_trailing_empty():
    # len divisible by step -> final start == len (get_prob_audio_8_cl.py:78)
    spans = audio_ops.enumerate_windows(32000, window=64000, step=8000)
    assert spans[0] == (0, 32000)
    assert spans[-1] == (32000, 32000)
    assert len(spans) == 5
    spans = audio_ops.enumerate_windows(100_001, window=64000, step=8000)
    assert spans[-1] == (96000, 100_001)
    assert spans[3] == (24000, 88000)


def test_window_frame_names():
    # window [0, 4s) at 25 fps covers frames 0..100 inclusive
    frames = audio_ops.window_frame_names(0, 64000, sr=16000, fps=25)
    assert frames[0] == 0 and frames[-1] == 100
    frames = audio_ops.window_frame_names(8000, 72000, sr=16000, fps=30)
    assert frames[0] == 15 and frames[-1] == 135


def test_extract_windows_padding_modes(rng):
    wav = rng.normal(size=37_000).astype(np.float32)
    win, step = 64000, 8000
    for mode in ("mean", "constant", "repeat"):
        got = audio_ops.extract_windows(wav, win, step, mode)
        spans = audio_ops.enumerate_windows(len(wav), win, step)
        assert got.shape == (len(spans), win)
        for i, (s, e) in enumerate(spans):
            chunk = wav[s:e]
            if mode == "repeat":
                want = ref_pad_repeat(chunk, win) if len(chunk) else np.zeros(win)
            else:
                fill = chunk.mean() if (mode == "mean" and len(chunk)) else 0.0
                want = np.concatenate([chunk, np.full(win - len(chunk), fill)])
            np.testing.assert_allclose(got[i], want.astype(np.float32), atol=1e-6)


def test_feature_extractor_normalize_matches_hf_formula(rng):
    x = rng.normal(size=(3, 1000)).astype(np.float32) * 4 + 2
    got = np.asarray(audio_ops.feature_extractor_normalize(jnp.asarray(x)))
    want = (x - x.mean(axis=1, keepdims=True)) / np.sqrt(x.var(axis=1, keepdims=True) + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mixdown_mono(rng):
    stereo = rng.normal(size=(2, 500)).astype(np.float32)
    np.testing.assert_allclose(audio_ops.mixdown_mono(stereo), stereo.mean(0))
    mono = rng.normal(size=(1, 500)).astype(np.float32)
    np.testing.assert_allclose(audio_ops.mixdown_mono(mono), mono[0])


def test_resample_invariants():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    freq = 440.0
    wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
    out = audio_ops.resample(wav, sr_in, sr_out)
    assert len(out) == int(np.ceil(len(wav) * sr_out / sr_in))
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out))
    peak = np.argmax(spec) * sr_out / len(out)
    assert abs(peak - freq) < 2.0
    # amplitude approximately preserved away from edges
    mid = out[len(out) // 4 : -len(out) // 4]
    assert 0.95 < mid.max() < 1.05
    # identity when rates match
    np.testing.assert_array_equal(audio_ops.resample(wav, 16000, 16000), wav)


def test_resample_dc_preserved():
    wav = np.full(44100, 0.5, dtype=np.float32)
    out = audio_ops.resample(wav, 44100, 16000)
    mid = out[1000:-1000]
    np.testing.assert_allclose(mid, 0.5, atol=1e-3)
