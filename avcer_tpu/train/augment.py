"""Waveform augmentations for audio training.

Behavior contract — /root/reference/src/audio/augmentation/
wave_augmentation.py:8-161 (+ identity_augmentation.py):

- PolarityInversion: flip sign
- WhiteNoise: additive gaussian noise with amplitude uniform in
  [min_amp, max_amp] * std-free absolute scale (reference draws amplitude in
  [1e-4, 5e-3] and multiplies standard normal noise)
- Gain: scale by uniform dB in [-20, -1]
- RandomChoice: apply one randomly chosen augmentation
- Identity: passthrough

Host-side numpy (runs in the loader's prefetch thread); each call takes an
explicit ``np.random.Generator`` for reproducibility.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

Aug = Callable[[np.ndarray, np.random.Generator], np.ndarray]


def identity(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return wav


def polarity_inversion(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return -wav


def white_noise(
    min_amp: float = 1e-4, max_amp: float = 5e-3
) -> Aug:
    def f(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        amp = rng.uniform(min_amp, max_amp)
        return wav + amp * rng.standard_normal(wav.shape).astype(wav.dtype)

    return f


def gain(min_db: float = -20.0, max_db: float = -1.0) -> Aug:
    def f(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        db = rng.uniform(min_db, max_db)
        return wav * (10.0 ** (db / 20.0))

    return f


def random_choice(augs: Sequence[Aug]) -> Aug:
    def f(wav: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        i = int(rng.integers(0, len(augs)))
        return augs[i](wav, rng)

    return f


def default_train_augmentation() -> Aug:
    """The reference's enabled-augmentation setup (train_c_audio.py:112-121):
    random choice among polarity inversion, white noise, gain."""
    return random_choice([polarity_inversion, white_noise(), gain()])
