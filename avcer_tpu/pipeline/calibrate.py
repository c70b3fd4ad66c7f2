"""One-shot on-device batch-size calibration.

The crop-CNN and audio-window batch sizes are pure throughput knobs — any
batch size produces identical per-item results (fixed-shape chunks with tail
padding), so the right value is whatever the attached device runs fastest.
The defaults in ``core/config.py`` are the measured v5e optima
(BENCH_NOTES.md round-2 table); ``calibrate()`` re-derives them on whatever
device is actually attached and caches the result per device kind, so
deployments on other TPU generations get measured values instead of v5e
constants.

Cost: one XLA compile per candidate batch size on the first run (seconds on
a locally attached chip; minutes through a remote-compile relay). The cache
makes every later run free, which is why this is a one-shot calibration and
not a per-run sweep.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

# per-user cache path: a world-shared /tmp file could be pre-created or
# poisoned by another user on a multi-tenant host
DEFAULT_CACHE = os.path.join(
    tempfile.gettempdir(),
    f"avcer_calibration_{getattr(os, 'getuid', lambda: 'u')()}.json",
)


def _barrier(x) -> None:
    np.asarray(jax.tree.leaves(x)[0])


def _time_slope(fn, n1: int = 2, n2: int = 8) -> float:
    """Per-dispatch seconds via the fetch-barrier slope method (cancels the
    constant device->host fetch latency, which dominates through a tunneled
    PJRT link)."""
    _barrier(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(n1):
        out = fn()
    _barrier(out)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = fn()
    _barrier(out)
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1)


def _cache_key(pipe) -> str:
    dev = jax.devices()[0]
    return "|".join(
        [
            getattr(dev, "device_kind", str(dev)),
            pipe.cfg.detector.backbone,
            pipe.cfg.audio.head,
            str(pipe.cfg.visual.dtype),
            # quantized programs have different batch-size optima than the
            # exact ones — a bf16-calibrated record must not serve int8
            pipe.cfg.detector.quant,
            pipe.cfg.visual.quant,
            pipe.cfg.audio.quant,
            str(pipe.cfg.audio.shared_extractor),
        ]
    )


def valid_record(rec) -> bool:
    """Self-consistency check before adopting a cached calibration record:
    a corrupt or hand-edited entry (advisor r2: the cache file is a shared
    mutable input) must trigger a re-measure, not be applied. The caller's
    candidate lists deliberately do NOT gate a hit — the cache contract is
    "this device+config was measured once" (the round-trip test passes
    disjoint candidates to prove no re-measurement happens on a hit)."""
    return (
        isinstance(rec, dict)
        and isinstance(rec.get("visual_batch"), int)
        and isinstance(rec.get("audio_batch"), int)
        and rec["visual_batch"] > 0
        and rec["audio_batch"] > 0
        and str(rec["visual_batch"]) in rec.get("cnn_ms_per_frame", {})
        and str(rec["audio_batch"]) in rec.get("audio_ms_per_window", {})
    )


def calibrate(
    pipe,
    cache_path: str | None = DEFAULT_CACHE,
    cnn_batches: tuple[int, ...] = (64, 128, 256, 512),
    audio_batches: tuple[int, ...] = (8, 16, 32),
) -> dict:
    """Measure per-item cost of the crop-CNN and audio stages at candidate
    batch sizes on the attached device, apply the optima to ``pipe``, and
    cache the result. Returns the calibration record."""
    key = _cache_key(pipe)
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except (OSError, json.JSONDecodeError):
            cache = {}
        rec = cache.get(key)
        if valid_record(rec):
            apply_calibration(pipe, rec)
            return rec
    else:
        cache = {}

    rng = np.random.default_rng(0)
    frames_dev = jnp.asarray(rng.integers(0, 255, (32, 360, 640, 3), np.uint8))
    _barrier(frames_dev)
    cnn_ms = {}
    for bs in cnn_batches:
        idx = jnp.asarray((np.arange(bs) % 32).astype(np.int32))
        boxes = jnp.asarray(
            np.tile(np.array([[160, 90, 480, 270]], np.int32), (bs, 1))
        )
        sec = _time_slope(
            lambda: pipe.visual._jit_static_from_frames(
                pipe.visual.static_variables, frames_dev, idx, boxes
            )
        )
        cnn_ms[bs] = sec / bs * 1e3
        log.info("calibrate: crop-CNN b%d -> %.3f ms/frame", bs, cnn_ms[bs])

    window = int(pipe.cfg.audio.window_sec * pipe.cfg.audio.sample_rate)
    wav_dev = jnp.asarray(rng.normal(size=40 * 16_000).astype(np.float32))
    _barrier(wav_dev)
    audio_ms = {}
    for bs in audio_batches:
        starts = jnp.asarray(
            (np.arange(bs) * 8000 % (wav_dev.shape[0] - window)).astype(np.int32)
        )
        sec = _time_slope(
            lambda: pipe.audio._jit_forward_from_wav(
                pipe.audio.variables, wav_dev,
                jnp.asarray(wav_dev.shape[0], jnp.int32), starts,
                padding=pipe.cfg.audio.padding,
            ),
            n1=2, n2=6,
        )
        audio_ms[bs] = sec / bs * 1e3
        log.info("calibrate: audio b%d -> %.3f ms/window", bs, audio_ms[bs])

    record = {
        "visual_batch": min(cnn_ms, key=cnn_ms.get),
        "audio_batch": min(audio_ms, key=audio_ms.get),
        "cnn_ms_per_frame": {str(k): round(v, 4) for k, v in cnn_ms.items()},
        "audio_ms_per_window": {str(k): round(v, 4) for k, v in audio_ms.items()},
    }
    apply_calibration(pipe, record)
    if cache_path:
        cache[key] = record
        tmp = cache_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=2)
        os.replace(tmp, cache_path)
    return record


def apply_calibration(pipe, record: dict) -> None:
    pipe.visual.batch_size = int(record["visual_batch"])
    pipe.audio.cfg = dataclasses.replace(
        pipe.audio.cfg, batch_size=int(record["audio_batch"])
    )
