"""Audio emotion stage: sliding windows -> one batched jitted forward.

Replaces the reference's per-window host loop
(/root/reference/src/get_prob_audio_8_cl.py:78-101): every 4 s / 0.5 s-step
window of the clip is extracted into one [W, 64000] batch on host (padding
modes mean/constant/repeat per data/utils.py:63-89), the HF feature-extractor
normalization is fused into the device program, and the wav2vec2 + head model
runs over the whole batch at once (sub-batched to a fixed shape).

Window -> frame replication and the groupby-mean across overlaps
(get_prob_audio_8_cl.py:94-101 + run.py:90) are represented as index arrays
consumed by ops.fusion.segment_mean_by_frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core.config import AudioConfig
from avcer_tpu.models.audio_heads import ExprModel
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
from avcer_tpu.ops import audio as audio_ops


@dataclass
class AudioWindows:
    batch: np.ndarray  # [W, window_samples] float32 (not yet normalized)
    spans: list[tuple[int, int]]  # sample spans
    frame_ids: np.ndarray  # [R] replicated frame index per row
    window_of_row: np.ndarray  # [R] window index per row


def make_windows(wav: np.ndarray, cfg: AudioConfig, fps: float) -> AudioWindows:
    window = int(cfg.window_sec * cfg.sample_rate)
    step = int(cfg.step_sec * cfg.sample_rate)
    batch = audio_ops.extract_windows(wav, window, step, cfg.padding)
    spans = audio_ops.enumerate_windows(len(wav), window, step)
    frame_ids, window_of_row = [], []
    for wi, (s, e) in enumerate(spans):
        names = audio_ops.window_frame_names(s, e, cfg.sample_rate, fps)
        frame_ids.extend(names)
        window_of_row.extend([wi] * len(names))
    return AudioWindows(
        batch=batch,
        spans=spans,
        frame_ids=np.asarray(frame_ids, np.int64),
        window_of_row=np.asarray(window_of_row, np.int64),
    )


class AudioStage:
    def __init__(
        self,
        variables: dict[str, Any],
        cfg: AudioConfig,
        wav2vec2_config: Wav2Vec2Config | None = None,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.cfg = cfg
        w2v2 = wav2vec2_config or Wav2Vec2Config()
        if cfg.quant == "int8":
            import dataclasses

            w2v2 = dataclasses.replace(w2v2, quant=True)
        self.model = ExprModel(
            variant=cfg.head,
            num_classes=cfg.num_classes,
            wav2vec2_config=w2v2,
            dtype=dtype,
        )
        self.mesh = mesh
        if mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            variables = jax.device_put(variables, mesh_lib.replicated(mesh))
        else:
            # place host-initialized weights on device ONCE (numpy trees fed
            # to jit re-upload per call — ~640 MB per audio batch through a
            # relay link; see pipeline/detect.py)
            variables = jax.device_put(variables)
        self.variables = variables
        self._jit_forward = jax.jit(self._forward_impl)
        self._jit_forward_from_wav = jax.jit(
            self._forward_from_wav_impl, static_argnames=("padding",)
        )
        self._jit_shared_features = jax.jit(self._shared_features_impl)
        self._jit_from_features = jax.jit(self._from_features_impl)
        import threading

        self._real_calibrated = cfg.quant != "int8"
        self._calib_lock = threading.Lock()
        if cfg.quant == "int8":
            # static activation scales (see pipeline/detect.py) — seeded on
            # noise windows, refined with the first real clip's windows in
            # run_from_wav (running max)
            import numpy as _np

            window = int(cfg.window_sec * cfg.sample_rate)
            self.calibrate(
                _np.random.default_rng(0)
                .normal(size=(2, window))
                .astype(_np.float32)
            )

    def calibrate(self, windows: "np.ndarray") -> None:
        """Record per-projection activation max-abs ("act_scales") from real
        audio windows for the int8 path (cumulative running max)."""

        @jax.jit
        def _collect(variables, x):
            _, upd = self.model.apply(
                variables, audio_ops.feature_extractor_normalize(x),
                mutable=["act_scales"],
            )
            return upd["act_scales"]

        scales = _collect(self.variables, jnp.asarray(windows))
        if self.mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            scales = jax.device_put(scales, mesh_lib.replicated(self.mesh))
        else:
            scales = jax.device_put(scales)
        self.variables = {**self.variables, "act_scales": scales}

    def merge_act_scales(self, scales: dict) -> None:
        """Adopt persisted calibration scales (checkpoint.load_act_scales):
        elementwise running max with the current tree."""
        from avcer_tpu.models.layers import merge_act_scales_trees

        cur = self.variables.get("act_scales")
        if cur is None:
            return
        merged = merge_act_scales_trees(cur, scales)
        if self.mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            merged = jax.device_put(merged, mesh_lib.replicated(self.mesh))
        else:
            merged = jax.device_put(merged)
        self.variables = {**self.variables, "act_scales": merged}
        self._real_calibrated = True

    def _forward_impl(self, variables: dict, windows: jax.Array) -> jax.Array:
        x = audio_ops.feature_extractor_normalize(windows)
        return self.model.apply(variables, x).astype(jnp.float32)

    def _extract_impl(
        self,
        wav: jax.Array,  # [Lpad] float32, device-resident, zero-padded
        wav_len: jax.Array,  # scalar int32: true length
        starts: jax.Array,  # [B] int32 window starts
        padding: str = "mean",
    ) -> jax.Array:
        """On-device window extraction + padding (data/utils.py:63-89
        semantics): the overlapping 4 s / 0.5 s windows share ~87% of their
        samples, so uploading the raw wav ONCE and gathering on device cuts
        the audio upload ~8x."""
        window = int(self.cfg.window_sec * self.cfg.sample_rate)
        offs = jnp.arange(window, dtype=jnp.int32)[None, :]  # [1, L]
        idx = starts[:, None] + offs  # [B, L]
        in_range = idx < wav_len
        vals = wav[jnp.clip(idx, 0, wav.shape[0] - 1)] * in_range
        n = jnp.clip(wav_len - starts, 0, window)[:, None]  # [B, 1] valid count
        if padding == "repeat":
            safe_n = jnp.maximum(n, 1)
            rep_idx = starts[:, None] + offs % safe_n
            fill_vals = wav[jnp.clip(rep_idx, 0, wav.shape[0] - 1)]
            return jnp.where(offs < n, vals, fill_vals) * (n > 0)
        if padding == "mean":
            fill = jnp.sum(vals, axis=1, keepdims=True) / jnp.maximum(n, 1)
        else:  # constant
            fill = jnp.zeros_like(n, dtype=wav.dtype)
        return jnp.where(offs < n, vals, fill) * (n > 0)

    def _forward_from_wav_impl(
        self, variables: dict, wav: jax.Array, wav_len: jax.Array,
        starts: jax.Array, padding: str = "mean",
    ) -> jax.Array:
        out = self._extract_impl(wav, wav_len, starts, padding)
        x = audio_ops.feature_extractor_normalize(out)
        return self.model.apply(variables, x).astype(jnp.float32)

    # -- shared-extractor serving mode (AudioConfig.shared_extractor) -------
    def _shared_features_impl(
        self, variables: dict, wav: jax.Array, wav_len: jax.Array
    ) -> jax.Array:
        """Run the conv feature extractor ONCE over the whole (globally
        normalized) waveform. The 4 s / 0.5 s windows overlap 8x, and the
        extractor stack is VALID-padded, so stream features at frame
        25w + j equal window w's local frame j up to the normalization
        difference: the exact path normalizes each window by ITS OWN
        mean/std (HF processor, get_prob_audio_8_cl.py:88-90), here the
        whole wav is normalized once. Audio is near zero-mean, so the
        residual drift comes from per-window loudness variation — bounded
        by a drift test and documented as an opt-in approximation. Tail
        windows (shorter than 4 s) never use the shared stream: run_from_wav
        routes them through the exact per-window path so cfg.padding
        semantics hold."""
        mask = (jnp.arange(wav.shape[0]) < wav_len).astype(wav.dtype)
        n = jnp.maximum(wav_len, 1).astype(jnp.float32)
        mean = jnp.sum(wav * mask) / n
        var = jnp.sum(((wav - mean) ** 2) * mask) / n
        xn = ((wav - mean) / jnp.sqrt(var + 1e-7)) * mask
        return self.model.apply(variables, xn[None], w2v_mode="features_only")[0]

    def _from_features_impl(
        self, variables: dict, feats: jax.Array, starts: jax.Array
    ) -> jax.Array:
        """Gather per-window feature slices from the stream and run the
        transformer + head. Window starts must be multiples of the conv
        stride product (8000 % 320 == 0 for the reference geometry)."""
        import numpy as _np

        c = self.model.wav2vec2_config
        window = int(self.cfg.window_sec * self.cfg.sample_rate)
        fpw = c.num_output_frames(window)
        stride_total = int(_np.prod(c.conv_stride))
        f_idx = starts[:, None] // stride_total + jnp.arange(fpw)[None, :]
        f_idx = jnp.clip(f_idx, 0, feats.shape[0] - 1)
        win = feats[f_idx]  # [B, fpw, conv_dim]
        return self.model.apply(
            variables, win, w2v_mode="from_features"
        ).astype(jnp.float32)

    def run_from_wav(self, wav: np.ndarray, fps: float) -> tuple[np.ndarray, AudioWindows]:
        """Device-side windowing path: one wav upload, one logits fetch.
        Returns (logits [W, C], AudioWindows metadata for frame mapping)."""
        window = int(self.cfg.window_sec * self.cfg.sample_rate)
        step = int(self.cfg.step_sec * self.cfg.sample_rate)
        spans = audio_ops.enumerate_windows(len(wav), window, step)
        frame_ids, window_of_row = [], []
        for wi, (s, e) in enumerate(spans):
            names = audio_ops.window_frame_names(s, e, self.cfg.sample_rate, fps)
            frame_ids.extend(names)
            window_of_row.extend([wi] * len(names))
        meta = AudioWindows(
            batch=np.zeros((0, 0), np.float32),  # windows live on device
            spans=spans,
            frame_ids=np.asarray(frame_ids, np.int64),
            window_of_row=np.asarray(window_of_row, np.int64),
        )
        wav_len = len(wav)
        # pad the device wav so every gather index is in bounds
        wav_dev = jnp.asarray(
            np.pad(np.asarray(wav, np.float32), (0, window + 1))
        )
        starts_all = np.asarray([s for s, _ in spans], np.int32)
        if not self._real_calibrated and len(spans):
            # refine noise-seeded int8 scales with real windows (host
            # windowing; shape (2, window) matches the constructor's
            # calibration program so no extra compile). Locked against
            # concurrent run_many clips (see pipeline/detect.py).
            with self._calib_lock:
                if not self._real_calibrated:
                    window = int(self.cfg.window_sec * self.cfg.sample_rate)
                    step = int(self.cfg.step_sec * self.cfg.sample_rate)
                    wins = audio_ops.extract_windows(
                        np.asarray(wav, np.float32), window, step,
                        self.cfg.padding,
                    )
                    self.calibrate(np.resize(wins, (2, window)))
                    self._real_calibrated = True
        bs = self.cfg.batch_size

        def run_chunks(starts: np.ndarray, feats) -> list[np.ndarray]:
            outs = []
            handles = []
            for i in range(0, len(starts), bs):
                chunk = starts[i : i + bs]
                n = len(chunk)
                if n < bs:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n)])
                if feats is not None:
                    out = self._jit_from_features(
                        self.variables, feats, jnp.asarray(chunk)
                    )
                else:
                    out = self._jit_forward_from_wav(
                        self.variables, wav_dev, jnp.asarray(wav_len, jnp.int32),
                        jnp.asarray(chunk), padding=self.cfg.padding,
                    )
                handles.append((out, n))
            for h, n in handles:
                outs.append(np.asarray(h[:n]))
            return outs

        if not len(starts_all):
            return np.zeros((0, self.cfg.num_classes), np.float32), meta
        if self.cfg.shared_extractor:
            # conv extractor once per clip for the FULL windows; windows
            # shorter than 4 s (the clip tail) keep the exact per-window
            # path so cfg.padding semantics (mean/repeat fills) hold — the
            # shared stream can only express constant-zero tails. The only
            # remaining approximation is per-clip normalization of the full
            # windows (see _shared_features_impl).
            window = int(self.cfg.window_sec * self.cfg.sample_rate)
            is_full = np.asarray([e - s >= window for s, e in spans])
            feats = self._jit_shared_features(
                self.variables, wav_dev, jnp.asarray(wav_len, jnp.int32)
            )
            logits = np.empty((len(starts_all), self.cfg.num_classes), np.float32)
            if is_full.any():
                logits[is_full] = np.concatenate(
                    run_chunks(starts_all[is_full], feats)
                )
            if (~is_full).any():
                logits[~is_full] = np.concatenate(
                    run_chunks(starts_all[~is_full], None)
                )
            return logits, meta
        logits = np.concatenate(run_chunks(starts_all, None))
        return logits, meta

    def run(self, windows: AudioWindows) -> np.ndarray:
        """[W, L] -> [W, num_classes] raw logits. All batches dispatch before
        the first fetch (device compute overlaps transfers)."""
        batch = windows.batch
        w = batch.shape[0]
        bs = self.cfg.batch_size
        handles = []
        for s in range(0, w, bs):
            chunk = batch[s : s + bs]
            n = chunk.shape[0]
            if n < bs:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
            handles.append((self._jit_forward(self.variables, jnp.asarray(chunk)), n))
        if not handles:
            return np.zeros((0, self.cfg.num_classes), np.float32)
        # single fused device->host fetch (per-transfer latency dominates)
        return np.asarray(jnp.concatenate([h[:n] for h, n in handles], axis=0))
