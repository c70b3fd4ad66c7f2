"""Visual emotion stage: batched static CNN + windowed dynamic LSTM.

Replaces the per-frame loop of /root/reference/src/get_prob_video.py:67-204
with three fixed-shape device programs (CNN over all face crops, LSTM over
all step windows, fused normalization) plus O(T) host index bookkeeping.

Replicated semantics (get_prob_video.py):

- dynamic cadence ``step = round(5 * fps / 25)`` (:77)
- features pushed only on step frames (``idx % step == 0``) (:114-123)
- window bootstrap: first step frame after a reset fills the whole window
  with its own feature; afterwards the window slides (:117-120).
  Equivalently window[j] = features[max(segment_start, k - 9 + j)].
- a missing-face frame CLEARS the feature window (:169) but NOT last_output
- non-step present frames repeat the last step output, zeros before the
  first step output (:157-162)
- missing frames repeat the previously appended static+dynamic rows once a
  step output exists, zeros rows otherwise (:168-178)
- static probs are softmaxed on device (:107-109); dynamic rows stay raw
  logits (:127) — fusion softmaxes them later
- only tracklet id 1 (folder "00") feeds the visual models (:79: the
  reference hardcodes the "00" subfolder)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core import registry
from avcer_tpu.models.emotion_resnet import EmotionResNet50
from avcer_tpu.models.temporal_lstm import TemporalLSTM
from avcer_tpu.ops.image import vggface_normalize


@dataclass
class TemporalPlan:
    """Host-computed index plan for one clip."""

    present: np.ndarray  # [T] bool, face present on frame t
    present_index: np.ndarray  # [T] index into present-frame arrays, -1 if absent
    step_frames: np.ndarray  # [S] present-frame indices (into present arrays) of step frames
    window_idx: np.ndarray  # [S, 10] indices into step-feature array
    stat_src: np.ndarray  # [T] index into present static array, -1 => zeros row
    dyn_src: np.ndarray  # [T] index into step output array, -1 => zeros row


def build_temporal_plan(present: np.ndarray, step: int, window: int = 10) -> TemporalPlan:
    """O(T) host bookkeeping reproducing the reference's loop-state machine."""
    t_total = len(present)
    present_index = np.full(t_total, -1, np.int64)
    present_index[present] = np.arange(int(present.sum()))

    step_frames: list[int] = []  # present-array index of each step frame
    window_rows: list[list[int]] = []
    stat_src = np.full(t_total, -1, np.int64)
    dyn_src = np.full(t_total, -1, np.int64)

    seg_start = 0  # index into step_frames of the current reset segment start
    last_step_out = -1  # index of the latest step output, -1 = None
    last_stat = -1  # present-array index of the last appended static row
    for t in range(t_total):
        if present[t]:
            stat_src[t] = present_index[t]
            last_stat = present_index[t]
            if t % step == 0:
                k = len(step_frames)
                if k == len(window_rows):  # always true; append new window
                    row = [max(seg_start, k - (window - 1) + j) for j in range(window)]
                    window_rows.append(row)
                step_frames.append(present_index[t])
                last_step_out = k
            dyn_src[t] = last_step_out
        else:
            # reset the feature window segment
            seg_start = len(step_frames)
            if last_step_out >= 0:
                stat_src[t] = last_stat
                dyn_src[t] = last_step_out
            else:
                stat_src[t] = -1
                dyn_src[t] = -1
                last_stat = -1  # reference appends a zeros row; future missing
                # frames forward-fill it only via last_output, handled above
    return TemporalPlan(
        present=present,
        present_index=present_index,
        step_frames=np.asarray(step_frames, np.int64),
        window_idx=np.asarray(window_rows, np.int64).reshape(-1, window),
        stat_src=stat_src,
        dyn_src=dyn_src,
    )


class VisualStage:
    def __init__(
        self,
        static_variables: dict[str, Any],
        lstm_variables: dict[str, Any],
        num_classes: int = 7,
        dtype=jnp.bfloat16,
        batch_size: int = 64,
        mesh=None,
        quant: str = "none",
        s2d_stem: bool | str = False,
        fused: bool = False,
        fused_entries: bool = False,
    ):
        if s2d_stem == "auto":
            import jax as _jax

            s2d_stem = (_jax.default_backend() == "tpu"
                        and dtype == jnp.bfloat16)
        self.static_model = EmotionResNet50(
            num_classes=num_classes, dtype=dtype, quant=quant == "int8",
            s2d_stem=bool(s2d_stem),
            # single-chip only (pallas_call has no mesh partitioning rule);
            # under int8 the chains run TVBottleneckFolded's quant fold
            fused=bool(fused) and mesh is None,
            fused_entries=bool(fused_entries) and bool(fused)
            and mesh is None,
        )
        # act_scales collection must run through the QConv path (the folded
        # declarations never UPDATE the running max) — see pipeline/detect.py
        self._calib_model = (
            self.static_model
            if not (quant == "int8" and bool(fused) and mesh is None)
            else EmotionResNet50(
                num_classes=num_classes, dtype=dtype, quant=True,
                s2d_stem=bool(s2d_stem),
            )
        )
        self.lstm_model = TemporalLSTM(num_classes=num_classes, dtype=dtype)
        self.mesh = mesh
        if mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            static_variables = jax.device_put(static_variables, mesh_lib.replicated(mesh))
            lstm_variables = jax.device_put(lstm_variables, mesh_lib.replicated(mesh))
        else:
            # place host-initialized weights on device ONCE (numpy trees fed
            # to jit re-upload per call — see pipeline/detect.py)
            static_variables = jax.device_put(static_variables)
            lstm_variables = jax.device_put(lstm_variables)
        self.static_variables = static_variables
        self.lstm_variables = lstm_variables
        self.batch_size = batch_size
        self._jit_static = jax.jit(self._static_impl)
        self._jit_static_from_frames = jax.jit(self._static_from_frames_impl)
        self._jit_lstm = jax.jit(self._lstm_impl)
        import threading

        self.quant = quant
        self._real_calibrated = quant != "int8"
        self._jit_calib_frames = None
        self._calib_lock = threading.Lock()
        if quant == "int8":
            # static activation scales for the int8 CNN (see
            # pipeline/detect.py — dynamic per-conv scales cost more than
            # int8 saves); refined with the first real crops in
            # run_static_from_frames (running max)
            import numpy as _np

            self.calibrate(
                _np.random.default_rng(0).integers(
                    0, 255, (2, 224, 224, 3), _np.uint8
                )
            )

    def calibrate(self, crops: "np.ndarray") -> None:
        """Record per-conv activation max-abs from real 224x224 crops for
        the int8 path (cumulative running max — safe to re-run)."""

        @jax.jit
        def _collect(variables, x):
            _, upd = self._calib_model.apply(
                variables, vggface_normalize(x), mutable=["act_scales"]
            )
            return upd["act_scales"]

        scales = _collect(self.static_variables, jnp.asarray(crops))
        if self.mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            scales = jax.device_put(scales, mesh_lib.replicated(self.mesh))
        else:
            scales = jax.device_put(scales)
        self.static_variables = {**self.static_variables, "act_scales": scales}

    def merge_act_scales(self, scales: dict) -> None:
        """Adopt persisted calibration scales (checkpoint.load_act_scales):
        elementwise running max with the current tree."""
        from avcer_tpu.models.layers import merge_act_scales_trees

        cur = self.static_variables.get("act_scales")
        if cur is None:
            return
        merged = merge_act_scales_trees(cur, scales)
        if self.mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            merged = jax.device_put(merged, mesh_lib.replicated(self.mesh))
        else:
            merged = jax.device_put(merged)
        self.static_variables = {**self.static_variables, "act_scales": merged}
        self._real_calibrated = True

    def _shard(self, x) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(x)
        from avcer_tpu.parallel import mesh as mesh_lib

        return jax.device_put(x, mesh_lib.batch_sharding(self.mesh))

    def _static_impl(self, variables: dict, crops: jax.Array) -> jax.Array:
        """crops: [B, 224, 224, 3] uint8 BGR -> packed [B, 7 + 512]
        (softmax probs ++ relu features) — ONE device->host transfer."""
        x = vggface_normalize(crops)
        logits, feats = self.static_model.apply(variables, x)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.concatenate([probs, feats.astype(jnp.float32)], axis=-1)

    def _static_from_frames_impl(
        self, variables: dict, frames: jax.Array, idx: jax.Array, boxes: jax.Array
    ) -> jax.Array:
        """Device-resident path: gather [B] frames from the on-device frame
        buffer, crop+resize+normalize+CNN in one fused program — zero crop
        bytes cross the host link. Crop runs as one-hot matmuls (the MXU
        path; the general-gather version costs ~8x the CNN on TPU)."""
        from avcer_tpu.ops.image import crop_and_resize_onehot

        crops = crop_and_resize_onehot(frames, idx, boxes, 224)
        return self._static_impl(variables, crops)

    def _lstm_impl(self, variables: dict, windows: jax.Array):
        return self.lstm_model.apply(variables, windows).astype(jnp.float32)

    def fetch_crops(
        self, frames_dev: jax.Array, idx: np.ndarray, boxes: np.ndarray
    ) -> np.ndarray:
        """Fetch uint8 224x224 crops from the device frame buffer (used by
        the heatmap path to materialize ONLY the step-frame crops instead of
        forcing the whole clip through the host-crop path). Inputs are
        padded to a bucket size so one program serves all chunks."""
        from avcer_tpu.ops.image import crop_and_resize_onehot

        if not hasattr(self, "_jit_fetch_crops"):
            self._jit_fetch_crops = jax.jit(
                lambda f, i, b: crop_and_resize_onehot(f, i, b, 224)
            )
        n = idx.shape[0]
        cap = max(32, -(-n // 32) * 32)
        idx_p = np.zeros(cap, np.int32)
        idx_p[:n] = idx
        boxes_p = np.tile(np.array([[0, 0, 2, 2]], np.int32), (cap, 1))
        boxes_p[:n] = boxes
        out = self._jit_fetch_crops(
            frames_dev, jnp.asarray(idx_p), jnp.asarray(boxes_p)
        )
        return np.asarray(out[:n])

    def gradcam(
        self, crops: np.ndarray, class_idx: np.ndarray
    ) -> np.ndarray:
        """Grad-CAM masks for a crop batch (get_prob_video.py:131-152 path).
        Returns [B, h4, w4] normalized masks; render with utils.gradcam."""
        from avcer_tpu.utils.gradcam import gradcam_masks

        if not hasattr(self, "_jit_act4"):
            def act4_fn(variables, x):
                _logits, _feats, act4 = self.static_model.apply(
                    variables, vggface_normalize(x), return_act4=True
                )
                return act4.astype(jnp.float32)

            self._jit_act4 = jax.jit(act4_fn)
        act4 = self._jit_act4(self.static_variables, jnp.asarray(crops))
        params = {
            "fc1": jax.tree.map(
                lambda x: x.astype(jnp.float32),
                self.static_variables["params"]["fc1"],
            ),
            "fc2": jax.tree.map(
                lambda x: x.astype(jnp.float32),
                self.static_variables["params"]["fc2"],
            ),
        }
        masks = gradcam_masks(act4, params, jnp.asarray(class_idx))
        return np.asarray(masks)

    def ensure_calibrated_crops(self, crops: np.ndarray) -> None:
        """One-shot int8 act_scales refinement from the first real crops
        (no-op when already calibrated). Public so the cnn_stride serving
        path can calibrate on the SAME leading crops the per-frame path
        would use — otherwise the subset changes the calibration set and
        the int8 dynamic stream diverges between presets."""
        if self._real_calibrated or crops.shape[0] == 0:
            return
        # shape (2, ...) matches the constructor's calibration program.
        # Locked against concurrent run_many clips (see detect.py).
        with self._calib_lock:
            if not self._real_calibrated:
                self.calibrate(np.resize(crops, (2,) + crops.shape[1:]))
                self._real_calibrated = True

    def run_static(self, crops: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All present-face crops [P, 224, 224, 3] -> (probs [P, 7], feats [P, 512]).
        Fixed-shape batches; ALL batches dispatch before the first fetch so
        host transfers overlap device compute."""
        p = crops.shape[0]
        nc = self.static_model.num_classes
        if p == 0:
            return np.zeros((0, nc), np.float32), np.zeros((0, 512), np.float32)
        self.ensure_calibrated_crops(crops)
        bs = self.batch_size
        handles = []
        for s in range(0, p, bs):
            chunk = crops[s : s + bs]
            n = chunk.shape[0]
            if n < bs:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
            handles.append((self._jit_static(self.static_variables, self._shard(chunk)), n))
        packed = np.asarray(jnp.concatenate([h[:n] for h, n in handles], axis=0))
        return packed[:, :nc], packed[:, nc:]

    def ensure_calibrated_from_frames(
        self, frames_dev: "jax.Array", present_idx: np.ndarray,
        boxes: np.ndarray,
    ) -> None:
        """One-shot int8 act_scales refinement from the first real crops of
        the device-resident frame buffer (running max — see pipeline/
        detect.dispatch_wire; no-op when already calibrated). Public so the
        cnn_stride serving path can calibrate on the SAME leading present
        frames the per-frame path would use, keeping the int8 dynamic
        stream identical between presets. Locked against concurrent
        run_many clips."""
        p = present_idx.shape[0]
        if self._real_calibrated or p == 0:
            return
        with self._calib_lock:
            if not self._real_calibrated:
                if self._jit_calib_frames is None:
                    from avcer_tpu.ops.image import crop_and_resize_onehot

                    def _calib(variables, frames, idx, bxs):
                        crops = crop_and_resize_onehot(frames, idx, bxs, 224)
                        _, upd = self._calib_model.apply(
                            variables, vggface_normalize(crops),
                            mutable=["act_scales"],
                        )
                        return upd["act_scales"]

                    self._jit_calib_frames = jax.jit(_calib)
                sel = np.resize(np.arange(p), 8)  # fixed: repeat if p < 8
                scales = self._jit_calib_frames(
                    self.static_variables, frames_dev,
                    jnp.asarray(present_idx[sel].astype(np.int32)),
                    jnp.asarray(boxes[sel].astype(np.int32)),
                )
                self.static_variables = {
                    **self.static_variables,
                    "act_scales": jax.device_put(scales),
                }
                self._real_calibrated = True

    def run_static_from_frames(
        self,
        frames_dev: "jax.Array",  # [T, H, W, 3] uint8, device-resident
        present_idx: np.ndarray,  # [P] frame indices with a target face
        boxes: np.ndarray,  # [P, 4] int32 crop boxes in frame coords
    ) -> tuple[np.ndarray, np.ndarray]:
        """Device-crop path: one fused gather+crop+CNN program per sub-batch,
        ONE fetch for the whole clip chunk."""
        p = present_idx.shape[0]
        nc = self.static_model.num_classes
        if p == 0:
            return np.zeros((0, nc), np.float32), np.zeros((0, 512), np.float32)
        self.ensure_calibrated_from_frames(frames_dev, present_idx, boxes)
        bs = self.batch_size
        handles = []
        for s in range(0, p, bs):
            idx = present_idx[s : s + bs]
            bxs = boxes[s : s + bs]
            n = idx.shape[0]
            if n < bs:
                idx = np.concatenate([idx, np.repeat(idx[-1:], bs - n)])
                bxs = np.concatenate([bxs, np.repeat(bxs[-1:], bs - n, axis=0)])
            out = self._jit_static_from_frames(
                self.static_variables, frames_dev,
                jnp.asarray(idx.astype(np.int32)), jnp.asarray(bxs.astype(np.int32)),
            )
            handles.append((out, n))
        packed = np.asarray(
            jnp.concatenate([h[:n] for h, n in handles], axis=0)
        )  # single device->host fetch
        return packed[:, :nc], packed[:, nc:]

    def run_dynamic(self, feats: np.ndarray, plan: TemporalPlan) -> np.ndarray:
        """Step-frame features -> [S, 7] raw logits via batched LSTM."""
        if plan.step_frames.size == 0:
            return np.zeros((0, 7), np.float32)
        step_feats = feats[plan.step_frames]  # [S, 512]
        windows = step_feats[plan.window_idx]  # [S, 10, 512]
        s = windows.shape[0]
        bs = max(8, self.batch_size // 4)
        handles = []
        for i in range(0, s, bs):
            chunk = windows[i : i + bs]
            n = chunk.shape[0]
            if n < bs:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
            handles.append((self._jit_lstm(self.lstm_variables, self._shard(chunk)), n))
        return np.asarray(jnp.concatenate([h[:n] for h, n in handles], axis=0))

    def expand_to_frames(
        self,
        stat_probs: np.ndarray,  # [P, 7]
        dyn_logits: np.ndarray,  # [S, 7]
        plan: TemporalPlan,
        num_classes: int = 7,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Per-frame [T, 7] static probs and dynamic logits with the
        reference's forward-fill / zeros semantics."""
        t_total = plan.stat_src.shape[0]
        stat = np.zeros((t_total, num_classes), np.float32)
        dyn = np.zeros((t_total, num_classes), np.float32)
        m = plan.stat_src >= 0
        if stat_probs.size:
            stat[m] = stat_probs[plan.stat_src[m]]
        md = plan.dyn_src >= 0
        if dyn_logits.size:
            dyn[md] = dyn_logits[plan.dyn_src[md]]
        return stat, dyn


def dynamic_step_for_fps(fps: float) -> int:
    return registry.dynamic_step(fps)


def cnn_compute_sel(
    frame_ids: np.ndarray, step: int, cnn_stride: int,
    prev_gid: int | None = None,
) -> tuple[np.ndarray, int | None]:
    """Which present frames get a real static-CNN forward under
    ``VisualConfig.cnn_stride`` serving: a present frame is selected when
    the last computed present frame is >= ``cnn_stride`` FRAME IDS ago
    (greedy — this is what makes the "static probs held <= cnn_stride-1
    frames" bound hold in wall-clock even when face presence is sparse;
    a position-stride rule would stretch the hold by the gap factor) or
    when it is a dynamic step frame (``frame_id % step == 0`` — exactly
    the frames whose features feed the LSTM windows, so the dynamic
    stream stays bit-exact; see build_temporal_plan).

    ``frame_ids``: [P] global frame indices of present frames (this
    chunk); ``prev_gid``: the last computed frame id from earlier chunks
    (None at clip start — the first present frame is then always
    selected, so forward-fill always has an in-clip source). Returns
    ([P] bool mask, new prev_gid carry)."""
    n = frame_ids.shape[0]
    sel = np.zeros(n, bool)
    last = prev_gid
    for i in range(n):
        g = int(frame_ids[i])
        if last is None or g - last >= cnn_stride or g % step == 0:
            sel[i] = True
            last = g
    return sel, last


def subset_forward_fill(
    sel: np.ndarray, rows: np.ndarray, carry: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray | None]:
    """Expand ``rows`` computed on the ``sel`` subset back over the full
    sequence by forward-fill (the held-static-probs semantic of
    ``cnn_stride`` serving). ``carry`` is the final filled row of the
    previous chunk (None before any row exists — only reachable while
    ``sel`` has seen no True yet, which ``cnn_compute_sel`` guarantees
    cannot happen past the clip's first present frame). Returns
    (filled [P, D] rows, new carry)."""
    n = sel.shape[0]
    if n == 0:
        return rows[:0], carry
    src = np.cumsum(sel) - 1
    if carry is None and src[0] < 0:
        raise ValueError(
            "subset_forward_fill: leading unselected rows with no carry — "
            "the caller must select the clip's first present frame or "
            "thread the previous chunk's carry"
        )
    if rows.shape[0]:
        out = rows[np.maximum(src, 0)].copy()
        if src[0] < 0:
            out[src < 0] = carry
    else:
        out = np.tile(np.asarray(carry)[None], (n, 1))
    return out, out[-1].copy()
