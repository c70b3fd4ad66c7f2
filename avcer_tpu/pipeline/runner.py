"""End-to-end clip inference: detect -> visual -> audio -> fuse -> report.

The TPU restatement of run_inference (/root/reference/src/run.py:192-308).
Differences by design (SURVEY.md §7):

- frames flow detect -> crop -> CNN in memory as fixed-shape batches; the
  reference's JPEG round trip through the filesystem
  (get_face_images.py:57-60 -> get_prob_video.py:95) is an optional
  output-parity artifact (``save_face_crops``), not a pipeline stage. Crops
  here are lossless (no JPEG re-compression).
- JAX dispatch is asynchronous: the detector batch N+1 is enqueued while the
  host crops batch N, so decode/track/crop overlap device compute.
- all three model stages are bf16 batched programs; only the IoU tracker and
  index bookkeeping run on host.

Public surface parity: per-frame VS/VD probability CSVs (video order,
get_prob_video.py:182-202), audio window CSV (fusion order + frames column,
get_prob_audio_8_cl.py:125-136), compound txt + plot + RTF printout
(run.py:167-188, 288-308).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from avcer_tpu.core import registry
from avcer_tpu.core.config import PipelineConfig
from avcer_tpu.fusion import compound as compound_mod
from avcer_tpu.ops import image as image_ops
from avcer_tpu.pipeline import media
from avcer_tpu.pipeline.audio_stage import AudioStage
from avcer_tpu.pipeline.detect import DetectStage
from avcer_tpu.pipeline.tracker import IoUTracker
from avcer_tpu.pipeline.visual import VisualStage, build_temporal_plan

log = logging.getLogger("avcer_tpu")


@dataclass
class ClipResult:
    name_video: str
    fps: int
    total_frames: int
    stat_probs: np.ndarray  # [T, 7] video order
    dyn_logits: np.ndarray  # [T, 7] video order
    audio_window_logits: np.ndarray  # [W, C] fusion order
    audio_frame_ids: np.ndarray
    audio_window_of_row: np.ndarray
    compound: Optional[compound_mod.CompoundResult] = None
    timings: dict[str, float] = field(default_factory=dict)
    #: Per-frame chosen-face box in native int pixel coords (the reference's
    #: int-cast+clamp rule, get_face_images.py:53-56); rows of -1 where no
    #: face. Device path only (None on the host-crop path). Consumed by the
    #: profile drift study (experiments/exp_profile_drift.py).
    face_boxes: Optional[np.ndarray] = None  # [T, 4] int32 or None

    @property
    def rtf(self) -> float:
        # "wall" is the clip's true elapsed time; stage entries can overlap
        # (the audio stage runs concurrently with detect/visual) so their sum
        # exceeds wall when pipelining is working
        wall = self.timings.get("wall") or sum(
            v for k, v in self.timings.items() if k != "audio_concurrent"
        )
        return wall / (self.total_frames / max(self.fps, 1))


class Pipeline:
    """Holds the three model stages; reusable across clips (compiled once
    per input shape)."""

    def __init__(
        self,
        cfg: PipelineConfig,
        detect_vars: dict[str, Any],
        static_vars: dict[str, Any],
        lstm_vars: dict[str, Any],
        audio_vars: dict[str, Any],
        wav2vec2_config=None,
    ):
        import jax.numpy as jnp

        self.cfg = cfg
        dt = lambda name: jnp.dtype(name).type  # noqa: E731
        mesh = None
        if cfg.mesh.data > 1:
            from avcer_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.make_mesh(data=cfg.mesh.data, model=1)
        self.mesh = mesh
        self.detect = DetectStage(
            cfg.detector, detect_vars, dtype=dt(cfg.detector.dtype), mesh=mesh
        )
        self.visual = VisualStage(
            static_vars, lstm_vars, num_classes=cfg.visual.num_classes,
            dtype=dt(cfg.visual.dtype), batch_size=cfg.visual.batch_size, mesh=mesh,
            quant=cfg.visual.quant, s2d_stem=cfg.visual.s2d_stem,
            fused=cfg.visual.fused,
            fused_entries=getattr(cfg.visual, "fused_entries", False),
        )
        self.audio = AudioStage(
            audio_vars, cfg.audio, wav2vec2_config, dtype=dt(cfg.audio.dtype),
            mesh=mesh,
        )
        # kept for API compatibility; per-run code paths construct their own
        # tracker so that concurrent clips (run_many overlap) don't share
        # mutable tracker state
        self.tracker = IoUTracker(
            iou_threshold=cfg.detector.tracker_iou,
            minimum_face_size=cfg.detector.min_face_size,
        )

        import threading

        # save_outputs renders matplotlib figures (pyplot global state):
        # serialize it across the run_many overlap threads
        self._save_lock = threading.Lock()

    def _new_tracker(self) -> IoUTracker:
        return IoUTracker(
            iou_threshold=self.cfg.detector.tracker_iou,
            minimum_face_size=self.cfg.detector.min_face_size,
            # detections arrive every stride-th frame: extrapolate tracklet
            # motion across the gap (+ relaxed bootstrap threshold) or small
            # fast faces drop under the IoU match threshold and the target
            # identity (tracklet "00", get_prob_video.py:79) dies mid-clip
            # (tracker.py docstring); stride 1 stays reference-exact
            gap_frames=self.cfg.detector.stride,
        )

    # ------------------------------------------------------------------
    def detect_and_crop(
        self, reader: media.VideoReader, save_dir: Optional[str] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Run detection+tracking over the clip.

        Returns (present [T] bool for tracklet id 1, crops [P, 224, 224, 3]
        uint8 BGR in frame order). Detection batches are dispatched ahead so
        device detect overlaps host crop/track work.
        """
        import cv2

        tracker = self._new_tracker()
        cfg = self.cfg.detector
        if cfg.stride > 1:
            raise ValueError(
                "save_face_crops (host-crop path) requires detector"
                " stride=1 — the jpg dump is a per-frame parity artifact"
                " (also validated in PipelineConfig.__post_init__)"
            )
        present: list[bool] = []
        crops: list[np.ndarray] = []
        name_file = os.path.basename(reader.meta.path)
        base = name_file[: name_file.rfind(".")] if "." in name_file else name_file

        pending: list[tuple[np.ndarray, int, Any, float]] = []

        def drain(entry) -> None:
            frames_np, n_valid, packed, scale = entry
            det = self.detect.unpack(np.asarray(packed, np.float32), scale)
            boxes = det.boxes
            scores = det.scores
            keep = det.keep
            frame_idx0 = len(present)
            for i in range(n_valid):
                kept = keep[i]
                frame_dets = np.concatenate(
                    [boxes[i][kept], scores[i][kept][:, None]], axis=1
                )
                tids = tracker(frame_dets)
                got_target = False
                cb, cb_ok = image_ops.clamp_boxes_valid(
                    frame_dets, reader.meta.width, reader.meta.height
                )
                for j, (det_row, tid) in enumerate(zip(frame_dets, tids)):
                    if tid is None or not cb_ok[j]:
                        continue
                    x1, y1, x2, y2 = cb[j]
                    crop = frames_np[i, y1:y2, x1:x2]
                    if save_dir is not None:
                        c_path = os.path.join(save_dir, base, str(tid - 1).zfill(2))
                        os.makedirs(c_path, exist_ok=True)
                        cv2.imwrite(
                            os.path.join(
                                c_path, str(frame_idx0 + i).zfill(6) + ".jpg"
                            ),
                            crop,
                        )
                    if tid == 1 and not got_target:
                        crops.append(media.resize_nearest_np(crop, (224, 224)))
                        got_target = True
                present.append(got_target)

        for frames_np, n_valid in reader.batches(cfg.batch_size):
            packed, scale, _ = self.detect.dispatch(frames_np)  # async enqueue
            pending.append((frames_np, n_valid, packed, scale))
            if len(pending) > 2:  # keep 2 batches in flight on device
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))

        crops_arr = (
            np.stack(crops) if crops else np.zeros((0, 224, 224, 3), np.uint8)
        )
        return np.asarray(present, bool), crops_arr

    # ------------------------------------------------------------------
    def detect_track_device(
        self, reader: media.VideoReader, crop_step: Optional[int] = None,
        cnn_step: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray],
               np.ndarray]:
        """Fast path: frames stay ON DEVICE; detection results come back in
        ONE fetch per chunk; face crops are gathered on device and fed
        straight into the CNN (runner.run wires that). Returns
        (present [T], stat_probs [P, C], feats [P, 512], step_crops,
        face_boxes [T, 4] int32 native int-cast+clamp coords, -1 rows where
        no face).

        crop_step: if set, ALSO fetch uint8 224x224 crops for the frames on
        the dynamic-model cadence (absolute frame index % crop_step == 0 and
        present — exactly the frames build_temporal_plan marks as step
        frames), so the heatmap path gets its overlays without reverting the
        whole clip to host cropping. step_crops is None when crop_step is.

        cnn_step: the clip's dynamic step cadence, needed when
        VisualConfig.cnn_stride != 1 — the static CNN then runs only on
        every cnn_stride-th present frame plus every step frame
        (visual.cnn_compute_sel), with skipped frames holding the last
        computed row across chunk boundaries (visual.subset_forward_fill).

        Rationale: through a tunneled PJRT the per-transfer latency is
        ~0.5-1 s regardless of size, so the reference-style
        per-frame/per-batch round trips dominate everything. This path does
        2 synchronous fetches per ~512-frame chunk total.
        """
        import jax.numpy as jnp

        cfg = self.cfg.detector
        tracker = self._new_tracker()
        w_native, h_native = reader.meta.width, reader.meta.height
        present_all: list[bool] = []
        boxes_nat_all: list[np.ndarray] = []  # per-frame [4] int32 (-1 = none)
        stat_list, feats_list = [], []
        timing = os.environ.get("AVCER_TIMING") == "1"
        tacc: dict[str, float] = {"read": 0.0, "dispatch": 0.0, "fetch": 0.0,
                                  "track": 0.0, "cnn": 0.0}

        pending: list[tuple[Any, int, Any, float]] = []  # packed, n_valid, frames_dev, scale
        frames_in_pending = 0
        chunk_cap = max(cfg.batch_size, 512)
        stride = cfg.stride
        step_crops_list: list[np.ndarray] = []
        # cnn_stride serving state (VisualConfig.cnn_stride): 0 = align to
        # the dynamic step cadence; the held rows carry across chunks
        cs = self.cfg.visual.cnn_stride
        if cs == 0:
            cs = int(cnn_step or 1)
        cnn_prev_gid: Optional[int] = None  # last computed frame id
        carry_stat: Optional[np.ndarray] = None
        carry_feat: Optional[np.ndarray] = None

        # pass 1 — per DETECTED frame: tracker update + target (tid 1) box in
        # native float coords, validated with the reference's int-cast clamp
        # rule (get_face_images.py:53-56). Runs incrementally per batch as
        # each result lands (the tracker is sequential in frame order;
        # batches drain in dispatch order) so host tracker work overlaps the
        # uploads/compute of later batches.
        det_boxes_nat: list[Optional[np.ndarray]] = []

        def pass1(packed_np: np.ndarray, n_valid: int, scale: float) -> None:
            det = self.detect.unpack(packed_np, scale)
            for r in range(det.boxes.shape[0]):
                if r * stride >= n_valid:
                    break
                kept = det.keep[r]
                frame_dets = np.concatenate(
                    [det.boxes[r][kept], det.scores[r][kept][:, None]], axis=1
                )
                tids = tracker(frame_dets)
                tbox = None
                for det_row, tid in zip(frame_dets, tids):
                    if tid != 1:
                        continue
                    _, ok = image_ops.clamp_boxes_valid(
                        det_row[None], w_native, h_native
                    )
                    if ok[0]:
                        tbox = det_row[:4].astype(np.float64)
                    break  # tracker ids are unique; at most one tid 1
                det_boxes_nat.append(tbox)

        drained = 0  # batches in `pending` whose pass 1 already ran

        def drain_one() -> None:
            nonlocal drained
            packed, n_valid, _, scale = pending[drained]
            t0 = time.perf_counter()
            packed_np = np.asarray(packed, np.float32)
            tacc["fetch"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            pass1(packed_np, n_valid, scale)
            tacc["track"] += time.perf_counter() - t0
            drained += 1

        def flush_chunk() -> None:
            nonlocal pending, frames_in_pending, drained, det_boxes_nat
            nonlocal cnn_prev_gid, carry_stat, carry_feat
            if not pending:
                return
            while drained < len(pending):
                drain_one()
            frames_dev = jnp.concatenate([f for _, _, f, _ in pending], axis=0)
            t0 = time.perf_counter()
            scale = pending[0][3]
            n_valids = [n for _, n, _, _ in pending]
            bsz = pending[0][2].shape[0]
            lb_h, lb_w = frames_dev.shape[1], frames_dev.shape[2]

            # pass 2 — per frame: box = own detection (stride 1 reduces to
            # the reference's per-frame behavior) or linear interpolation
            # between the surrounding detections (held at chunk tails).
            # Vectorized: ~8 numpy ops instead of a per-frame Python loop.
            n_frames = int(sum(n_valids))
            frame_ids = np.concatenate(
                [np.arange(n) + bi * bsz for bi, n in enumerate(n_valids)]
            ) if n_valids else np.zeros(0, np.int64)
            nd = len(det_boxes_nat)
            ok = np.array([b is not None for b in det_boxes_nat], bool)
            bx = np.stack(
                [b if b is not None else np.zeros(4) for b in det_boxes_nat]
            ) if nd else np.zeros((0, 4))
            d = np.minimum(frame_ids // stride, max(nd - 1, 0))
            frac = (frame_ids % stride) / stride
            ok0 = ok[d] if nd else np.zeros(n_frames, bool)
            b0 = bx[d] if nd else np.zeros((n_frames, 4))
            d1 = np.minimum(d + 1, max(nd - 1, 0))
            use1 = (frac > 0) & (d + 1 < nd) & (ok[d1] if nd else False)
            b1 = np.where(use1[:, None], bx[d1] if nd else 0.0, b0)
            box_f = (1 - frac[:, None]) * b0 + frac[:, None] * b1
            # reference int-cast (truncation) + clamp (get_face_images.py:53-56)
            bi_, box_ok = image_ops.clamp_boxes_valid(box_f, w_native, h_native)
            x1, y1, x2, y2 = bi_.T
            present = ok0 & box_ok & ((frame_ids // stride) < nd)
            # clamp in native coords, then map to the on-device letterbox frame
            b = np.round(
                np.stack([x1, y1, x2, y2], axis=1).astype(np.float64) * scale
            ).astype(np.int32)
            b[:, 0] = np.minimum(b[:, 0], lb_w - 2)
            b[:, 1] = np.minimum(b[:, 1], lb_h - 2)
            b[:, 2] = np.maximum(b[:, 2], b[:, 0] + 1)
            b[:, 3] = np.maximum(b[:, 3], b[:, 1] + 1)
            global_base = len(present_all)
            present_all.extend(present.tolist())
            boxes_nat_all.append(
                np.where(present[:, None], bi_.astype(np.int32), -1)
            )
            present_idx = frame_ids[present].astype(np.int32)
            boxes_lb = b[present]
            if crop_step:
                gsel = present & (
                    (global_base + frame_ids) % crop_step == 0
                )
                if gsel.any():
                    step_crops_list.append(
                        self.visual.fetch_crops(
                            frames_dev, frame_ids[gsel].astype(np.int32),
                            b[gsel],
                        )
                    )
            tacc["track"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            if present_idx.size:
                if cs > 1 and cnn_step:
                    from avcer_tpu.pipeline.visual import (
                        cnn_compute_sel, subset_forward_fill,
                    )

                    # int8: refine act_scales on the SAME leading present
                    # frames the per-frame path would use, BEFORE the
                    # subset changes which crops the first forward sees —
                    # keeps the quantized dynamic stream identical between
                    # strided and per-frame presets
                    if hasattr(self.visual, "ensure_calibrated_from_frames"):
                        self.visual.ensure_calibrated_from_frames(
                            frames_dev, present_idx, boxes_lb
                        )
                    gids = global_base + present_idx.astype(np.int64)
                    sel, cnn_prev_gid = cnn_compute_sel(
                        gids, int(cnn_step), cs, cnn_prev_gid
                    )
                    nc = self.cfg.visual.num_classes
                    if sel.any():
                        stat_c, feats_c = self.visual.run_static_from_frames(
                            frames_dev, present_idx[sel], boxes_lb[sel]
                        )  # second fetch
                    else:
                        stat_c = np.zeros((0, nc), np.float32)
                        feats_c = np.zeros((0, 512), np.float32)
                    stat, carry_stat = subset_forward_fill(
                        sel, stat_c, carry_stat
                    )
                    feats, carry_feat = subset_forward_fill(
                        sel, feats_c, carry_feat
                    )
                else:
                    stat, feats = self.visual.run_static_from_frames(
                        frames_dev, present_idx, boxes_lb
                    )  # second fetch
                stat_list.append(stat)
                feats_list.append(feats)
            tacc["cnn"] += time.perf_counter() - t0
            pending = []
            frames_in_pending = 0
            det_boxes_nat = []
            drained = 0

        # decode + letterbox + wire conversion run in the prefetch thread so
        # they overlap device dispatch and relay I/O on this 1-core host
        can_prepare_ahead = hasattr(self.detect, "prepare_wire")

        def prepared():
            for frames_np, n_valid in reader.batches(cfg.batch_size):
                if can_prepare_ahead:
                    wire, scale = self.detect.prepare_wire(frames_np)
                    yield wire, scale, n_valid, frames_np.shape[0]
                else:
                    yield frames_np, None, n_valid, frames_np.shape[0]

        t0 = time.perf_counter()
        for item in media.prefetch_iter(prepared()):
            wire, scale, n_valid, nbatch = item
            tacc["read"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            if can_prepare_ahead:
                packed, scale, frames_dev = self.detect.dispatch_wire(wire, scale)
            else:
                packed, scale, frames_dev = self.detect.dispatch(wire)
            if hasattr(packed, "copy_to_host_async"):
                packed.copy_to_host_async()  # start d2h as soon as it's ready
            pending.append((packed, n_valid, frames_dev, scale))
            tacc["dispatch"] += time.perf_counter() - t0
            frames_in_pending += nbatch
            # drain older batches incrementally: the host tracker pass runs
            # while later batches are still uploading/executing, instead of
            # as a serial tail after the whole chunk
            while len(pending) - drained > 2:
                drain_one()
            if frames_in_pending >= chunk_cap:
                flush_chunk()
            t0 = time.perf_counter()
        flush_chunk()
        if timing:
            log.warning("detect_track_device timing: %s",
                        {k: round(v, 3) for k, v in tacc.items()})

        stat = (
            np.concatenate(stat_list)
            if stat_list
            else np.zeros((0, self.cfg.visual.num_classes), np.float32)
        )
        feats = (
            np.concatenate(feats_list) if feats_list else np.zeros((0, 512), np.float32)
        )
        step_crops = None
        if crop_step:
            step_crops = (
                np.concatenate(step_crops_list)
                if step_crops_list
                else np.zeros((0, 224, 224, 3), np.uint8)
            )
        face_boxes = (
            np.concatenate(boxes_nat_all)
            if boxes_nat_all
            else np.zeros((0, 4), np.int32)
        )
        return np.asarray(present_all, bool), stat, feats, step_crops, face_boxes

    # ------------------------------------------------------------------
    def _audio_task(
        self, path_video: str, wav: Optional[np.ndarray], fps: float,
        duration_frames: int,
    ) -> tuple[np.ndarray, Any, float]:
        """Audio half of a clip: wav extraction + device windowing + model.
        Data-independent of detection, so ``run`` executes it on a worker
        thread concurrently with the detect/visual stages (the reference runs
        the three stages strictly serially — run.py:221-308)."""
        import subprocess

        t0 = time.perf_counter()
        if wav is None:
            try:
                wav = media.extract_audio(path_video, self.cfg.audio.sample_rate)
            except (RuntimeError, FileNotFoundError,
                    subprocess.CalledProcessError) as e:
                # CalledProcessError: ffmpeg exits non-zero for videos with
                # no audio stream — same silent-track fallback applies
                log.warning("audio unavailable for %s: %s", path_video, e)
                if duration_frames <= 0:
                    # no frame-count metadata either: let run() redo the
                    # silent-track fallback once the decoded count is known
                    return None, None, time.perf_counter() - t0
                wav = np.zeros(
                    int(duration_frames / max(fps, 1) * self.cfg.audio.sample_rate),
                    np.float32,
                )
        audio_logits, audio_windows = self.audio.run_from_wav(wav, fps)
        return audio_logits, audio_windows, time.perf_counter() - t0

    # ------------------------------------------------------------------
    def run(self, path_video: str, path_save: str = "", wav: Optional[np.ndarray] = None) -> ClipResult:
        from concurrent.futures import ThreadPoolExecutor

        reader = media.VideoReader(path_video)
        meta = reader.meta
        name_video = os.path.basename(path_video)
        name_video = name_video[: name_video.rfind(".")] if "." in name_video else name_video

        timings: dict[str, float] = {}
        wall0 = time.perf_counter()
        # the audio stage has no data dependency on detection: overlap it
        # with the detect/visual device programs
        executor = ThreadPoolExecutor(max_workers=1)
        audio_future = executor.submit(
            self._audio_task, path_video, wav, meta.fps, meta.total_frames
        )
        # non-blocking shutdown right after submit: the queued task still
        # runs and the worker exits once it finishes, so an exception in the
        # detect/visual stages can't leak a live non-daemon thread
        executor.shutdown(wait=False)

        t0 = time.perf_counter()
        step = registry.dynamic_step(meta.fps)
        # the host-crop path materializes every crop (needed for the jpg
        # dump); heatmaps only need the STEP-frame crops, which the device
        # path fetches on the side (detect_track_device crop_step) instead
        # of reverting the whole clip to per-frame host cropping
        use_host_crops = bool(self.cfg.save_face_crops)
        want_heatmaps = bool(self.cfg.heatmaps and path_save)
        crops = step_crops = face_boxes = None
        if use_host_crops:
            save_dir = path_save if self.cfg.save_face_crops and path_save else None
            present, crops = self.detect_and_crop(reader, save_dir)
            stat_probs_p = feats_p = None
        else:
            (present, stat_probs_p, feats_p, step_crops,
             face_boxes) = self.detect_track_device(
                reader, crop_step=step if want_heatmaps else None,
                cnn_step=step,
            )
        reader.release()
        total_frames = meta.total_frames or len(present)
        if len(present) < total_frames:  # decoder returned fewer frames
            total_frames = len(present)
        timings["detect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if stat_probs_p is None:
            cs = self.cfg.visual.cnn_stride
            if cs == 0:
                cs = step
            if cs > 1 and len(crops):
                from avcer_tpu.pipeline.visual import (
                    cnn_compute_sel, subset_forward_fill,
                )

                # same leading-crop int8 calibration as the per-frame path
                # (see detect_track_device's cs > 1 branch)
                if hasattr(self.visual, "ensure_calibrated_crops"):
                    self.visual.ensure_calibrated_crops(crops)
                gids = np.flatnonzero(present)
                sel, _ = cnn_compute_sel(gids, step, cs)
                stat_c, feats_c = self.visual.run_static(crops[sel])
                stat_probs_p, _ = subset_forward_fill(sel, stat_c, None)
                feats_p, _ = subset_forward_fill(sel, feats_c, None)
            else:
                stat_probs_p, feats_p = self.visual.run_static(crops)
        plan = build_temporal_plan(present[:total_frames], step)
        dyn_logits_s = self.visual.run_dynamic(feats_p, plan)
        stat_probs, dyn_logits = self.visual.expand_to_frames(
            stat_probs_p, dyn_logits_s, plan, self.cfg.visual.num_classes
        )
        timings["visual"] = time.perf_counter() - t0

        if want_heatmaps and plan.step_frames.size:
            if crops is not None:
                heat_crops, subset = crops, False
            else:
                # device-path fetch covers the full decode; the plan may be
                # truncated to the metadata frame count — prefix-aligned
                heat_crops, subset = step_crops[: plan.step_frames.size], True
            self._save_heatmaps(
                heat_crops, stat_probs_p, dyn_logits_s, plan, name_video,
                path_save, crops_are_step_subset=subset,
            )

        t0 = time.perf_counter()
        audio_logits, audio_windows, audio_thread_sec = audio_future.result()
        if audio_logits is None:  # silent-track fallback needed frame count
            silent = np.zeros(
                int(total_frames / max(meta.fps, 1) * self.cfg.audio.sample_rate),
                np.float32,
            )
            audio_logits, audio_windows = self.audio.run_from_wav(silent, meta.fps)
        # "audio" = wall time this stage ADDED beyond the overlap; the
        # thread-internal duration is reported separately
        timings["audio"] = time.perf_counter() - t0
        timings["audio_concurrent"] = audio_thread_sec

        t0 = time.perf_counter()
        audio_frame_logits = compound_mod.align_audio_to_frames(
            audio_logits, audio_windows.frame_ids, audio_windows.window_of_row,
            total_frames,
        )
        result = compound_mod.decide(
            stat_probs, dyn_logits, audio_frame_logits, name_video, self.cfg.fusion
        )
        timings["fusion"] = time.perf_counter() - t0
        timings["wall"] = time.perf_counter() - wall0

        clip = ClipResult(
            name_video=name_video,
            fps=meta.fps,
            total_frames=total_frames,
            stat_probs=stat_probs,
            dyn_logits=dyn_logits,
            audio_window_logits=audio_logits,
            audio_frame_ids=audio_windows.frame_ids,
            audio_window_of_row=audio_windows.window_of_row,
            compound=result,
            timings=timings,
            face_boxes=(
                face_boxes[:total_frames] if face_boxes is not None else None
            ),
        )
        if path_save:
            with self._save_lock:
                self.save_outputs(clip, path_save)
        return clip

    # ------------------------------------------------------------------
    def run_many(
        self, paths: list[str], path_save: str = "", overlap: int = 2
    ) -> list[ClipResult]:
        """Serve a batch of clips. Compiled programs are shared across clips
        (shapes are bucketed), so only the first clip pays compile cost, and
        up to ``overlap`` clips run concurrently so clip N+1's decode/detect
        overlaps clip N's visual/audio/fusion (the reference re-runs its
        whole serial pipeline per video). Per-clip state (tracker, plans) is
        local to each run; the jitted stage programs are shared and
        thread-safe (dispatch is async and the device serializes programs)."""
        if overlap <= 1 or len(paths) == 1:
            return [self.run(p, path_save) for p in paths]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=overlap) as ex:
            futures = [ex.submit(self.run, p, path_save) for p in paths]
            return [f.result() for f in futures]

    # ------------------------------------------------------------------
    def _save_heatmaps(
        self, crops: np.ndarray, stat_probs_p: np.ndarray,
        dyn_logits_s: np.ndarray, plan, name_video: str, path_save: str,
        crops_are_step_subset: bool = False,
    ) -> None:
        """Grad-CAM overlays for step frames (get_prob_video.py:131-152:
        heatmaps are generated on the dynamic cadence; the CAM class is the
        argmax of the chosen model; overlays saved as jpgs under
        heatmaps_<model>/)."""
        import cv2

        from avcer_tpu.utils.gradcam import render_heatmap

        mode = self.cfg.heatmaps
        out_dir = os.path.join(path_save, name_video, f"heatmaps_{mode}")
        os.makedirs(out_dir, exist_ok=True)
        step_crop_idx = plan.step_frames  # indices into present-crop arrays
        if mode == "dynamic":
            classes = dyn_logits_s.argmax(-1)
        else:
            classes = stat_probs_p[step_crop_idx].argmax(-1)
        # map present-array index -> original frame number for filenames
        present_frames = np.nonzero(plan.present)[0]
        bs = 32
        for s in range(0, len(step_crop_idx), bs):
            idx = step_crop_idx[s : s + bs]
            # crops either span every present frame (host path, index by
            # present-array position) or only the step cadence (device path)
            batch = crops[s : s + len(idx)] if crops_are_step_subset else crops[idx]
            masks = self.visual.gradcam(batch, classes[s : s + len(idx)])
            for j, ci in enumerate(idx):
                frame_no = present_frames[ci]
                overlay = render_heatmap(
                    masks[j], batch[j], use_rgb=False, image_weight=0.8
                )
                cv2.imwrite(
                    os.path.join(out_dir, f"{frame_no:06d}.jpg"), overlay
                )

    # ------------------------------------------------------------------
    def save_outputs(self, clip: ClipResult, path_save: str) -> None:
        import pandas as pd

        with pd.option_context("mode.string_storage", "python"):
            self._save_outputs_impl(clip, path_save, pd)

    def _save_outputs_impl(self, clip: ClipResult, path_save: str, pd) -> None:
        # python string storage + object-dtype column Indexes: building an
        # arrow-backed string array from a worker thread segfaults inside
        # pyarrow in this runtime (deterministic, run_many overlap>=2 —
        # the A/B record in exp_r9_results.jsonl); the CSV text is
        # byte-identical either way
        def cols(names: list) -> "pd.Index":
            return pd.Index(list(names), dtype=object)

        os.makedirs(path_save, exist_ok=True)
        emo_video = cols(registry.VIDEO_EMOTIONS)
        pd.DataFrame(clip.dyn_logits, columns=emo_video).to_csv(
            os.path.join(path_save, f"dynamic__{clip.name_video}.csv"), index=False
        )
        pd.DataFrame(clip.stat_probs, columns=emo_video).to_csv(
            os.path.join(path_save, f"static__{clip.name_video}.csv"), index=False
        )

        # audio CSV: window rows replicated per covered frame name
        # (get_prob_audio_8_cl.py:94-101, 125-136); the 7-class front-end
        # writes under an audio_{padding}_{step} subdir
        # (get_prob_audio_7_cl.py:153)
        emo_audio = cols(
            registry.AUDIO_EMOTIONS_8
            if self.cfg.audio.num_classes == 8
            else registry.AUDIO_EMOTIONS_7
        )
        rows = clip.audio_window_logits[clip.audio_window_of_row]
        adf = pd.DataFrame(rows, columns=emo_audio)
        adf["frames"] = [
            str(i).zfill(6) + ".jpg" for i in clip.audio_frame_ids
        ]
        audio_dir = path_save
        if self.cfg.audio.num_classes != 8:
            audio_dir = os.path.join(
                path_save, f"audio_{self.cfg.audio.padding}_{self.cfg.audio.step_sec}"
            )
            os.makedirs(audio_dir, exist_ok=True)
        adf.to_csv(os.path.join(audio_dir, f"audio__{clip.name_video}.csv"), index=False)

        fcfg = self.cfg.fusion
        if self.cfg.save_probs and clip.compound is not None:
            ce_dir = os.path.join(path_save, "DF_C_EXPR_DB")
            os.makedirs(ce_dir, exist_ok=True)
            compound_mod.save_compound_txt(
                os.path.join(
                    ce_dir,
                    f"C_EXPR_DB_av_{fcfg.ce_weights_type}_{fcfg.ce_mask}_{clip.name_video}.txt",
                ),
                clip.compound.image_locations,
                clip.compound.av,
            )
        if self.cfg.save_plot and clip.compound is not None:
            from avcer_tpu.utils import viz

            # "pedicted" typo preserved for output-name parity (run.py:286)
            rule = "Rule 2" if fcfg.ce_weights_type else ("Rule 1" if fcfg.ce_mask else "none")
            viz.plot_compound_expression_prediction(
                {
                    "VS": clip.compound.vs,
                    "VD": clip.compound.vd,
                    "A": clip.compound.a,
                    "AV": clip.compound.av,
                },
                save_path=os.path.join(path_save, f"pedicted_CEs_{rule}.jpg"),
                title="Сompound expressions predicted by models",
            )
