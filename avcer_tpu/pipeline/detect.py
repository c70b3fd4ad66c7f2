"""Face detection stage: one jitted program per static input shape.

Replaces the reference's per-frame host loop (get_face_images.py:38-63 +
retina_face_predictor.py:59-109): normalize -> RetinaFace -> decode ->
scale -> fixed-K NMS, all on device, batched over frames. Only the tracker
(sequential) stays on host.

Two input modes (DetectorConfig.long_side):
- bucket mode (default): frames are letterbox-resized on host so the long
  side is fixed; one compiled program serves every video.
- native mode (long_side=0): frames are padded up to a multiple of 32; the
  anchor grid matches the reference's native-resolution run.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core.config import DetectorConfig
from avcer_tpu.ops import boxes as box_ops
from avcer_tpu.ops import nms as nms_ops
from avcer_tpu.ops.image import letterbox_params, retinaface_normalize
from avcer_tpu.models.retinaface import RetinaFace

log = logging.getLogger(__name__)


@dataclass
class Detections:
    """Fixed-shape per-batch detections (native-resolution pixel coords)."""

    boxes: np.ndarray  # [B, K, 4] float32 xyxy
    scores: np.ndarray  # [B, K]
    keep: np.ndarray  # [B, K] bool
    landmarks: np.ndarray  # [B, K, 10]


class DetectStage:
    #: int8 drift watch: batches between sampled re-calibration forwards
    #: (64 x batch 32 = ~82 s of 25 fps video per sample)
    RECALIB_EVERY = 64

    def __init__(
        self, cfg: DetectorConfig, variables: dict[str, Any], dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.cfg = cfg
        if cfg.stride > 1 and cfg.batch_size % cfg.stride:
            raise ValueError(
                f"detector stride {cfg.stride} must divide batch_size"
                f" {cfg.batch_size} (keeps the detection cadence uniform"
                " across fixed-shape batches)"
            )
        s2d = cfg.s2d_stem
        if s2d == "auto":
            s2d = jax.default_backend() == "tpu" and dtype == jnp.bfloat16
        self.model = RetinaFace(
            backbone=cfg.backbone, dtype=dtype, s2d_stem=bool(s2d),
            quant=cfg.quant == "int8",
            # single-chip only: a pallas_call under the sharded-batch mesh
            # jit has no partitioning rule, so XLA would all-gather the
            # batch onto every chip instead of splitting the kernel grid.
            # Under int8 the chains run TVBottleneckFolded's quant fold —
            # same act_scales tree as the QConv path.
            fused_layer1=bool(cfg.fused_layer1) and mesh is None,
            fused_tails=bool(cfg.fused_tails) and mesh is None,
            fused_entries=bool(getattr(cfg, "fused_entries", False))
            and bool(cfg.fused_tails) and mesh is None,
            fused_ssh=bool(getattr(cfg, "fused_ssh", False)) and mesh is None,
            fused_fpn=bool(getattr(cfg, "fused_fpn", False))
            and bool(getattr(cfg, "fused_ssh", False)) and mesh is None,
        )
        # act_scales collection must run through the QConv path (the folded
        # declarations never UPDATE the running max) — a fused-free twin
        # over the same variables serves every calibration forward
        self._calib_model = (
            self.model
            if not (cfg.quant == "int8"
                    and (cfg.fused_layer1 or cfg.fused_tails
                         or getattr(cfg, "fused_ssh", False)))
            else RetinaFace(
                backbone=cfg.backbone, dtype=dtype, s2d_stem=bool(s2d),
                quant=True,
            )
        )
        self.mesh = mesh
        if mesh is not None:
            # multi-chip inference: replicate weights, shard the frame batch
            from avcer_tpu.parallel import mesh as mesh_lib

            variables = jax.device_put(variables, mesh_lib.replicated(mesh))
        else:
            # weights are initialized/converted on HOST (checkpoint.resolve);
            # place them on device ONCE — passing host numpy trees into a
            # jitted call re-uploads every weight on EVERY call (~110 MB per
            # detect batch through a relay link: the whole stage becomes
            # upload-bound)
            variables = jax.device_put(variables)
        self.variables = variables
        self._jit_forward = jax.jit(self._forward_impl)
        import threading

        self._real_calibrated = False
        self._jit_calib_wire = None
        self._calib_lock = threading.Lock()
        self._batches_seen = 0
        if cfg.quant == "int8":
            # static activation scales: without them every conv pays a
            # full-tensor max reduction per call, which costs more than int8
            # saves (experiments/exp_r4c). Default calibration on noise
            # frames bounds the first-layer ranges; call ``calibrate`` with
            # representative frames for production serving.
            import numpy as _np

            self.calibrate(
                _np.random.default_rng(0).integers(
                    0, 255, (2, 160, 160, 3), _np.uint8
                )
            )

    def calibrate(self, frames: "np.ndarray") -> None:
        """Record per-conv activation max-abs ("act_scales") from real
        frames for the int8 path. Cheap (one forward); can be re-run —
        scales only grow (running max), so calibration is cumulative."""
        x = retinaface_normalize(jnp.asarray(frames))

        @jax.jit
        def _collect(variables, x):
            _, upd = self._calib_model.apply(
                variables, x, mutable=["act_scales"])
            return upd["act_scales"]

        scales = _collect(self.variables, x)
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

    def _shard_input(self, x: jax.Array | np.ndarray) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(x)
        from avcer_tpu.parallel import mesh as mesh_lib

        return jax.device_put(x, mesh_lib.batch_sharding(self.mesh))

    def _forward_impl(
        self, variables: dict, wire: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """wire: [B, H, W, 3] uint8 BGR, or [B, H*3//2, W] uint8 I420
        (transfer_format) — already resized/padded.

        Returns (packed [B, K, 16] float32 (boxes 0:4, score 4, keep 5,
        landmarks 6:16), frames_bgr [B, H, W, 3] uint8). The packed array is
        a single fused device->host transfer per batch instead of four
        (transfer latency through the PJRT tunnel dominates small fetches);
        frames_bgr stays device-resident for the crop stage."""
        from avcer_tpu.ops.image import i420_to_bgr_device

        if wire.ndim == 3:  # I420 wire format
            h = wire.shape[1] * 2 // 3
            w = wire.shape[2]
            frames = i420_to_bgr_device(wire, h, w)
        else:
            frames = wire
        h, w = frames.shape[1], frames.shape[2]
        det_frames = frames
        if self.cfg.stride > 1:
            # detect-stride mode: run the network on every Nth frame only
            # (static slice, fixed shape); the full frame buffer still goes
            # to the CNN crop stage
            det_frames = frames[:: self.cfg.stride]
        x = retinaface_normalize(det_frames)
        loc, conf, landms = self.model.apply(variables, x)
        priors = jnp.asarray(box_ops.prior_boxes((h, w)))
        scale = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = box_ops.decode_boxes(loc.astype(jnp.float32), priors) * scale
        scores = conf[..., 1]
        lscale = jnp.tile(jnp.asarray([w, h], jnp.float32), 5)
        landms = box_ops.decode_landmarks(landms.astype(jnp.float32), priors) * lscale
        k = min(self.cfg.nms_candidates, 64)
        cand_boxes, cand_scores, valid, idx = nms_ops.topk_candidates(
            boxes, scores, k, self.cfg.threshold
        )
        # "auto" resolves to the XLA loop: in-program loop timing (the only
        # reliable microbench through this relay — experiments/exp_r4b) puts
        # the XLA fori-loop NMS at 0.093 ms/batch vs 0.346 for the Pallas
        # kernel on v5e; the earlier per-dispatch slope that favored Pallas
        # was measuring relay jitter. The Pallas kernel stays available
        # (bit-exact, tested) as an explicit opt-in.
        use_pallas = self.cfg.nms_impl == "pallas"
        if use_pallas:
            from avcer_tpu.ops.pallas.nms_kernel import pallas_nms_mask

            keep = pallas_nms_mask(cand_boxes, valid, self.cfg.nms_thresh)
        else:
            keep = nms_ops.nms_mask(cand_boxes, valid, self.cfg.nms_thresh)
        cand_landms = jnp.take_along_axis(landms, idx[..., None], axis=1)
        packed = jnp.concatenate(
            [cand_boxes, cand_scores[..., None],
             keep.astype(jnp.float32)[..., None], cand_landms], axis=-1,
        )
        return packed, frames

    def prepare_batch(self, frames: np.ndarray) -> tuple[np.ndarray, float]:
        """Host prep: letterbox to the configured bucket (or pad to /32).
        Returns (device_input, scale) with scale mapping bucket -> native."""
        import cv2

        b, h, w = frames.shape[:3]
        if self.cfg.long_side > 0:
            nh, nw, scale = letterbox_params(h, w, self.cfg.long_side)
            if (nh, nw) != (h, w):
                out = np.empty((b, nh, nw, 3), dtype=frames.dtype)
                for i in range(b):
                    out[i] = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_LINEAR)
                frames = out
            return frames, scale
        pad_h = (-h) % 32
        pad_w = (-w) % 32
        if pad_h or pad_w:
            frames = np.pad(frames, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return frames, 1.0

    def prepare_wire(self, frames: np.ndarray) -> tuple[np.ndarray, float]:
        """Host-side prep to the wire format (letterbox + optional I420).
        Safe to run in a prefetch thread (pure cv2/numpy, releases the GIL)."""
        from avcer_tpu.ops.image import bgr_batch_to_i420

        prepped, scale = self.prepare_batch(frames)
        if self.cfg.transfer_format == "i420":
            return bgr_batch_to_i420(prepped), scale
        return prepped, scale

    def dispatch_wire(self, wire: np.ndarray, scale: float) -> tuple[jax.Array, float, jax.Array]:
        """Device half of dispatch for pre-prepared wire data."""
        if self.cfg.quant == "int8" and not self._real_calibrated:
            # refine the noise-seeded activation scales with the FIRST real
            # batch (running max: real activations seen here can never be
            # clipped later). One extra forward + compile, once per process.
            # Locked: run_many dispatches clips concurrently, and an
            # unsynchronized check-then-set would let a second clip's
            # calibration overwrite (not max with) the first's.
            with self._calib_lock:
                if not self._real_calibrated:
                    if self._jit_calib_wire is None:
                        def _calib(variables, w):
                            from avcer_tpu.ops.image import i420_to_bgr_device

                            if w.ndim == 3:
                                frames = i420_to_bgr_device(
                                    w, w.shape[1] * 2 // 3, w.shape[2]
                                )
                            else:
                                frames = w
                            x = retinaface_normalize(frames[:2])
                            _, upd = self._calib_model.apply(
                                variables, x, mutable=["act_scales"]
                            )
                            new = upd["act_scales"]
                            old = variables["act_scales"]
                            growth = jnp.max(
                                jnp.stack([
                                    jnp.max(n / jnp.maximum(o, 1e-10))
                                    for n, o in zip(
                                        jax.tree.leaves(new),
                                        jax.tree.leaves(old),
                                    )
                                ])
                            )
                            return new, growth

                        self._jit_calib_wire = jax.jit(_calib)
                    scales, _ = self._jit_calib_wire(
                        self.variables, jnp.asarray(wire)
                    )
                    self.variables = {**self.variables,
                                      "act_scales": jax.device_put(scales)}
                    self._real_calibrated = True
        elif self.cfg.quant == "int8":
            # periodic drift watch: scales were frozen after the first real
            # batch, and a quiet first clip could leave later, louder clips
            # silently clipped at quantization. Every RECALIB_EVERY batches
            # (~5 min of 25 fps video), re-run the cheap 2-frame calibration
            # forward on the current batch: adopt any grown scales (running
            # max — strictly safe) and warn when growth was material.
            with self._calib_lock:
                self._batches_seen += 1
                due = self._batches_seen % self.RECALIB_EVERY == 0
            if due:
                scales, growth = self._jit_calib_wire(
                    self.variables, jnp.asarray(wire)
                )
                with self._calib_lock:
                    # re-merge against the CURRENT scales under the lock:
                    # `scales` grew from a snapshot read before the calib
                    # forward, and a concurrent thread (run_many overlap)
                    # may have adopted its own growth since — a plain
                    # overwrite would silently discard it (lost update)
                    from avcer_tpu.models.layers import merge_act_scales_trees

                    merged = merge_act_scales_trees(
                        self.variables["act_scales"], scales
                    )
                    self.variables = {**self.variables,
                                      "act_scales": jax.device_put(merged)}
                g = float(growth)
                if g > 1.05:
                    log.warning(
                        "int8 act_scales grew %.1f%% on a sampled batch — "
                        "earlier clips were quantized with too-small scales; "
                        "scales updated from here on. Consider calibrate() "
                        "on representative frames up front.", (g - 1) * 100,
                    )
        packed, frames_dev = self._jit_forward(self.variables, self._shard_input(wire))
        return packed, scale, frames_dev

    def dispatch(self, frames: np.ndarray) -> tuple[jax.Array, float, jax.Array]:
        """Async: enqueue detection for a batch, return (device packed
        result, scale, device BGR frames). Does NOT block on the device. The
        device frame buffer is returned so downstream stages can crop
        on-device without re-uploading pixels. Frames cross the link in the
        configured wire format (I420 halves the bytes)."""
        wire, scale = self.prepare_wire(frames)
        return self.dispatch_wire(wire, scale)

    @staticmethod
    def unpack(packed_np: np.ndarray, scale: float) -> Detections:
        inv = 1.0 / scale
        return Detections(
            boxes=packed_np[..., 0:4] * inv,
            scores=packed_np[..., 4],
            keep=packed_np[..., 5] > 0.5,
            landmarks=packed_np[..., 6:16] * inv,
        )

    def __call__(self, frames: np.ndarray) -> Detections:
        """frames: [B, H, W, 3] uint8 BGR at native resolution (sync API)."""
        packed, scale, _ = self.dispatch(frames)
        return self.unpack(np.asarray(packed, np.float32), scale)
