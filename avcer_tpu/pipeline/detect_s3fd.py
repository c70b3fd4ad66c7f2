"""S3FD detection stage — drop-in alternative to DetectStage.

Behavior contract — .../ibug/face_detection/s3fd/s3fd_predictor.py:
- preprocessing: convert to RGB, subtract (123, 117, 104) (:46-52)
- conf_thresh 0.05, NMS IoU 0.3 with the no-+1 convention, top_k 750,
  final threshold 0.8 (:39-42, utils.py:96-152)
- priors: one anchor per cell, steps (4..128), sizes (16..512)

Same packed [B, K, 16] wire contract as DetectStage (landmark slots zero —
S3FD has no landmark head), so the runner and tracker are reusable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from avcer_tpu.core.config import DetectorConfig
from avcer_tpu.models.s3fd import S3FDNet, s3fd_priors
from avcer_tpu.ops import boxes as box_ops
from avcer_tpu.ops import nms as nms_ops
from avcer_tpu.pipeline.detect import DetectStage, Detections


class S3FDStage(DetectStage):
    """Reuses DetectStage's host prep / dispatch / unpack plumbing with the
    S3FD network and post-processing rules."""

    def __init__(self, cfg: DetectorConfig, variables: dict[str, Any],
                 dtype=jnp.bfloat16, mesh=None):
        if cfg.stride > 1:
            # the S3FD forward has no stride slicing: it would emit one
            # detection row per FRAME while the runner's pass-1 accounting
            # expects batch_size/stride rows — boxes would silently shift
            raise ValueError(
                "detector stride > 1 is not supported by S3FDStage; use the"
                " RetinaFace stage for stride serving"
            )
        if cfg.quant != "none":
            raise ValueError(
                "quantized serving is not implemented for S3FDStage; use"
                " the RetinaFace stage for int8 serving"
            )
        self.cfg = cfg
        self.model = S3FDNet(dtype=dtype)
        self._real_calibrated = True  # no quant path (see gate above)
        self._jit_calib_wire = None
        self.mesh = mesh
        if mesh is not None:
            from avcer_tpu.parallel import mesh as mesh_lib

            variables = jax.device_put(variables, mesh_lib.replicated(mesh))
        else:
            # one-time device placement (host trees fed to jit re-upload per
            # call — see pipeline/detect.py)
            variables = jax.device_put(variables)
        self.variables = variables
        self._jit_forward = jax.jit(self._forward_impl)

    def _forward_impl(self, variables: dict, wire: jax.Array):
        from avcer_tpu.ops.image import i420_to_bgr_device

        if wire.ndim == 3:
            h = wire.shape[1] * 2 // 3
            w = wire.shape[2]
            frames = i420_to_bgr_device(wire, h, w)
        else:
            frames = wire
        h, w = frames.shape[1], frames.shape[2]
        # BGR -> RGB, subtract (123, 117, 104) (s3fd_predictor.py:48-50)
        rgb = frames[..., ::-1].astype(jnp.float32)
        x = rgb - jnp.asarray([123.0, 117.0, 104.0])
        loc, conf = self.model.apply(variables, x)
        priors = jnp.asarray(s3fd_priors((h, w)))
        scale = jnp.asarray([w, h, w, h], jnp.float32)
        boxes = box_ops.decode_boxes(loc.astype(jnp.float32), priors) * scale
        scores = conf[..., 1]
        k = min(self.cfg.nms_candidates, 64)
        cand_boxes, cand_scores, valid, _ = nms_ops.topk_candidates(
            boxes, scores, k, self.cfg.threshold
        )
        keep = nms_ops.nms_mask(cand_boxes, valid, 0.3, plus_one=False)
        packed = jnp.concatenate(
            [cand_boxes, cand_scores[..., None],
             keep.astype(jnp.float32)[..., None],
             jnp.zeros((*cand_boxes.shape[:2], 10), jnp.float32)], axis=-1,
        )
        return packed, frames
