"""Pipeline construction: resolve weights for all four model families and
wire the stages together."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from avcer_tpu.core import checkpoint, convert
from avcer_tpu.core.config import PipelineConfig
from avcer_tpu.models.audio_heads import ExprModel
from avcer_tpu.models.emotion_resnet import EmotionResNet50
from avcer_tpu.models.retinaface import RetinaFace
from avcer_tpu.models.temporal_lstm import TemporalLSTM
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
from avcer_tpu.pipeline.runner import Pipeline


def build_pipeline(
    cfg: PipelineConfig, wav2vec2_config: Wav2Vec2Config | None = None
) -> Pipeline:
    w2v2 = wav2vec2_config or Wav2Vec2Config()
    wdir = cfg.weights_dir

    det_family = checkpoint.detector_family(cfg.detector.backbone)
    detect_vars = checkpoint.resolve(
        wdir, det_family, convert.convert_retinaface,
        RetinaFace(backbone=cfg.detector.backbone),
        (jnp.zeros((1, 64, 64, 3), jnp.float32),),
        backbone=cfg.detector.backbone,
    )
    static_vars = checkpoint.resolve(
        wdir, "emotion_resnet50", convert.convert_emotion_resnet50,
        EmotionResNet50(num_classes=cfg.visual.num_classes),
        (jnp.zeros((1, 224, 224, 3), jnp.float32),),
    )
    lstm_vars = checkpoint.resolve(
        wdir, "temporal_lstm", convert.convert_temporal_lstm,
        TemporalLSTM(num_classes=cfg.visual.num_classes),
        (jnp.zeros((1, 10, 512), jnp.float32),),
    )
    family = "expr_model_8cl" if cfg.audio.num_classes == 8 else "expr_model_7cl"
    audio_vars = checkpoint.resolve(
        wdir, family, convert.convert_expr_model,
        ExprModel(variant=cfg.audio.head, num_classes=cfg.audio.num_classes,
                  wav2vec2_config=w2v2),
        (jnp.zeros((1, int(cfg.audio.window_sec * cfg.audio.sample_rate)), jnp.float32),),
        variant=cfg.audio.head, num_layers=w2v2.num_layers,
    )
    pipe = Pipeline(cfg, detect_vars, static_vars, lstm_vars, audio_vars, w2v2)
    # adopt persisted representative-corpus int8 calibration scales
    # (written by `cli/convert_verify --calib_video`; running-max merge, so
    # the seeded scales only ever grow)
    import logging

    log = logging.getLogger("avcer_tpu")
    for stage, fam in ((pipe.detect, det_family),
                       (pipe.visual, "emotion_resnet50"),
                       (pipe.audio, family)):
        scales = checkpoint.load_act_scales(wdir, fam)
        if scales is None:
            continue
        try:
            stage.merge_act_scales(scales)
        except Exception as e:  # model changed since the sidecar was written
            log.warning("act_scales sidecar for %s incompatible (%s) — "
                        "ignored", fam, e)
    if cfg.calibrate:
        from avcer_tpu.pipeline.calibrate import calibrate

        calibrate(pipe)
    return pipe
