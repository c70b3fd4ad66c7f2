"""Audio emotion training CLI — the train_c_audio.py equivalent.

Behavior contract (/root/reference/src/audio/train_c_audio.py):

- corpora: ABAW-EXPR + MELD concatenated (:135-172)
- class-weighted CE with label_smoothing=0.2 (8-class run, :236-243) or
  SoftFocalLoss (7-class run, train_c_audio_7_cl.py)
- Adam lr=1e-4, CosineAnnealingWarmRestarts T_0=10 stepped per batch
  (:246-250, net_trainer.py:437)
- mixup alpha=0.3 when augmentation is on (:259)
- sweep over {augmentation} x {filtered} x {V1, V2, V3} (:279-293)
- best-F1 checkpointing, stats.csv, provenance snapshot (net_trainer.py)

Config comes from a JSON file (replaces the gitignored ``config.py`` module,
default_config.py:7-34); see ``example_config()``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Any

import numpy as np

log = logging.getLogger("avcer_tpu")


def example_config() -> dict[str, Any]:
    """The c_config template (default_config.py:7-34) as JSON."""
    return {
        "ABAW_WAV_ROOT": "/path/to/abaw/wavs",
        "ABAW_FILTERED_WAV_ROOT": "/path/to/abaw/vocals",
        "ABAW_VIDEO_ROOT": "/path/to/abaw/videos",
        "ABAW_LABELS_ROOT": "/path/to/abaw/EXPR_Classification_Challenge",
        "ABAW_FEATURES_ROOT": "/path/to/abaw/mouth_open_features",
        "MELD_WAV_ROOT": "/path/to/meld/wavs",
        "MELD_LABELS_PATH": "/path/to/meld/train_sent_emo.csv",
        "MELD_VAD_PATH": "/path/to/meld/vad.pickle",
        "LOGS_ROOT": "logs",
        "MODEL_PARAMS": {"model": "v3", "num_classes": 8},
        "AUGMENTATION": False,
        "FILTERED": True,
        "NUM_EPOCHS": 100,
        "BATCH_SIZE": 24,
        "REMAT": True,
        "DATA_PARALLEL": 1,
        "MODEL_PARALLEL": 1,
    }


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="avcer-tpu audio training")
    p.add_argument("--config", type=str, required=False)
    p.add_argument("--print_example_config", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in the log dir")
    p.add_argument("--compile_cache_dir", type=str, default="",
                   help="persistent XLA compilation cache directory "
                        "(default $AVCER_COMPILE_CACHE, else "
                        "~/.cache/avcer_tpu/xla; AVCER_COMPILE_CACHE=0 "
                        "disables); restarted/resumed runs load the "
                        "train-step program from disk instead of "
                        "recompiling")
    a = p.parse_args(argv)
    from avcer_tpu.core.tpuenv import enable_compile_cache

    enable_compile_cache(a.compile_cache_dir)
    if a.print_example_config or not a.config:
        print(json.dumps(example_config(), indent=2))
        return 0

    with open(a.config) as fh:
        c = json.load(fh)

    import jax.numpy as jnp
    import jax

    from avcer_tpu.core.config import MeshConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.augment import default_train_augmentation
    from avcer_tpu.train.data.datasets import (
        BatchLoader, concat_datasets, load_abaw_expr, load_meld,
    )
    from avcer_tpu.train.trainer import Trainer

    mp = c.get("MODEL_PARAMS", {})
    variant = mp.get("model", "v3")
    num_classes = mp.get("num_classes", 8)
    aug = default_train_augmentation() if c.get("AUGMENTATION") else None

    abaw = load_abaw_expr(
        audio_root=c["ABAW_FILTERED_WAV_ROOT"] if c.get("FILTERED") else c["ABAW_WAV_ROOT"],
        labels_root=c["ABAW_LABELS_ROOT"],
        features_root=c["ABAW_FEATURES_ROOT"],
        video_root=c["ABAW_VIDEO_ROOT"],
        num_classes=num_classes,
        transform=aug,
    )
    meld = load_meld(
        audio_root=c["MELD_WAV_ROOT"],
        labels_file=c["MELD_LABELS_PATH"],
        vad_file=c["MELD_VAD_PATH"],
        num_classes=num_classes,
        transform=aug,
    )
    train_ds = concat_datasets([abaw, meld])
    loader = BatchLoader(train_ds, batch_size=c.get("BATCH_SIZE", 24))

    cfg = TrainConfig(
        model=variant,
        num_classes=num_classes,
        epochs=a.epochs or c.get("NUM_EPOCHS", 100),
        batch_size=c.get("BATCH_SIZE", 24),
        augmentation=bool(c.get("AUGMENTATION")),
        filtered=bool(c.get("FILTERED")),
        loss="weighted_ce" if num_classes == 8 else "soft_focal",
        mesh=MeshConfig(data=c.get("DATA_PARALLEL", 1), model=c.get("MODEL_PARALLEL", 1)),
        log_root=c.get("LOGS_ROOT", "logs"),
    )
    model = ExprModel(
        variant=variant, num_classes=num_classes,
        # remat: activation memory for batch>=24 wav2vec2-large training on a
        # single chip (Wav2Vec2Config docstring)
        wav2vec2_config=Wav2Vec2Config(remat=bool(c.get("REMAT", True))),
        dtype=jnp.bfloat16,
    )
    trainer = Trainer(
        model, cfg,
        class_weights=train_ds.class_weights(num_classes) if cfg.loss == "weighted_ce" else None,
        iters_per_epoch=max(1, len(loader)),
        unfreeze_last_n=4 if variant == "v3" else 2,
    )
    trainer.write_provenance()

    x0, _ = next(iter(loader))
    state = trainer.init_state(x0)
    trainer.fit(
        state, loader, epochs=cfg.epochs, resume=a.resume,
        best_family=f"best_{variant}", log_fn=log.info,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
