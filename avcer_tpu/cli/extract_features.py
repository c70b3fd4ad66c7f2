"""Feature extraction CLI — the run_extract_features.py equivalent.

Behavior contract (/root/reference/src/audio/run_extract_features.py):
runs trained audio checkpoints over exhaustively-windowed corpora via
``Trainer.extract_features`` (logits + 1024-d pooled features,
net_trainer.py:469-535), regroups per source filename, and pickles
``{targets, predicts, features, start/end frame and timestep bounds}``
per dataset (:223-271).
"""

from __future__ import annotations

import argparse
import os
import pickle
from collections import defaultdict

import numpy as np


def regroup_by_filename(
    windows, logits: np.ndarray, features: np.ndarray, targets: np.ndarray
) -> dict:
    """Per-filename dict of {targets, predicts, features, frame/timestep
    bounds} (run_extract_features.py:228-271 schema)."""
    out: dict = defaultdict(lambda: {
        "targets": [], "predicts": [], "features": [],
        "start_f": [], "end_f": [], "start_t": [], "end_t": [],
    })
    for i, w in enumerate(windows):
        d = out[w.filename]
        d["targets"].append(int(targets[i]))
        d["predicts"].append(logits[i])
        d["features"].append(features[i])
        d["start_f"].append(w.start_f)
        d["end_f"].append(w.end_f)
        d["start_t"].append(w.start_t)
        d["end_t"].append(w.end_t)
    return {
        k: {kk: (np.stack(vv) if kk in ("predicts", "features") else np.asarray(vv))
            for kk, vv in d.items()}
        for k, d in out.items()
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="avcer-tpu feature extraction")
    p.add_argument("--config", required=True, help="training-config JSON (see train_audio)")
    p.add_argument("--checkpoint", required=True, help="orbax dir or torch .pth")
    p.add_argument("--out", required=True, help="output pickle path")
    p.add_argument("--variant", default="v3")
    p.add_argument("--num_classes", type=int, default=8)
    a = p.parse_args(argv)
    from avcer_tpu.core.tpuenv import enable_compile_cache

    enable_compile_cache()  # persistent XLA cache (AVCER_COMPILE_CACHE=0 disables)

    import json

    import jax.numpy as jnp

    from avcer_tpu.core import checkpoint, convert
    from avcer_tpu.core.config import TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.data.datasets import BatchLoader, load_abaw_expr
    from avcer_tpu.train.trainer import TrainState, Trainer

    with open(a.config) as fh:
        c = json.load(fh)

    model = ExprModel(variant=a.variant, num_classes=a.num_classes,
                      wav2vec2_config=Wav2Vec2Config(), dtype=jnp.bfloat16)
    if os.path.isdir(a.checkpoint):
        variables = checkpoint.load_converted(os.path.dirname(a.checkpoint),
                                              os.path.basename(a.checkpoint))
    else:
        sd = convert.load_torch_state_dict(a.checkpoint)
        variables = convert.convert_expr_model(sd, variant=a.variant)

    ds = load_abaw_expr(
        audio_root=c["ABAW_WAV_ROOT"],
        labels_root=c["ABAW_LABELS_ROOT"],
        features_root=c["ABAW_FEATURES_ROOT"],
        video_root=c["ABAW_VIDEO_ROOT"],
        num_classes=a.num_classes,
    )
    loader = BatchLoader(ds, batch_size=16, shuffle=False, drop_last=False)
    trainer = Trainer(model, TrainConfig(num_classes=a.num_classes))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None, step=0,
    )
    logits, feats = trainer.extract_features(state, loader)
    targets = np.asarray([w.label for w in ds.windows])[: len(logits)]
    grouped = regroup_by_filename(ds.windows[: len(logits)], logits, feats, targets)
    with open(a.out, "wb") as fh:
        pickle.dump(grouped, fh)
    print(f"wrote {a.out} ({len(grouped)} files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
