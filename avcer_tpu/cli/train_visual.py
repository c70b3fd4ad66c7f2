"""Visual model training CLI — the capability of the legacy TF/Keras
EMO-AffectNet subproject (/root/reference/src/video/, SURVEY.md §2.5),
re-done natively: trains the static EmotionResNet50 on a folder-of-crops
dataset (AffectNet layout: <root>/<class_idx>/<img>.jpg) and the dynamic
TemporalLSTM on per-video feature sequences (win=10/step=5 windows,
sequences.py:1-14 semantics).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Iterator

import numpy as np

log = logging.getLogger("avcer_tpu")


def iter_image_folder(root: str) -> list[tuple[str, int]]:
    items = []
    for cls in sorted(os.listdir(root)):
        cdir = os.path.join(root, cls)
        if not os.path.isdir(cdir) or not cls.isdigit():
            continue
        for name in sorted(os.listdir(cdir)):
            if name.lower().endswith((".jpg", ".png", ".jpeg")):
                items.append((os.path.join(cdir, name), int(cls)))
    return items


class CropLoader:
    """Batches of normalized 224x224 BGR crops + labels."""

    def __init__(self, items, batch_size: int, seed: int = 0, train: bool = True):
        self.items = items
        self.batch_size = batch_size
        self.seed = seed
        self.train = train
        self.epoch = 0

    def __len__(self):
        return len(self.items) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        import cv2

        from avcer_tpu.pipeline.media import resize_nearest_np

        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        order = np.arange(len(self.items))
        if self.train:
            rng.shuffle(order)
        for b in range(len(self)):
            xs, ys = [], []
            for i in order[b * self.batch_size : (b + 1) * self.batch_size]:
                path, label = self.items[int(i)]
                img = cv2.imread(path)
                xs.append(resize_nearest_np(img, (224, 224)))
                ys.append(label)
            yield np.stack(xs), np.asarray(ys, np.int32)


def window_sequences(features: np.ndarray, win: int = 10, step: int = 5) -> np.ndarray:
    """win/step windows padded by repeating the last element
    (video/functions/sequences.py:1-14)."""
    out = []
    for s in range(0, len(features), step):
        w = features[s : s + win]
        if len(w) < win:
            w = np.concatenate([w, np.repeat(w[-1:], win - len(w), axis=0)])
        out.append(w)
        if s + win >= len(features):
            break
    return np.stack(out) if out else np.zeros((0, win, features.shape[-1]))


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="avcer-tpu visual training")
    p.add_argument("--data_root", required=True, help="AffectNet-style crop folders")
    p.add_argument("--model", choices=["static", "dynamic"], default="static")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--log_root", default="logs/visual")
    p.add_argument("--data_parallel", type=int, default=1)
    a = p.parse_args(argv)
    from avcer_tpu.core.tpuenv import enable_compile_cache

    enable_compile_cache()  # persistent XLA cache (AVCER_COMPILE_CACHE=0 disables)

    import jax
    import jax.numpy as jnp

    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.emotion_resnet import EmotionResNet50
    from avcer_tpu.ops.image import vggface_normalize
    from avcer_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        model=a.model, num_classes=7, epochs=a.epochs, batch_size=a.batch_size,
        optim=OptimConfig(lr=a.lr), mesh=MeshConfig(data=a.data_parallel),
        log_root=a.log_root, loss="weighted_ce", label_smoothing=0.0,
    )

    if a.model == "static":
        items = iter_image_folder(a.data_root)
        loader = CropLoader(items, a.batch_size)

        class StaticWrapper(EmotionResNet50):
            """Adapter: normalize uint8 BGR inside the jitted program and
            expose the trainer's (logits | (logits, features)) signature."""

            def __call__(self, x, train=False, deterministic=True,
                         return_features=False):
                logits, feats = super().__call__(
                    vggface_normalize(x), train=not deterministic
                )
                return (logits, feats) if return_features else logits

        model = StaticWrapper(num_classes=7, dtype=jnp.bfloat16)
        trainer = Trainer(model, cfg, iters_per_epoch=max(1, len(loader)),
                          unfreeze_last_n=0, wav2vec2_layers=0)
        x0, _ = next(iter(loader))
        state = trainer.init_state(x0)
        trainer.fit(state, loader, epochs=cfg.epochs,
                    best_family="best_static", log_fn=log.info)
    else:
        train_dynamic(a, cfg)
    return 0


def train_dynamic(a, cfg):
    """Train the TemporalLSTM on dumped per-video feature pickles
    (the legacy Keras-LSTM training capability, src/video/ notebooks +
    get_models.py:40-59): ``data_root`` holds <name>.npz files with
    ``features`` [T, 512] and ``labels`` [T] arrays; win=10/step=5 windows
    with majority labels feed the trainer."""
    import glob
    import logging

    import jax
    import jax.numpy as jnp

    from avcer_tpu.models.temporal_lstm import TemporalLSTM
    from avcer_tpu.train.data.windowing import majority_label
    from avcer_tpu.train.trainer import Trainer

    log = logging.getLogger("avcer_tpu")
    xs, ys = [], []
    for path in sorted(glob.glob(os.path.join(a.data_root, "*.npz"))):
        data = np.load(path)
        feats, labels = data["features"], data["labels"]
        for s in range(0, len(feats), 5):
            w = feats[s : s + 10]
            lw = labels[s : s + 10]
            if len(w) < 10:
                w = np.concatenate([w, np.repeat(w[-1:], 10 - len(w), axis=0)])
                lw = np.concatenate([lw, np.repeat(lw[-1:], 10 - len(lw))])
            xs.append(w)
            ys.append(majority_label(lw))
            if s + 10 >= len(feats):
                break
    if not xs:
        raise SystemExit(f"no .npz feature files under {a.data_root}")
    x_all = np.stack(xs).astype(np.float32)
    y_all = np.asarray(ys, np.int32)

    class LSTMWrap(TemporalLSTM):
        def __call__(self, x, deterministic=True, return_features=False):
            out = super().__call__(x)
            return (out, out) if return_features else out

    model = LSTMWrap(7, dtype=jnp.float32)
    bs = min(cfg.batch_size, len(x_all))
    trainer = Trainer(model, cfg, iters_per_epoch=max(1, len(x_all) // bs),
                      unfreeze_last_n=0, wav2vec2_layers=0)
    state = trainer.init_state(x_all[:bs])

    class _Loader:
        """Reshuffled finite iterable (fit() iterates it once per epoch)."""

        def __init__(self):
            self._epoch = 0

        def __iter__(self):
            order = np.random.default_rng(self._epoch).permutation(len(x_all))
            self._epoch += 1
            for s in range(0, len(order) - bs + 1, bs):
                idx = order[s : s + bs]
                yield x_all[idx], y_all[idx]

    trainer.fit(state, _Loader(), epochs=cfg.epochs,
                best_family="best_dynamic", log_fn=log.info)


if __name__ == "__main__":
    raise SystemExit(main())
