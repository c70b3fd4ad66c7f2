"""Multi-epoch wav2vec2-large training on the real TPU (VERDICT item 8).

Exercises, on hardware, everything the CPU-mesh trainer tests can't:
- ExprModelV3 (full wav2vec2-large-robust-12) at the reference batch size 24
  (train_c_audio.py:236-250) with encoder remat (Wav2Vec2Config.remat)
- Trainer.fit(): per-epoch train+eval phases, best-F1 export, confusion SVG,
  stats.csv, TB scalars, provenance
- kill/resume: fit() is stopped after 2 epochs (fresh Trainer + state, as
  after a process kill) and resumed from the orbax "latest" checkpoint

Corpus is synthetic (random 4 s wavs, 8-class labels with a
class-conditional DC bias so the model can actually fit something).
Artifacts land in /tmp/avcer_train_r3; the small ones (stats.csv, confusion
SVGs, provenance, summary.json with step timings) are copied into
logs/tpu_train_r3/ for the repo. Checkpoints (~GB) stay in /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import jax
import jax.numpy as jnp

ROOT = "/tmp/avcer_train_r3"
REPO_LOGS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "logs", "tpu_train_r3"
)
BATCH = 24
N_BATCHES = 6
EPOCHS_FIRST = 2
EPOCHS_TOTAL = 4


def make_loader(seed: int):
    """Deterministic synthetic loader: [BATCH, 64000] wavs, labels 0..7.
    Class-conditional bias makes the task learnable (loss should drop)."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(N_BATCHES):
        y = rng.integers(0, 8, BATCH).astype(np.int64)
        x = rng.normal(size=(BATCH, 64000)).astype(np.float32) * 0.1
        x += (y[:, None].astype(np.float32) - 3.5) * 0.02
        batches.append((x, y))
    return batches


def build_trainer():
    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        model="v3", num_classes=8, epochs=EPOCHS_TOTAL, batch_size=BATCH,
        loss="weighted_ce", mesh=MeshConfig(data=1, model=1),
        log_root=ROOT, optim=OptimConfig(lr=1e-4, t0=10),
    )
    model = ExprModel(
        variant="v3", num_classes=8,
        wav2vec2_config=Wav2Vec2Config(remat=True), dtype=jnp.bfloat16,
    )
    trainer = Trainer(
        model, cfg, iters_per_epoch=N_BATCHES, unfreeze_last_n=4,
        log_dir=os.path.join(ROOT, "run"),
    )
    return trainer


def main() -> None:
    os.makedirs(ROOT, exist_ok=True)
    loader = make_loader(0)
    eval_loader = make_loader(1)
    summary: dict = {"backend": jax.default_backend(), "batch": BATCH,
                     "n_batches": N_BATCHES, "remat": True}

    # ---- phase 1: epochs 0..1, then "killed" ------------------------------
    trainer = build_trainer()
    trainer.write_provenance()
    x0, _ = loader[0]
    t0 = time.time()
    state = trainer.init_state(x0)
    summary["init_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    state = trainer.fit(state, loader, eval_loader, epochs=EPOCHS_FIRST,
                        log_fn=lambda m: print(m, flush=True))
    summary["phase1_sec"] = round(time.time() - t0, 1)
    del trainer, state

    # ---- phase 2: fresh process state, resume from "latest" ----------------
    trainer = build_trainer()
    x0, _ = loader[0]
    state = trainer.init_state(x0)
    t0 = time.time()
    state = trainer.fit(state, loader, eval_loader, epochs=EPOCHS_TOTAL,
                        resume=True, log_fn=lambda m: print(m, flush=True))
    summary["phase2_sec"] = round(time.time() - t0, 1)

    hist = trainer.history
    train_epochs = [h for h in hist if h["phase"] == "train"]
    summary["resumed_from_epoch"] = EPOCHS_FIRST - 1
    summary["epochs_run"] = sorted({h["epoch"] for h in hist})
    # steady-state step time: later epochs, compile amortized
    if train_epochs:
        last = train_epochs[-1]
        summary["steady_epoch_sec"] = round(last["seconds"], 2)
        summary["steady_step_sec"] = round(last["seconds"] / N_BATCHES, 3)
        summary["final_train_loss"] = round(last["loss"], 4)
        summary["first_train_loss"] = round(train_epochs[0]["loss"], 4)
    summary["best_metric_f1"] = round(float(trainer.best["metric"]), 4)
    summary["best_epoch"] = int(trainer.best["epoch"])

    # ---- collect small artifacts into the repo ----------------------------
    os.makedirs(REPO_LOGS, exist_ok=True)
    run_dir = os.path.join(ROOT, "run")
    for name in os.listdir(run_dir):
        p = os.path.join(run_dir, name)
        if name.endswith(".csv") or name.endswith(".svg") or name == "source.log":
            shutil.copy(p, os.path.join(REPO_LOGS, name))
        elif os.path.isdir(p) and name in ("train", "eval"):
            # TB event files are small — keep them for inspection
            dst = os.path.join(REPO_LOGS, name)
            shutil.copytree(p, dst, dirs_exist_ok=True)
    with open(os.path.join(REPO_LOGS, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
