"""Training harness — the NetTrainer equivalent on optax/pjit.

Behavior contracts (/root/reference/src/audio/net_trainer/net_trainer.py):

- per-epoch train/eval phases with metric computation (:198-336)
- per-batch scheduler stepping at fractional epoch ``epoch + idx/iters``
  (:437) — realized as a step-indexed optax schedule
- best-metric checkpointing of {epoch, params, opt_state} (:273-287),
  selection metric configurable (train_c_audio.py:217 uses F1)
- mixup on inputs with convex loss mixing (:413-414, :574-604)
- partial fine-tuning: only the last N wav2vec2 encoder blocks + the head
  train (audio_8_cl.py:52-60 / :169-177); frozen params get zero updates
- stats.csv of per-epoch per-phase metrics (:319-334), scalar logging, and
  a config provenance snapshot (:83-91)

TPU design: the train step is ONE jitted SPMD program over the (data, model)
mesh — batch sharded on data, wav2vec2 tensor-parallel on model; XLA inserts
the gradient psum. No host sync inside an epoch except metric accumulation.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avcer_tpu.core.config import TrainConfig
from avcer_tpu.parallel import mesh as mesh_lib
from avcer_tpu.train import losses as loss_lib
from avcer_tpu.train import metrics as metrics_lib
from avcer_tpu.train.schedules import make_optimizer


from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def default_trainable(path: str, unfreeze_last_n: int, num_layers: int) -> bool:
    """Reference fine-tuning policy: freeze all of wav2vec2 except the last N
    encoder layers; train everything outside wav2vec2."""
    if "wav2vec2" not in path:
        return True
    for i in range(num_layers - unfreeze_last_n, num_layers):
        if f"layers_{i}/" in path or path.endswith(f"layers_{i}"):
            return True
    return False


def _paths(tree: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: mesh_lib._path_str(kp), tree
    )


class Trainer:
    def __init__(
        self,
        model,  # flax module: apply({"params", "batch_stats"}, x, deterministic=...)
        cfg: TrainConfig,
        loss_fn: Optional[Callable] = None,
        class_weights: Optional[np.ndarray] = None,
        iters_per_epoch: int = 100,
        unfreeze_last_n: int = 4,
        wav2vec2_layers: int = 12,
        mesh=None,
        log_dir: Optional[str] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.pipe = getattr(cfg.mesh, "pipe", 1)
        if mesh is not None:
            self.mesh = mesh
        elif self.pipe > 1:
            # GPipe over the wav2vec2 encoder layer stack
            # (parallel/pipeline.py); exclusive with tensor parallelism
            if cfg.mesh.model > 1:
                raise ValueError("mesh.pipe and mesh.model are exclusive")
            from avcer_tpu.parallel import pipeline as pp_lib

            self.mesh = pp_lib.make_mesh_dp_pp(cfg.mesh.data, self.pipe)
        else:
            self.mesh = mesh_lib.make_mesh(cfg.mesh.data, cfg.mesh.model)
        self.class_weights = (
            jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None
        )
        if loss_fn is not None:
            self.loss_fn = loss_fn
        elif cfg.loss == "soft_focal":
            self.loss_fn = lambda logits, labels: loss_lib.soft_focal_loss_onehot(
                logits, labels, cfg.num_classes
            )
        elif cfg.loss == "ccc":  # VA regression (net_trainer.py regression mode)
            self.loss_fn = loss_lib.ccc_loss
        elif cfg.loss == "mse":
            self.loss_fn = loss_lib.mse_loss
        else:
            self.loss_fn = lambda logits, labels: loss_lib.weighted_cross_entropy(
                logits, labels, self.class_weights, cfg.label_smoothing
            )
        self.tx = make_optimizer(
            cfg.optim.lr, cfg.optim.t0, iters_per_epoch, cfg.optim.t_mult,
            cfg.optim.eta_min, cfg.optim.weight_decay,
        )
        self.unfreeze_last_n = unfreeze_last_n
        self.wav2vec2_layers = wav2vec2_layers
        self.log_dir = log_dir or os.path.join(cfg.log_root, "run")
        self._jit_train_step = None
        self._jit_eval_step = None
        self._jit_feature_step = None
        self.history: list[dict] = []
        self.best: dict[str, Any] = {"metric": -np.inf, "epoch": -1, "state": None}
        self._tb: dict[str, Any] = {}

    def _writer(self, phase: str):
        if phase not in self._tb:
            from avcer_tpu.utils.tb import SummaryWriter

            self._tb[phase] = SummaryWriter(os.path.join(self.log_dir, phase))
        return self._tb[phase]

    # ------------------------------------------------------------------
    def init_state(self, example_batch: np.ndarray, seed: int | None = None) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        variables = self.model.init(rng, jnp.asarray(example_batch[:1]))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.pipe > 1:
            from avcer_tpu.parallel import pipeline as pp_lib

            params = pp_lib.stack_encoder_params(params, self.wav2vec2_layers)
            # per-layer freeze policy on the stacked [L, ...] leaves: the
            # whole leaf rides the "train" partition and frozen layer
            # SLICES are zero-masked in the step (multi_transform cannot
            # split one leaf); moments for frozen slices stay zero, AdamW
            # decay is masked with the updates.
            self._pp_layer_mask = jnp.asarray(
                [
                    float(i >= self.wav2vec2_layers - self.unfreeze_last_n)
                    for i in range(self.wav2vec2_layers)
                ],
                jnp.float32,
            )

        def trainable(path: str) -> bool:
            if path.endswith("layers_stacked") or "layers_stacked/" in path:
                return self.unfreeze_last_n > 0
            return default_trainable(
                path, self.unfreeze_last_n, self.wav2vec2_layers
            )

        mask = jax.tree_util.tree_map_with_path(
            lambda kp, _: trainable(mesh_lib._path_str(kp)), params
        )
        self._trainable_mask = mask
        tx = optax.multi_transform(
            {"train": self.tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", mask),
        )
        self._full_tx = tx
        # place params on the mesh per the TP rules before opt init
        shardings = mesh_lib.param_shardings({"params": params}, self.mesh)["params"]
        if self.pipe > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shardings = dict(shardings)
            enc_sh = dict(shardings["wav2vec2"])
            enc_sh["layers_stacked"] = jax.tree.map(
                lambda leaf: NamedSharding(
                    self.mesh, P("pipe", *([None] * (leaf.ndim - 1)))
                ),
                params["wav2vec2"]["layers_stacked"],
            )
            shardings["wav2vec2"] = enc_sh
        params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = tx.init(params)
        return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))

    def _mask_pp(self, tree):
        """Zero the frozen encoder-layer slices of the stacked grads AND
        updates (freeze semantics on the [L, ...] pp layout: no momentum
        accumulation, no AdamW decay for frozen layers — same end state as
        the named-tree multi_transform partition)."""
        if self.pipe <= 1:
            return tree
        t = dict(tree)
        enc = dict(t["wav2vec2"])
        enc["layers_stacked"] = jax.tree.map(
            lambda g: g
            * self._pp_layer_mask.reshape(-1, *([1] * (g.ndim - 1))).astype(
                g.dtype
            ),
            enc["layers_stacked"],
        )
        t["wav2vec2"] = enc
        return t

    # ------------------------------------------------------------------
    def _loss_and_logits(self, params, batch_stats, rng, x, y, train: bool):
        mutable = ["batch_stats"] if (train and batch_stats) else False
        if self.pipe > 1:
            from avcer_tpu.parallel import pipeline as pp_lib

            out = pp_lib.expr_logits_stacked(
                self.model, params, batch_stats, x, self.mesh,
                self.cfg.mesh.pipe_microbatches, deterministic=not train,
                rng=rng if train else None, mutable=mutable,
            )
            logits, updates = out if mutable else (out, {})
            new_stats = (
                updates.get("batch_stats", batch_stats) if mutable else batch_stats
            )
            return logits, new_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = dict(deterministic=not train)
        if train:
            out = self.model.apply(
                variables, x, rngs={"dropout": rng}, mutable=mutable, **kwargs
            )
            logits, updates = out if mutable else (out, {})
            new_stats = updates.get("batch_stats", batch_stats) if mutable else batch_stats
        else:
            logits = self.model.apply(variables, x, **kwargs)
            new_stats = batch_stats
        return logits, new_stats

    def make_train_step(self):
        mixup_alpha = self.cfg.mixup_alpha if self.cfg.augmentation else 0.0

        def step_fn(state: TrainState, x, y, rng):
            rng_drop, rng_mix = jax.random.split(jax.random.fold_in(rng, state.step))

            def loss_fn(params):
                if mixup_alpha > 0:
                    mixed, perm, lam = loss_lib.mixup_batch(rng_mix, x, mixup_alpha)
                    logits, new_stats = self._loss_and_logits(
                        params, state.batch_stats, rng_drop, mixed, y, True
                    )
                    loss = lam * self.loss_fn(logits, y) + (1 - lam) * self.loss_fn(
                        logits, y[perm]
                    )
                else:
                    logits, new_stats = self._loss_and_logits(
                        params, state.batch_stats, rng_drop, x, y, True
                    )
                    loss = self.loss_fn(logits, y)
                return loss, (logits, new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads = self._mask_pp(grads)
            updates, new_opt = self._full_tx.update(grads, state.opt_state, state.params)
            updates = self._mask_pp(updates)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
            return new_state, loss, logits

        return step_fn

    def train_step(self, state: TrainState, x, y, rng) -> tuple[TrainState, float, np.ndarray]:
        """One SPMD step. ``x``/``y`` are this PROCESS's local batch rows; in
        a multi-host run (jax.process_count() > 1) the global batch is their
        concatenation across processes (parallel/distributed.global_batch),
        single-host runs place the full batch identically."""
        from avcer_tpu.parallel import distributed

        if self._jit_train_step is None:
            self._jit_train_step = jax.jit(self.make_train_step(), donate_argnums=(0,))
        x = distributed.global_batch(self.mesh, x)
        y = distributed.global_batch(self.mesh, y)
        return self._jit_train_step(state, x, y, rng)

    def eval_step(
        self, state: TrainState, x, y=None
    ) -> np.ndarray | tuple[np.ndarray, float]:
        """Eval forward. With labels, also returns the eval loss (the
        reference logs loss in both phases — net_trainer.py run_epoch).
        Multi-host: the returned logits are this process's LOCAL rows."""
        from avcer_tpu.parallel import distributed

        x = distributed.global_batch(self.mesh, x)
        if y is None:
            # logits-only program: loss_fn's label format varies by config
            # (int classes / soft targets / VA pairs), so no dummy labels
            if getattr(self, "_jit_eval_logits", None) is None:
                def g(params, batch_stats, x):
                    logits, _ = self._loss_and_logits(
                        params, batch_stats, None, x, None, False
                    )
                    return logits

                self._jit_eval_logits = jax.jit(g)
            return distributed.local_rows(
                self._jit_eval_logits(state.params, state.batch_stats, x)
            )
        if self._jit_eval_step is None:
            def f(params, batch_stats, x, y):
                logits, _ = self._loss_and_logits(params, batch_stats, None, x, None, False)
                return logits, self.loss_fn(logits, y)

            self._jit_eval_step = jax.jit(f)
        y_arr = distributed.global_batch(self.mesh, y)
        logits, loss = self._jit_eval_step(state.params, state.batch_stats, x, y_arr)
        return distributed.local_rows(logits), float(loss)

    # ------------------------------------------------------------------
    def run_epoch(
        self,
        state: TrainState,
        loader: Iterable[tuple[np.ndarray, np.ndarray]],
        epoch: int,
        train: bool,
        rng: Optional[jax.Array] = None,
    ) -> tuple[TrainState, dict]:
        rng = rng if rng is not None else jax.random.PRNGKey(epoch)
        regression = self.cfg.problem == "regression"
        all_true, all_pred, losses = [], [], []
        t0 = time.perf_counter()
        from avcer_tpu.parallel import distributed

        for x, y in loader:
            if train:
                state, loss, logits = self.train_step(state, x, y, rng)
                losses.append(float(loss))
                logits = distributed.local_rows(logits)
            else:
                logits, loss = self.eval_step(state, x, y)
                losses.append(loss)
            all_true.append(np.asarray(y))
            out = np.asarray(logits)
            all_pred.append(out if regression else out.argmax(-1))
        true = np.concatenate(all_true) if all_true else np.zeros(0, np.int64)
        pred = np.concatenate(all_pred) if all_pred else np.zeros(0, np.int64)
        self._last_epoch_outputs = (true, pred)  # for fit()'s confusion artifact
        stats = {
            "epoch": epoch,
            "phase": "train" if train else "eval",
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "seconds": time.perf_counter() - t0,
        }
        if regression and true.size:
            # VA task metrics: CCC per dim + mean (accuracy_utils.py:124-223)
            if true.ndim == 2 and true.shape[1] >= 2:
                cv, ca, mean_ccc = metrics_lib.va_score(true, pred)
                stats.update({"ccc_v": cv, "ccc_a": ca, "ccc": mean_ccc,
                              "uar": 0.0, "accuracy": 0.0, "f1": mean_ccc,
                              "precision": 0.0, "mean": mean_ccc})
            else:
                c = metrics_lib.ccc(true.ravel(), pred.ravel())
                stats.update({"ccc": c, "uar": 0.0, "accuracy": 0.0,
                              "f1": c, "precision": 0.0, "mean": c})
        else:
            u, a, f, p, m = (
                metrics_lib.reference_metrics(true, pred) if true.size else (0,) * 5
            )
            stats.update({"uar": u, "accuracy": a, "f1": f, "precision": p,
                          "mean": m})
        self.history.append(stats)
        # per-phase TensorBoard scalars (net_trainer.py:185-187, 230-235)
        w = self._writer(stats["phase"])
        for key in ("loss", "uar", "accuracy", "f1", "precision"):
            if np.isfinite(stats[key]):
                w.add_scalar(key, stats[key], epoch)
        w.flush()
        return state, stats

    def fit(
        self,
        state: TrainState,
        train_loader: Iterable[tuple[np.ndarray, np.ndarray]],
        eval_loader: Optional[Iterable[tuple[np.ndarray, np.ndarray]]] = None,
        epochs: Optional[int] = None,
        resume: bool = False,
        best_family: Optional[str] = None,
        log_fn: Optional[Callable[[str], None]] = None,
    ) -> TrainState:
        """The NetTrainer.run equivalent (net_trainer.py:135-355): owns the
        whole product loop — per-epoch train+eval phases, per-epoch eval
        confusion-matrix artifact, best-metric weight export, a resumable
        "latest" orbax checkpoint each epoch, stats.csv, TB scalars.

        CLIs should call this instead of re-assembling the loop. ``resume``
        continues from the latest checkpoint in this log dir if present
        (capability the reference lacks — SURVEY.md §5 checkpoint/resume).
        """
        from avcer_tpu.core import checkpoint as ckpt_lib

        say = log_fn or (lambda msg: None)
        epochs = epochs if epochs is not None else self.cfg.epochs
        start_epoch = 0
        if resume:
            try:
                state, last_epoch = self.restore_checkpoint(state, "latest")
                start_epoch = last_epoch + 1
                say(f"resumed from epoch {last_epoch}")
                aux_path = os.path.abspath(
                    os.path.join(self.log_dir, "ckpt", "latest_aux.json")
                )
                if os.path.exists(aux_path):
                    import json as _json

                    with open(aux_path) as f:
                        aux = _json.load(f)
                    # best weights are already exported on disk; tracking the
                    # metric/epoch stops a worse post-resume epoch from
                    # overwriting them (state is re-captured on improvement)
                    self.best = {"metric": aux["best_metric"],
                                 "epoch": aux["best_epoch"], "state": None}
                    self.history = list(aux["history"])
            except (FileNotFoundError, ValueError):
                say("no checkpoint to resume from; starting fresh")
        family = best_family or f"best_{self.cfg.model}"
        for epoch in range(start_epoch, epochs):
            state, tr = self.run_epoch(
                state, train_loader, epoch, train=True,
                rng=jax.random.PRNGKey(epoch),
            )
            say(f"epoch {epoch} train: {tr}")
            if eval_loader is not None:
                state, sel_stats = self.run_epoch(
                    state, eval_loader, epoch, train=False
                )
                say(f"epoch {epoch} eval: {sel_stats}")
                phase_name = "eval"
            else:
                # no dev set: NO eval pass is run (an eval over the training
                # data would double epoch cost and pick the most-overfit
                # epoch as 'best'); selection falls back to train metrics
                sel_stats = tr
                phase_name = "train"
            if self.cfg.problem != "regression":
                true, pred = self._last_epoch_outputs
                self.write_confusion_matrix(true, pred, epoch, phase_name)
            if self.maybe_update_best(state, sel_stats, epoch):
                ckpt_lib.save_converted(
                    self.cfg.log_root, family, {"params": self.best["state"]}
                )
                say(f"epoch {epoch}: new best "
                    f"{self.cfg.selection_metric}={self.best['metric']:.4f}")
            self.save_checkpoint(state, epoch, tag="latest")
            self.write_stats_csv()
        return state

    def extract_features(
        self, state: TrainState, loader: Iterable
    ) -> tuple[np.ndarray, np.ndarray]:
        """(logits [N, C], pooled features [N, F]) over a loader — the
        NetTrainer.extract_features capability (net_trainer.py:469-535,
        consumed by run_extract_features.py)."""
        if self._jit_feature_step is None:
            def f(params, batch_stats, x):
                if self.pipe > 1:
                    from avcer_tpu.parallel import pipeline as pp_lib

                    return pp_lib.expr_logits_stacked(
                        self.model, params, batch_stats, x, self.mesh,
                        self.cfg.mesh.pipe_microbatches, return_features=True,
                    )
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.model.apply(
                    variables, x, deterministic=True, return_features=True
                )

            self._jit_feature_step = jax.jit(f)
        logits_all, feats_all = [], []
        for x, _y in loader:
            logits, feats = self._jit_feature_step(
                state.params, state.batch_stats, jnp.asarray(x)
            )
            logits_all.append(np.asarray(logits))
            feats_all.append(np.asarray(feats))
        return np.concatenate(logits_all), np.concatenate(feats_all)

    def maybe_update_best(self, state: TrainState, stats: dict, epoch: int) -> bool:
        metric = stats.get(self.cfg.selection_metric, stats.get("f1", 0.0))
        if metric > self.best["metric"]:
            self.best = {
                "metric": metric,
                "epoch": epoch,
                "state": jax.tree.map(np.asarray, state.params),
            }
            return True
        return False

    # ------------------------------------------------------------------
    def save_checkpoint(self, state: TrainState, epoch: int, tag: str = "latest") -> str:
        """Orbax checkpoint of {params, batch_stats, opt_state, step, epoch} —
        the resume capability the reference lacks (SURVEY.md §5: it only
        saves best-metric weights, net_trainer.py:273-287, with no
        auto-resume)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.log_dir, "ckpt", tag))
        payload = {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, state.opt_state
            ),
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        # sidecar: best-so-far + history, so fit(resume=True) doesn't let
        # the first post-resume epoch overwrite a better earlier export and
        # stats.csv keeps the pre-restart epochs
        import json as _json

        with open(path + "_aux.json", "w") as f:
            _json.dump(
                {
                    "best_metric": float(self.best["metric"]),
                    "best_epoch": int(self.best["epoch"]),
                    "history": self.history,
                },
                f,
            )
        return path

    def restore_checkpoint(self, state: TrainState, tag: str = "latest") -> tuple[TrainState, int]:
        """Restore into an initialized state (shapes/treedef must match)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.log_dir, "ckpt", tag))
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, state.opt_state
            ),
            "step": np.asarray(state.step),
            "epoch": np.asarray(0),
        }
        restored = ckptr.restore(path, target)
        new_state = TrainState(
            params=jax.tree.map(jnp.asarray, restored["params"]),
            batch_stats=jax.tree.map(jnp.asarray, restored["batch_stats"]),
            opt_state=jax.tree.map(
                lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                restored["opt_state"],
            ),
            step=jnp.asarray(restored["step"]),
        )
        return new_state, int(restored["epoch"])

    def write_confusion_matrix(self, true: np.ndarray, pred: np.ndarray,
                               epoch: int, phase: str) -> Optional[str]:
        """Per-epoch confusion-matrix artifact (net_trainer.py:250-317 writes
        SVGs; we write SVG via matplotlib)."""
        if true.size == 0:
            return None
        from avcer_tpu.train import metrics as m
        from avcer_tpu.utils import viz

        n = self.cfg.num_classes
        cm = m.confusion(true, pred, n)
        out_dir = os.path.join(self.log_dir, "confusion")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{phase}_epoch_{epoch:03d}.svg")
        viz.plot_conf_matrix(cm, [str(i) for i in range(n)], save_path=path,
                             title=f"{phase} epoch {epoch}")
        return path

    # ------------------------------------------------------------------
    def write_stats_csv(self) -> str:
        import pandas as pd

        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, "stats.csv")
        pd.DataFrame(self.history).to_csv(path, index=False)
        return path

    def write_provenance(self) -> str:
        """Config + source snapshot of the model/loss classes — the
        experiment-provenance capability (net_trainer.py:83-91 +
        data_utils.get_source_code)."""
        import inspect

        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, "source.log")
        with open(path, "w") as fh:
            fh.write(self.cfg.to_json())
            fh.write("\n\n")
            for obj in (type(self.model), loss_lib, type(self)):
                try:
                    fh.write(f"##### {getattr(obj, '__name__', obj)} #####\n")
                    fh.write(inspect.getsource(obj))
                    fh.write("\n")
                except (OSError, TypeError):
                    fh.write(repr(obj) + "\n")
        return path
