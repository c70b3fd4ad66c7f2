"""Fusion-weight optimization: Dirichlet sampling + grid search.

Behavior contracts:

- Dirichlet search: 10,000 draws of [M, C] weights (np.random.dirichlet with
  alpha=1 per class, transposed), keep the best fusion metric
  (/root/reference/src/data/utils.py:138-163, seeded np.random.seed(42) at
  get_pred_av.py:339)
- 2-way / 3-way grid search over np.arange(.01, .5, .05)
  (data/utils.py:166-209)
- the metric: macro precision/F1/recall over classes 1..6 from
  classification_report; selection by recall (UAR) — data/utils.py:115-122,
  150-158

TPU design: the reference evaluates candidates in a Python loop (10k sklearn
calls). Here ALL candidates fuse in one einsum and the per-candidate
confusion matrices come from one one-hot contraction — the whole search is
two device programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def dirichlet_weights(
    num_weights: int, num_models: int, num_classes: int, seed: int = 42
) -> np.ndarray:
    """[W, M, C] candidates replicating np.random.dirichlet draw order
    (data/utils.py:141-145: per candidate, dirichlet(size=num_classes).T)."""
    rs = np.random.RandomState(seed)
    out = np.empty((num_weights, num_models, num_classes))
    for i in range(num_weights):
        out[i] = rs.dirichlet(alpha=np.ones(num_models), size=num_classes).T
    return out


@functools.partial(jax.jit, static_argnames=("num_classes", "first_class", "last_class"))
def evaluate_candidates(
    preds: jax.Array,  # [M, N, C] per-model probabilities
    labels: jax.Array,  # [N] int
    weights: jax.Array,  # [W, M, C] candidate weight tensors
    num_classes: int = 7,
    first_class: int = 1,
    last_class: int = 6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """For every candidate: fuse, argmax, macro precision/F1/UAR over classes
    [first_class..last_class]. Returns (uar [W], f1 [W], precision [W])."""
    # fp32-exact einsums: TPU default matmul precision is bf16, which breaks
    # both argmax ties and exact confusion counting
    fused = jnp.einsum(
        "mnc,wmc->wnc", preds, weights, precision=jax.lax.Precision.HIGHEST
    )  # [W, N, C]
    pred_cls = jnp.argmax(fused, axis=-1)  # [W, N]
    onehot_true = jax.nn.one_hot(labels, num_classes)  # [N, C]
    onehot_pred = jax.nn.one_hot(pred_cls, num_classes)  # [W, N, C]
    # confusion[w, t, p] = sum_n true==t & pred==p
    conf = jnp.einsum(
        "nt,wnp->wtp", onehot_true, onehot_pred,
        precision=jax.lax.Precision.HIGHEST,
    )
    tp = jnp.diagonal(conf, axis1=1, axis2=2)  # [W, C]
    support = conf.sum(axis=2)  # [W, C]
    predicted = conf.sum(axis=1)  # [W, C]
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1), 0.0)
    precision = jnp.where(predicted > 0, tp / jnp.maximum(predicted, 1), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    sl = slice(first_class, last_class + 1)
    return (
        recall[:, sl].mean(axis=1),
        f1[:, sl].mean(axis=1),
        precision[:, sl].mean(axis=1),
    )


def search_dirichlet(
    ground_truth: np.ndarray,
    predictions: list[np.ndarray],  # list of [N, C]
    num_weights: int = 10_000,
    num_classes: int | None = None,
    seed: int = 42,
    chunk: int = 1024,
) -> tuple[np.ndarray, float]:
    """get_weights_prob_model equivalent. Returns (best [M, C] weights,
    best UAR). Selection ties resolve to the earliest candidate with a
    strictly greater metric — identical to the reference's ``>`` update."""
    preds = jnp.asarray(np.stack(predictions))  # [M, N, C]
    labels = jnp.asarray(np.asarray(ground_truth, np.int32))
    c = preds.shape[-1] if num_classes is None else num_classes
    cands = dirichlet_weights(num_weights, preds.shape[0], c, seed)
    best_metric, best_idx = -1.0, 0
    for s in range(0, num_weights, chunk):
        w = jnp.asarray(cands[s : s + chunk], jnp.float32)
        uar, _, _ = evaluate_candidates(preds, labels, w, num_classes=c)
        uar = np.asarray(uar)
        i = int(uar.argmax())
        if uar[i] > best_metric:
            best_metric, best_idx = float(uar[i]), s + i
    return cands[best_idx], best_metric


def search_grid(
    ground_truth: np.ndarray,
    predictions: list[np.ndarray],
    grid: np.ndarray | None = None,
) -> tuple[list[float], float]:
    """get_weights_v_model / get_weights_av_model equivalent: exhaustive
    scalar-weight grid over arange(.01, .5, .05) for 2 or 3 models
    (data/utils.py:166-209). All combinations evaluate as one candidate
    tensor."""
    grid = np.arange(0.01, 0.5, 0.05) if grid is None else np.asarray(grid)
    m = len(predictions)
    combos = np.stack(np.meshgrid(*([grid] * m), indexing="ij"), axis=-1).reshape(-1, m)
    preds = jnp.asarray(np.stack(predictions))
    labels = jnp.asarray(np.asarray(ground_truth, np.int32))
    c = preds.shape[-1]
    weights = np.repeat(combos[:, :, None], c, axis=2)  # scalar per model
    best_metric, best_idx = -1.0, 0
    for s in range(0, len(weights), 4096):
        w = jnp.asarray(weights[s : s + 4096], jnp.float32)
        uar, _, _ = evaluate_candidates(preds, labels, w, num_classes=c)
        uar = np.asarray(uar)
        i = int(uar.argmax())
        if uar[i] > best_metric:
            best_metric, best_idx = float(uar[i]), s + i
    return combos[best_idx].tolist(), best_metric
