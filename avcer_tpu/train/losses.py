"""Training losses with torch-matching semantics.

Behavior contracts:

- class-weighted CrossEntropy with label_smoothing=0.2
  (/root/reference/src/audio/train_c_audio.py:236-243): torch semantics —
  per-sample weight w[y_i], mean reduction normalized by sum of sample
  weights, smoothing distributes ``ls/C`` to every class.
- FocalLoss (hard targets)  /root/reference/src/audio/loss/loss.py:6-85
- SoftFocalLoss             loss.py:88-137 (clip eps 1e-7, sum over classes,
  mean over batch)
- SoftFocalLossWrapper      loss.py:140-166 (one-hot adapter)
- mixup                     net_trainer.py:574-604 semantics: convex input
  mix + convex loss mix (implemented in trainer)

Parity is tested against torch.nn.functional in tests/test_train.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jax.Array,  # [B, C]
    labels: jax.Array,  # [B] int
    class_weights: Optional[jax.Array] = None,  # [C]
    label_smoothing: float = 0.0,
) -> jax.Array:
    """torch.nn.CrossEntropyLoss(weight=..., label_smoothing=...) equivalent,
    mean reduction (normalized by the sum of per-sample class weights)."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    target = onehot * (1.0 - label_smoothing) + label_smoothing / c
    if class_weights is None:
        per_class = -target * logp  # [B, C]
        return per_class.sum(-1).mean()
    w = class_weights.astype(jnp.float32)
    # torch: loss_i = -sum_c q_c * w_c * logp_c ; mean = sum_i loss_i / sum_i w[y_i]
    per_sample = -(target * w[None, :] * logp).sum(-1)
    return per_sample.sum() / w[labels].sum()


def focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: Optional[jax.Array] = None,
    gamma: float = 0.0,
    reduction: str = "mean",
) -> jax.Array:
    """Hard-target focal loss (loss.py:6-85): -alpha_y (1-p_y)^gamma log p_y."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    log_pt = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    ce = -log_pt
    if alpha is not None:
        ce = ce * alpha.astype(jnp.float32)[labels]
    focal = (1.0 - jnp.exp(log_pt)) ** gamma
    loss = focal * ce
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def soft_focal_loss(
    logits_or_probs: jax.Array,  # [B, C]
    soft_targets: jax.Array,  # [B, C]
    alpha: Optional[jax.Array] = None,
    gamma: float = 0.0,
    apply_softmax: bool = True,
) -> jax.Array:
    """Soft-target focal loss (loss.py:88-137)."""
    p = (
        jax.nn.softmax(logits_or_probs.astype(jnp.float32), axis=-1)
        if apply_softmax
        else logits_or_probs.astype(jnp.float32)
    )
    eps = 1e-7
    p = jnp.clip(p, eps, 1.0 - eps)
    ce = -soft_targets.astype(jnp.float32) * jnp.log(p)
    a = 1.0 if alpha is None else alpha.astype(jnp.float32)
    loss = a * (1.0 - p) ** gamma * ce
    return loss.sum(-1).mean()


def soft_focal_loss_onehot(
    logits: jax.Array,
    labels: jax.Array,
    num_classes: int,
    alpha: Optional[jax.Array] = None,
    gamma: float = 0.0,
) -> jax.Array:
    """SoftFocalLossWrapper (loss.py:140-166): one-hot then soft focal."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return soft_focal_loss(logits, onehot, alpha=alpha, gamma=gamma)


def ccc_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """1 - mean CCC over output dims — the VA-task regression loss
    (metric definition: accuracy_utils.py:124-223). pred/target: [B, D]."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pm = pred.mean(0)
    tm = target.mean(0)
    pv = pred.var(0)
    tv = target.var(0)
    cov = ((pred - pm) * (target - tm)).mean(0)
    ccc = 2 * cov / (pv + tv + (pm - tm) ** 2 + 1e-8)
    return 1.0 - ccc.mean()


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def mixup_batch(
    rng: jax.Array, x: jax.Array, alpha: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample mixup coefficients and a permutation (net_trainer.py:574-604
    semantics: one Beta(alpha, alpha) lambda per batch, shuffled pairing).

    Returns (mixed_x, permutation, lambda)."""
    rng_lam, rng_perm = jax.random.split(rng)
    lam = jax.random.beta(rng_lam, alpha, alpha)
    perm = jax.random.permutation(rng_perm, x.shape[0])
    mixed = lam * x + (1.0 - lam) * x[perm]
    return mixed, perm, lam
