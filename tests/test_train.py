"""Training-subsystem tests: loss parity vs torch, schedule parity vs torch,
metrics parity vs sklearn, and a sharded training smoke run on the 8-device
CPU mesh."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from avcer_tpu.train import losses, metrics, schedules


# ---------------------------------------------------------------------------
# Losses vs torch
# ---------------------------------------------------------------------------


def test_weighted_ce_label_smoothing_matches_torch(rng):
    logits = rng.normal(size=(16, 8)).astype(np.float32)
    labels = rng.integers(0, 8, 16)
    weights = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    want = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels),
        weight=torch.from_numpy(weights), label_smoothing=0.2,
    ).item()
    got = float(
        losses.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights), 0.2
        )
    )
    assert abs(got - want) < 1e-5

    # no weights / no smoothing
    want = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(losses.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5


def test_focal_loss_matches_reference_formula(rng):
    """Spec: loss.py:6-85 — -alpha_y (1-p_y)^gamma log p_y, mean."""
    logits = rng.normal(size=(12, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 12)
    alpha = rng.uniform(0.5, 1.5, 5).astype(np.float32)
    logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    ce = F.nll_loss(logp, torch.from_numpy(labels), weight=torch.from_numpy(alpha),
                    reduction="none")
    pt = logp[torch.arange(12), torch.from_numpy(labels)].exp()
    want = ((1 - pt) ** 2.0 * ce).mean().item()
    got = float(
        losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(alpha), gamma=2.0)
    )
    assert abs(got - want) < 1e-5


def test_soft_focal_loss_matches_reference_formula(rng):
    """Spec: loss.py:88-137."""
    logits = rng.normal(size=(9, 6)).astype(np.float32)
    y = rng.random((9, 6)).astype(np.float32)
    p = torch.softmax(torch.from_numpy(logits), dim=-1).clamp(1e-7, 1 - 1e-7)
    want = ((1 - p) ** 1.5 * (-torch.from_numpy(y) * p.log())).sum(-1).mean().item()
    got = float(
        losses.soft_focal_loss(jnp.asarray(logits), jnp.asarray(y), gamma=1.5)
    )
    assert abs(got - want) < 1e-5

    labels = rng.integers(0, 6, 9)
    want_oh = float(
        losses.soft_focal_loss(
            jnp.asarray(logits), jax.nn.one_hot(jnp.asarray(labels), 6), gamma=0.0
        )
    )
    got_oh = float(
        losses.soft_focal_loss_onehot(jnp.asarray(logits), jnp.asarray(labels), 6)
    )
    assert abs(got_oh - want_oh) < 1e-6


# ---------------------------------------------------------------------------
# Schedule vs torch CosineAnnealingWarmRestarts
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t_mult", [1, 2])
def test_cosine_warm_restarts_matches_torch(t_mult):
    base_lr, t0, iters = 1e-4, 10, 7
    sched = schedules.cosine_warm_restarts(base_lr, t0, iters, t_mult)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=t_mult
    )
    # reference stepping: scheduler.step(epoch + idx/iters) per batch
    # (net_trainer.py:437); ours: schedule(global_step)
    for epoch in range(25):
        for idx in range(iters):
            tsched.step(epoch + idx / iters)
            want = opt.param_groups[0]["lr"]
            got = float(sched(epoch * iters + idx))
            assert abs(got - want) < 1e-9, (epoch, idx, got, want)


# ---------------------------------------------------------------------------
# Metrics vs sklearn
# ---------------------------------------------------------------------------


def test_reference_metrics_match_sklearn(rng):
    from sklearn.metrics import f1_score, precision_score, recall_score

    true = rng.integers(0, 7, 200)
    pred = rng.integers(0, 7, 200)
    u, a, f, p, _ = metrics.reference_metrics(true, pred)
    assert abs(u - recall_score(true, pred, average="macro")) < 1e-12
    assert abs(a - recall_score(true, pred, average="micro")) < 1e-12
    assert abs(f - f1_score(true, pred, average="macro")) < 1e-12
    assert abs(p - precision_score(true, pred, average="macro", zero_division=0)) < 1e-12


def test_fusion_metric_matches_classification_report(rng):
    from sklearn.metrics import classification_report

    true = rng.integers(0, 7, 300)
    pred = rng.integers(0, 7, 300)
    rep = classification_report(true, pred, output_dict=True, zero_division=0)
    want = np.zeros(3)
    for cl in range(1, 7):
        for i, m in enumerate(["precision", "f1-score", "recall"]):
            want[i] += rep[str(cl)][m]
    want /= 6
    got = metrics.fusion_metric(true, pred)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_ccc():
    t = np.array([1.0, 2, 3, 4, 5])
    assert abs(metrics.ccc(t, t) - 1.0) < 1e-12
    assert metrics.ccc(t, t[::-1]) < 0


# ---------------------------------------------------------------------------
# Sharded training smoke (8 virtual CPU devices)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_trainer_smoke_sharded(rng, tmp_path):
    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.trainer import Trainer

    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=w2v2,
                      dtype=jnp.float32)
    cfg = TrainConfig(
        batch_size=8, epochs=1, mesh=MeshConfig(data=4, model=2),
        optim=OptimConfig(lr=1e-3), log_root=str(tmp_path),
    )
    trainer = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=1,
                      wav2vec2_layers=2)
    x = rng.normal(size=(8, 17600)).astype(np.float32)
    y = rng.integers(0, 8, 8)
    state = trainer.init_state(x)
    p0 = jax.tree.map(np.asarray, state.params)

    def loader():
        for _ in range(2):
            yield x, y

    state, stats = trainer.run_epoch(state, loader(), epoch=0, train=True)
    assert np.isfinite(stats["loss"])
    # trainable head moved, frozen wav2vec2 layer 0 did not
    head_before = p0["feature_downsample"]["kernel"]
    head_after = np.asarray(state.params["feature_downsample"]["kernel"])
    assert not np.allclose(head_before, head_after)
    frozen_before = p0["wav2vec2"]["layers_0"]["attention_q_proj"]["kernel"]
    frozen_after = np.asarray(
        state.params["wav2vec2"]["layers_0"]["attention_q_proj"]["kernel"]
    )
    np.testing.assert_array_equal(frozen_before, frozen_after)
    # eval
    state, estats = trainer.run_epoch(state, loader(), epoch=0, train=False)
    assert 0 <= estats["accuracy"] <= 1
    # eval phase logs a real loss too (net_trainer.py logs loss both phases)
    assert np.isfinite(estats["loss"])
    assert trainer.maybe_update_best(state, estats, 0)
    trainer.write_stats_csv()


@pytest.mark.slow
def test_train_visual_dynamic_cli(tmp_path, rng):
    """Dynamic (LSTM) training from dumped feature files end-to-end."""
    import sys

    from avcer_tpu.cli import train_visual

    for i in range(2):
        np.savez(
            tmp_path / f"vid{i}.npz",
            features=rng.normal(size=(40, 512)).astype(np.float32),
            labels=rng.integers(0, 7, 40),
        )
    rc = train_visual.main([
        "--data_root", str(tmp_path), "--model", "dynamic",
        "--epochs", "1", "--batch_size", "8",
        "--log_root", str(tmp_path / "logs"),
    ])
    assert rc == 0
    import os
    runs = os.listdir(tmp_path / "logs")
    assert runs  # stats.csv + checkpoint written under the run dir


def test_ccc_and_mse_losses(rng):
    pred = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    assert abs(float(losses.ccc_loss(pred, pred))) < 1e-4  # perfect -> ~0
    target = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    assert float(losses.ccc_loss(pred, target)) > 0.3  # uncorrelated -> ~1
    assert abs(float(losses.mse_loss(pred, pred))) < 1e-9


@pytest.mark.slow
def test_trainer_regression_mode(rng, tmp_path):
    """VA-task regression: CCC loss + CCC metrics (net_trainer regression
    mode)."""
    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.temporal_lstm import TemporalLSTM
    from avcer_tpu.train.trainer import Trainer

    class Reg(TemporalLSTM):
        def __call__(self, x, deterministic=True, return_features=False):
            out = super().__call__(x)
            return (out, out) if return_features else out

    model = Reg(2, dtype=jnp.float32)  # 2 outputs: valence, arousal
    cfg = TrainConfig(num_classes=2, batch_size=8, loss="ccc",
                      problem="regression", mesh=MeshConfig(data=1),
                      optim=OptimConfig(lr=1e-3), log_root=str(tmp_path))
    tr = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=0,
                 wav2vec2_layers=0)
    x = rng.normal(size=(8, 10, 512)).astype(np.float32)
    y = rng.normal(size=(8, 2)).astype(np.float32)
    state = tr.init_state(x)

    def loader():
        for _ in range(2):
            yield x, y

    state, st = tr.run_epoch(state, loader(), 0, train=True)
    assert np.isfinite(st["loss"])
    state, ev = tr.run_epoch(state, loader(), 0, train=False)
    assert "ccc" in ev and -1 <= ev["ccc"] <= 1


@pytest.mark.slow
def test_trainer_fit_owns_epoch_loop(tmp_path, rng):
    """fit() = the NetTrainer.run equivalent: epoch loop + best export +
    confusion artifacts + stats.csv + resumable latest checkpoint."""
    import glob
    import os

    from avcer_tpu.core.config import OptimConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.trainer import Trainer

    w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=w2v2,
                      dtype=jnp.float32)
    cfg = TrainConfig(batch_size=4, epochs=2, optim=OptimConfig(lr=1e-3),
                      log_root=str(tmp_path), model="v3")
    trainer = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=1,
                      wav2vec2_layers=2)
    x = rng.normal(size=(4, 17600)).astype(np.float32)
    y = rng.integers(0, 8, 4)

    class Loader:
        def __iter__(self):
            for _ in range(2):
                yield x, y

    msgs = []
    state = trainer.init_state(x)
    state = trainer.fit(state, Loader(), log_fn=msgs.append)

    assert os.path.exists(os.path.join(trainer.log_dir, "stats.csv"))
    svgs = glob.glob(os.path.join(trainer.log_dir, "confusion", "*.svg"))
    # no eval loader -> no eval pass (selection on train metrics); the
    # confusion artifact comes from the train phase, one per epoch
    assert len(svgs) == 2
    assert all("train" in os.path.basename(s) for s in svgs)
    assert trainer.best["metric"] >= 0
    # best-weight export family written under log_root
    assert glob.glob(os.path.join(str(tmp_path), "**", "best_v3*"),
                     recursive=True)
    # history holds one train row per epoch (no eval rows without a loader)
    assert [h["epoch"] for h in trainer.history] == [0, 1]

    # resume: a fresh trainer continues from epoch 2 (no re-run of 0/1)
    trainer2 = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=1,
                       wav2vec2_layers=2)
    trainer2.log_dir = trainer.log_dir  # same experiment dir
    state2 = trainer2.init_state(x)
    msgs2 = []
    state2 = trainer2.fit(state2, Loader(), epochs=3, resume=True,
                          log_fn=msgs2.append)
    assert any("resumed from epoch 1" in m for m in msgs2)
    # history (and thus stats.csv) keeps the pre-restart epochs — restored
    # from the checkpoint's aux sidecar — plus the new one
    assert [h["epoch"] for h in trainer2.history] == [0, 1, 2]
    # the restored best metric survives the resume (a worse post-resume
    # epoch must not overwrite the exported best weights): it can only grow
    assert trainer2.best["metric"] >= trainer.best["metric"]


def test_augmentations_match_reference_semantics(rng):
    """WhiteNoise is SNR-relative to std(audio) (wave_augmentation.py:49-53);
    sox_effect/resample equivalents behave sensibly."""
    from avcer_tpu.train import augment

    g = np.random.default_rng(0)
    wav = (rng.normal(size=8000) * 0.3).astype(np.float32)

    noised = augment.white_noise(1e-4, 5e-3)(wav, g)
    resid_std = float(np.std(noised - wav))
    assert 0.5e-4 * 0.3 < resid_std < 1.5 * 5e-3 * 0.3  # scales with std(wav)

    # gain effect: -6 dB halves amplitude
    out = augment.sox_effect([["gain", "-6.0206"]])(wav, g)
    np.testing.assert_allclose(out, wav * 0.5, rtol=1e-4)

    # reverse + norm
    out = augment.sox_effect([["reverse"]])(wav, g)
    np.testing.assert_array_equal(out, wav[::-1])
    out = augment.sox_effect([["norm"]])(wav, g)
    assert abs(np.max(np.abs(out)) - 1.0) < 1e-5

    # speed 2x halves the length (within one sample)
    out = augment.sox_effect([["speed", "2.0"]])(wav, g)
    assert abs(len(out) - 4000) <= 1

    # resample round-trip preserves content approximately
    up = augment.resample(wav, 16000, 32000)
    assert abs(len(up) - 16000) <= 1
    back = augment.resample(up, 32000, 16000)
    assert np.corrcoef(back[100:-100], wav[100:-100])[0, 1] > 0.99

    with pytest.raises(NotImplementedError):
        augment.sox_effect([["flanger"]])(wav, g)
