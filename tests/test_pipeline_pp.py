"""Pipeline-parallel encoder (parallel/pipeline.py) equivalence tests.

The GPipe path must be EXACTLY the sequential encoder's math — same
parameter tree, same layer order — so every test diffs it against plain
``model.apply`` on the same weights. Runs on the virtual 8-device CPU mesh
(conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avcer_tpu.models.audio_heads import ExprModel
from avcer_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from avcer_tpu.parallel import pipeline as pp

TINY = Wav2Vec2Config(
    hidden_size=64, num_layers=4, num_heads=4, intermediate_size=128,
    conv_dim=(16,) * 7,
)


def _model_and_vars(batch: int = 8, samples: int = 17600):
    # 17600 samples -> 52 encoder frames: the head's VALID conv/pool stack
    # needs >= 51 frames, below that it underflows to empty and NaNs (and
    # assert_allclose's default equal_nan=True would pass vacuously)
    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=TINY,
                      dtype=jnp.float32)
    wav = jax.random.normal(jax.random.PRNGKey(1), (batch, samples))
    variables = model.init(jax.random.PRNGKey(0), wav[:1])
    return model, variables, wav


def test_stack_unstack_roundtrip():
    model, variables, _ = _model_and_vars(batch=1)
    enc = variables["params"]["wav2vec2"]
    stacked = pp.stack_layers(enc, TINY.num_layers)
    back = pp.unstack_layers(stacked, TINY.num_layers)
    for i in range(TINY.num_layers):
        jax.tree.map(
            np.testing.assert_array_equal, back[f"layers_{i}"],
            enc[f"layers_{i}"],
        )


@pytest.mark.parametrize("data,pipe,n_micro", [(2, 2, 2), (1, 4, 4), (2, 4, 1)])
def test_forward_equivalence(data, pipe, n_micro):
    model, variables, wav = _model_and_vars(batch=8)
    mesh = pp.make_mesh_dp_pp(data=data, pipe=pipe)
    ref = model.apply(variables, wav)
    assert np.isfinite(np.asarray(ref)).all()  # guard against vacuous NaN==NaN

    got = jax.jit(
        lambda v, x: pp.expr_logits_pipelined(model, v, x, mesh, n_micro)
    )(variables, wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_encoder_hidden_equivalence():
    model, variables, wav = _model_and_vars(batch=4)
    enc = Wav2Vec2Encoder(TINY, dtype=jnp.float32)
    mesh = pp.make_mesh_dp_pp(data=2, pipe=2)
    ref = enc.apply({"params": variables["params"]["wav2vec2"]}, wav)
    assert np.isfinite(np.asarray(ref)).all()
    got = jax.jit(
        lambda p, x: pp.wav2vec2_hidden_pipelined(enc, p, x, mesh, 2)
    )(variables["params"]["wav2vec2"], wav)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grad_equivalence():
    """Gradients through the pipeline (ppermute/scan/psum transposes) match
    the sequential path for every layer AND the head."""
    model, variables, wav = _model_and_vars(batch=4)
    mesh = pp.make_mesh_dp_pp(data=2, pipe=2)
    y = jnp.array([0, 3, 5, 7])

    stats = variables.get("batch_stats", {})

    def loss_seq(params):
        logits = model.apply({"params": params, "batch_stats": stats}, wav)
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits), y[:, None], axis=1
        ).mean()

    def loss_pp(params):
        logits = pp.expr_logits_pipelined(
            model, {"params": params, "batch_stats": stats}, wav, mesh,
            n_micro=2,
        )
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits), y[:, None], axis=1
        ).mean()

    g_seq = jax.jit(jax.grad(loss_seq))(variables["params"])
    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    # guard against vacuous NaN==NaN comparisons
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(g_seq))
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    assert len(flat_seq) == len(flat_pp)
    for key, leaf in flat_seq:
        np.testing.assert_allclose(
            np.asarray(flat_pp[jax.tree_util.keystr(key)]), np.asarray(leaf),
            rtol=5e-4, atol=1e-5, err_msg=jax.tree_util.keystr(key),
        )


def test_dropout_path_runs():
    """Train-mode forward (dropout rngs threaded per tick/stage/layer) is
    finite and deterministic given the same rng."""
    model, variables, wav = _model_and_vars(batch=4)
    mesh = pp.make_mesh_dp_pp(data=2, pipe=2)
    f = jax.jit(
        lambda v, x, r: pp.expr_logits_pipelined(
            model, v, x, mesh, 2, deterministic=False, rng=r,
            mutable=["batch_stats"],
        )
    )
    r = jax.random.PRNGKey(7)
    a, updates_a = f(variables, wav, r)
    b, _ = f(variables, wav, r)
    assert "batch_stats" in updates_a
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_pipe_matches_plain(tmp_path):
    """Trainer with mesh.pipe=2: the stacked leaves really shard over
    'pipe', the deterministic forward (eval/features) matches the plain dp
    trainer bit-for-tolerance on identical init params, and a train step
    honors the per-layer freeze policy on the stacked layout. (Train-mode
    loss/grads can't be compared step-for-step against the plain trainer —
    dropout streams differ by construction, per-shard/tick/stage/layer
    fold_in; deterministic grad equivalence is pinned by
    test_grad_equivalence.)"""
    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.train.trainer import Trainer

    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=TINY,
                      dtype=jnp.float32)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 17600)), np.float32)
    y = np.asarray([0, 1, 2, 3, 4, 5, 6, 7], np.int32)

    def build(mesh_cfg):
        cfg = TrainConfig(batch_size=8, mesh=mesh_cfg,
                          optim=OptimConfig(lr=1e-3),
                          log_root=str(tmp_path))
        tr = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=2,
                     wav2vec2_layers=TINY.num_layers)
        return tr, tr.init_state(x)

    tr_pp, st_pp = build(MeshConfig(data=2, pipe=2, pipe_microbatches=2))
    tr_pl, st_pl = build(MeshConfig(data=2))

    # the stacked leaves are genuinely pipe-sharded
    stacked_leaf = jax.tree.leaves(
        st_pp.params["wav2vec2"]["layers_stacked"])[0]
    assert "pipe" in stacked_leaf.sharding.spec

    # same seed -> same init params (stacking is only a layout change), so
    # the deterministic eval forward must agree across layouts
    ev_pp = tr_pp.eval_step(st_pp, x)
    ev_pl = tr_pl.eval_step(st_pl, x)
    np.testing.assert_allclose(np.asarray(ev_pp), np.asarray(ev_pl),
                               rtol=2e-4, atol=2e-5)
    lg_pp, ft_pp = tr_pp.extract_features(st_pp, [(x, y)])
    lg_pl, ft_pl = tr_pl.extract_features(st_pl, [(x, y)])
    np.testing.assert_allclose(lg_pp, lg_pl, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ft_pp, ft_pl, rtol=2e-4, atol=2e-4)

    # train_step donates the state buffers — snapshot the old params first
    named_old = pp.unstack_encoder_params(
        jax.tree.map(np.asarray, st_pp.params), TINY.num_layers)
    new_pp, loss_pp, logits_pp = tr_pp.train_step(
        st_pp, x, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss_pp))
    assert np.isfinite(np.asarray(logits_pp)).all()

    named_new = pp.unstack_encoder_params(
        jax.tree.map(np.asarray, new_pp.params), TINY.num_layers)
    # frozen layers (0, 1 of 4 with unfreeze_last_n=2) really did not move;
    # unfrozen layers did
    for i in (0, 1):
        jax.tree.map(np.testing.assert_array_equal,
                     named_new["wav2vec2"][f"layers_{i}"],
                     named_old["wav2vec2"][f"layers_{i}"])
    moved = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        named_new["wav2vec2"]["layers_3"], named_old["wav2vec2"]["layers_3"])
    assert max(jax.tree.leaves(moved)) > 0


def test_bad_configs_raise():
    model, variables, wav = _model_and_vars(batch=4)
    enc = variables["params"]["wav2vec2"]
    stacked = pp.stack_layers(enc, TINY.num_layers)
    from avcer_tpu.models.wav2vec2 import EncoderLayerStableLN

    layer = EncoderLayerStableLN(TINY, dtype=jnp.float32)
    h = jnp.zeros((4, 24, TINY.hidden_size))
    mesh3 = pp.make_mesh_dp_pp(data=1, pipe=3)
    with pytest.raises(ValueError, match="do not divide"):
        pp.gpipe_apply(mesh3, layer, stacked, h, 2)
    mesh2 = pp.make_mesh_dp_pp(data=2, pipe=2)
    with pytest.raises(ValueError, match="batch"):
        pp.gpipe_apply(mesh2, layer, stacked, h, 3)
    from avcer_tpu.parallel import mesh as mesh_lib

    with pytest.raises(ValueError, match="pipe"):
        pp.gpipe_apply(mesh_lib.make_mesh(4, 2), layer, stacked, h, 2)


def test_dropout_differs_across_data_shards():
    """Rows at the same local position in different dp shards must draw
    DIFFERENT dropout masks inside the pipelined layers (the rng folds in
    the data-shard index); with identical per-row inputs, correlated masks
    make shard outputs identical — regularization the sequential path
    doesn't have. Tests gpipe_apply directly: the pre-layer feature
    projection has its own full-batch dropout that would mask the bug at
    the logits level."""
    from avcer_tpu.models.wav2vec2 import EncoderLayerStableLN, Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(TINY, dtype=jnp.float32)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 17600))
    variables = enc.init(jax.random.PRNGKey(0), wav)
    layer_mod = EncoderLayerStableLN(TINY, dtype=jnp.float32)
    stacked = pp.stack_layers(variables["params"], TINY.num_layers)
    frames = 52
    h1 = jax.random.normal(jax.random.PRNGKey(2), (1, frames, TINY.hidden_size))
    h = jnp.broadcast_to(h1, (4, frames, TINY.hidden_size))  # identical rows
    mesh = pp.make_mesh_dp_pp(data=2, pipe=2)
    det = pp.gpipe_apply(mesh, layer_mod, stacked, h, 2, True, None)
    d = np.asarray(det)
    # sanity: identical inputs -> identical deterministic outputs (row 0 in
    # shard 0 vs row 2 at the same local position in shard 1)
    np.testing.assert_allclose(d[0], d[2], rtol=1e-5, atol=1e-6)
    out = pp.gpipe_apply(
        mesh, layer_mod, stacked, h, 2, False, jax.random.PRNGKey(7)
    )
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert not np.allclose(a[0], a[2], rtol=1e-4, atol=1e-5)
