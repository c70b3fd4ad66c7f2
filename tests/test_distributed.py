"""Multi-host scale-out tests (parallel/distributed.py + launch_sim.py).

Fast tests exercise the host-side sharding logic with explicit
process_index/process_count (no jax.distributed needed); the slow test
runs the REAL 2-process x 4-virtual-CPU-device simulation — cross-process
mesh, file-sharded loader, one SPMD train step with the gradient psum
crossing the process boundary (SURVEY.md §5's DCN story).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from avcer_tpu.parallel import distributed


def test_shard_videos_disjoint_exhaustive_deterministic():
    paths = [f"b_{i}.mp4" for i in range(5)] + [f"a_{i}.mp4" for i in range(6)]
    shards = [distributed.shard_videos(paths, p, 3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(paths)
    assert not set(shards[0]) & set(shards[1])
    # deterministic: based on sorted order, not input order
    assert shards[0] == distributed.shard_videos(list(reversed(paths)), 0, 3)


def test_file_sharded_sampler_disjoint_and_lockstep():
    # 5 files x 6 windows: uneven split across 2 processes (3 vs 2 files)
    file_of = lambda i: f"f{i // 6}"
    s0 = distributed.FileShardedSampler(30, file_of, local_batch=4,
                                        process_index=0, process_count=2)
    s1 = distributed.FileShardedSampler(30, file_of, local_batch=4,
                                        process_index=1, process_count=2)
    assert not set(s0.local_indices) & set(s1.local_indices)
    assert len(s0.local_indices) + len(s1.local_indices) == 30
    # every index of a file lands on ONE process
    for i in range(30):
        owners = [i in s0.local_indices, i in s1.local_indices]
        assert sum(owners) == 1
    # lockstep: both processes dispatch the SAME number of batches even
    # though the shards are uneven (18 vs 12 samples -> min 12 -> 3 batches)
    assert s0.batches_per_epoch == s1.batches_per_epoch == 3
    # deterministic per-epoch shuffle, different across epochs
    e0 = s0.epoch(0)
    assert all(len(b) == 4 for b in e0)
    np.testing.assert_array_equal(
        np.concatenate(e0), np.concatenate(s0.epoch(0))
    )
    assert not np.array_equal(np.concatenate(e0), np.concatenate(s0.epoch(1)))
    # batches only contain the local shard
    assert set(np.concatenate(e0)) <= set(s0.local_indices)


def test_file_sharded_sampler_wrap_pad():
    # non-drop_last: tail batch pads by wrapping to keep the SPMD shape
    s = distributed.FileShardedSampler(
        10, lambda i: f"f{i}", local_batch=4, process_index=0,
        process_count=2, drop_last=False,
    )
    batches = s.epoch(0)
    assert s.batches_per_epoch == 2  # 5 local samples -> ceil(5/4)
    assert all(len(b) == 4 for b in batches)


def test_global_batch_single_process_passthrough():
    import jax

    from avcer_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(data=4, model=2)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = distributed.global_batch(mesh, x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    np.testing.assert_array_equal(distributed.local_rows(arr), x)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data")


def test_fp32_master_weights_under_bf16_compute(tmp_path):
    """Training contract: compute runs bf16 (model dtype) but the master
    params AND the Adam moments live in fp32 — flax param_dtype default
    plus optax init from fp32 params (the scale story ROADMAP r2 #4 asked
    to pin down)."""
    import jax
    import jax.numpy as jnp

    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.train.trainer import Trainer

    w2v2 = Wav2Vec2Config(hidden_size=64, num_layers=2, num_heads=4,
                          intermediate_size=128, conv_dim=(16,) * 7)
    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=w2v2,
                      dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=4, mesh=MeshConfig(data=4, model=2),
                      optim=OptimConfig(lr=1e-3), log_root=str(tmp_path))
    trainer = Trainer(model, cfg, iters_per_epoch=2, unfreeze_last_n=1,
                      wav2vec2_layers=2)
    x = np.zeros((1, 17600), np.float32)
    state = trainer.init_state(x)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    # Adam moments track the fp32 master params
    float_moments = [
        l for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert float_moments
    for leaf in float_moments:
        assert leaf.dtype == jnp.float32, leaf.dtype
    # and the bf16 compute path is real: logits come back bf16-derived
    logits = trainer.eval_step(state, np.zeros((4, 17600), np.float32))
    assert logits.shape == (4, 8)


def test_initialize_noop_without_config(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize() is False


def test_initialize_raises_on_partial_config(monkeypatch):
    """A partially specified multi-process config (typo'd env var on one
    host) must fail fast — a silent single-process fallback would train N
    independent replicas with no gradient sync and no error."""
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="incomplete"):
        distributed.initialize(num_processes=4, process_id=1)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    with pytest.raises(ValueError, match="incomplete"):
        distributed.initialize()


@pytest.mark.slow
def test_two_process_cpu_simulation():
    """The real thing: 2 processes x 4 virtual CPU devices, shared
    coordinator, (data=4, model=2) global mesh, file-sharded loader, one
    SPMD train step + eval step. Asserts in-worker cover shard
    disjointness, fp32 master weights, local logit shapes; the launcher
    asserts bit-identical replicated losses across processes."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "avcer_tpu.parallel.launch_sim",
         "--processes", "2", "--port", "19841"],
        capture_output=True, text=True, timeout=1500, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-4000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"] and summary["processes"] == 2
    assert all(np.isfinite(summary["losses"]))
    assert np.isfinite(summary["eval_loss"])
    assert summary["local_samples"] == [12, 12]  # 6 files x 4 windows, 3|3
