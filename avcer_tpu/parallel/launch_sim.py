"""2-process multi-host simulation on virtual CPU devices.

Validates the cross-host story end to end without TPU pods: the launcher
spawns N worker processes (default 2), each backed by 4 virtual CPU
devices; every worker runs

1. ``distributed.initialize`` against a shared coordinator,
2. a GLOBAL (data=4, model=2) mesh over the 8 global devices — the data
   axis spans BOTH processes, so the gradient psum crosses the process
   boundary (DCN stand-in),
3. ``FileShardedSampler`` over a synthetic windowed corpus (shard-by-file),
4. one real SPMD train step of the tiny ExprModelV3 via ``Trainer`` with
   global batches assembled from process-local rows
   (``distributed.global_batch``), plus an eval step with per-host local
   metric rows,
5. ``shard_videos`` disjointness for the serving path.

Run: ``python -m avcer_tpu.parallel.launch_sim [--processes 2]``.
Each worker prints one JSON line; the launcher checks exit codes and the
cross-process agreement of the (replicated) loss, and prints a summary.

SURVEY.md §5 "Distributed communication backend" is the plan this
realizes; the reference has no multi-device story at all.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def worker(process_id: int, num_processes: int, port: int) -> dict:
    # must run before jax import in a fresh process: virtual CPU devices
    os.environ.setdefault(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=4",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from avcer_tpu.core.config import MeshConfig, OptimConfig, TrainConfig
    from avcer_tpu.models.audio_heads import ExprModel
    from avcer_tpu.models.wav2vec2 import Wav2Vec2Config
    from avcer_tpu.parallel import distributed
    from avcer_tpu.parallel import mesh as mesh_lib
    from avcer_tpu.train.trainer import Trainer

    assert distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes
    assert jax.local_device_count() == 4

    # --- serving path: per-video DCN sharding is disjoint + exhaustive ---
    videos = [f"clip_{i:03d}.mp4" for i in range(7)]
    mine = distributed.shard_videos(videos)
    counts = [len(distributed.shard_videos(videos, p, num_processes))
              for p in range(num_processes)]
    assert sum(counts) == len(videos)

    # --- training path ---
    mesh = mesh_lib.make_mesh(data=4, model=2)  # data axis spans processes
    import jax.numpy as jnp

    w2v2 = Wav2Vec2Config(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(16,) * 7,
    )
    model = ExprModel(variant="v3", num_classes=8, wav2vec2_config=w2v2,
                      dtype=jnp.bfloat16)
    import tempfile

    cfg = TrainConfig(batch_size=8, epochs=1, mesh=MeshConfig(data=4, model=2),
                      optim=OptimConfig(lr=1e-3),
                      # per-process scratch dir: the simulation must not
                      # write trainer logs into the caller's CWD
                      log_root=tempfile.mkdtemp(prefix="avcer_sim_logs_"))
    trainer = Trainer(model, cfg, mesh=mesh, iters_per_epoch=2,
                      unfreeze_last_n=1, wav2vec2_layers=2)

    # synthetic windowed corpus: 6 files x 4 windows, deterministic
    rng = np.random.default_rng(0)
    n_samples, n_files = 24, 6
    wavs = rng.normal(size=(n_samples, 17600)).astype(np.float32) * 0.1
    labels = rng.integers(0, 8, n_samples)
    sampler = distributed.FileShardedSampler(
        n_samples, lambda i: f"file_{i // (n_samples // n_files)}",
        local_batch=4, seed=0,
    )
    # disjoint local shards (no file opened by two hosts)
    other = distributed.FileShardedSampler(
        n_samples, lambda i: f"file_{i // (n_samples // n_files)}",
        local_batch=4, process_index=(process_id + 1) % num_processes,
        process_count=num_processes, seed=0,
    )
    assert not set(sampler.local_indices) & set(other.local_indices)

    state = trainer.init_state(wavs[:1])
    # fp32 master weights: params + momenta stay fp32 under bf16 compute
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    step_rng = jax.random.PRNGKey(0)
    losses = []
    for batch_idx in sampler.epoch(0)[:2]:
        state, loss, logits = trainer.train_step(
            state, wavs[batch_idx], labels[batch_idx], step_rng
        )
        losses.append(float(loss))
        local = distributed.local_rows(logits)
        assert local.shape == (4, 8), local.shape
    eval_logits, eval_loss = trainer.eval_step(
        state, wavs[sampler.epoch(1)[0]], labels[sampler.epoch(1)[0]]
    )
    assert eval_logits.shape == (4, 8)
    return {
        "process_id": process_id,
        "local_videos": len(mine),
        "local_samples": int(sampler.local_indices.size),
        "batches_per_epoch": sampler.batches_per_epoch,
        "losses": losses,
        "eval_loss": float(eval_loss),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--port", type=int, default=19731)
    p.add_argument("--worker", type=int, default=None, help="internal")
    args = p.parse_args(argv)

    if args.worker is not None:
        print(json.dumps(worker(args.worker, args.processes, args.port)))
        return 0

    procs = []
    for i in range(args.processes):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # each worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "avcer_tpu.parallel.launch_sim",
                 "--worker", str(i), "--processes", str(args.processes),
                 "--port", str(args.port)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
                text=True,
            )
        )
    reports = []
    for i, proc in enumerate(procs):
        out, err = proc.communicate(timeout=1200)
        if proc.returncode != 0:
            sys.stderr.write(f"worker {i} failed:\n{err[-4000:]}\n")
            return 1
        reports.append(json.loads(out.strip().splitlines()[-1]))
    # the loss is a replicated scalar of ONE global program: all processes
    # must agree bit-for-bit, and local shards must tile the corpus
    losses = {tuple(r["losses"]) for r in reports}
    assert len(losses) == 1, f"processes diverged: {losses}"
    assert sum(r["local_videos"] for r in reports) == 7
    summary = {
        "ok": True,
        "processes": args.processes,
        "losses": reports[0]["losses"],
        "eval_loss": reports[0]["eval_loss"],
        "local_samples": [r["local_samples"] for r in reports],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
