"""Multi-host scale-out: process bring-up, per-video DCN sharding for
batch serving, and a file-sharded training loader with global-batch
assembly.

The reference is strictly single-GPU (SURVEY.md §5: every device string a
hard-coded "cuda:0"; the only host parallelism is DataLoader workers,
train_c_audio.py:225-230). The TPU-native scale-out story this module
implements:

- **within a host / pod slice**: the (data, model) mesh of
  ``parallel/mesh.py`` shards batches and the wav2vec2 tensors over ICI —
  unchanged here.
- **across hosts (DCN)**: serving shards whole VIDEOS — clips are
  embarrassingly parallel, so no collective ever crosses DCN
  (``shard_videos``); training shards the corpus BY FILE across processes
  (``FileShardedSampler``) and assembles each global batch from
  process-local shards (``global_batch``), so each host touches only its
  own files and gradient all-reduces ride the compiled program's psum.

Process bring-up is ``initialize()`` — a thin, idempotent wrapper over
``jax.distributed.initialize`` that no-ops in single-process runs, so every
CLI can call it unconditionally. A 2-process × 4-virtual-device CPU
simulation of the whole story (init → mesh over 8 global devices →
file-sharded loader → one SPMD train step) lives in
``python -m avcer_tpu.parallel.launch_sim`` and is exercised by
``tests/test_distributed.py``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Bring up jax.distributed when a multi-process run is configured;
    no-op (returns False) otherwise.

    Explicit arguments win; with none given, the standard environment
    variables are probed (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID — also honored natively by jax.distributed, plus the
    TPU pod metadata auto-detect jax ships). Safe to call more than once.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    given = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
    }
    missing = [k for k, v in given.items() if v is None]
    if len(missing) == 3:
        return False  # nothing configured: single-process run
    if missing:
        # a PARTIALLY specified multi-process config (e.g. a typo'd env var
        # on one host) must fail fast — silently falling back to
        # single-process would train N independent replicas with no
        # gradient sync and no error
        raise ValueError(
            "multi-process config incomplete: "
            + ", ".join(f"{k}={v!r}" for k, v in given.items())
            + f" — missing {missing}. Set all three (args or "
            "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) "
            "or none."
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def shard_videos(
    paths: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list[str]:
    """Per-video DCN sharding for batch serving: deterministic round-robin
    over the SORTED path list, so every process computes the same global
    assignment with no communication (videos are embarrassingly parallel —
    SURVEY.md §5). Each process then runs its local list through the
    ordinary single-host pipeline / ``run_many``."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(sorted(paths)) if i % pc == pi]


class FileShardedSampler:
    """Shard a windowed corpus BY FILE across processes.

    The reference's datasets group samples by source file (one label txt /
    wav per clip — abaw_expr_dataset.py:216-260); sharding by file keeps
    each host's IO local (it only ever opens its own files) and keeps label
    statistics roughly balanced. Within the local shard, batches are drawn
    with a seeded per-epoch shuffle; every process draws the SAME number of
    batches per epoch (the minimum across processes, so the SPMD train step
    is dispatched in lockstep — a straggler process would otherwise hang
    the collective).

    ``file_of``: maps a sample index to its file key. The sampler yields
    lists of LOCAL sample indices of length ``local_batch``.
    """

    def __init__(
        self,
        num_samples: int,
        file_of,
        local_batch: int,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        seed: int = 0,
        drop_last: bool = True,
    ):
        import jax

        self.pi = jax.process_index() if process_index is None else process_index
        self.pc = jax.process_count() if process_count is None else process_count
        self.local_batch = int(local_batch)
        self.seed = seed
        self.drop_last = drop_last
        files = sorted({file_of(i) for i in range(num_samples)})
        proc_of_file = {f: j % self.pc for j, f in enumerate(files)}
        self.local_indices = np.asarray(
            [i for i in range(num_samples) if proc_of_file[file_of(i)] == self.pi],
            np.int64,
        )
        # lockstep batch count: min local-shard batches across processes,
        # computed analytically from the file assignment (no communication)
        per_proc = [0] * self.pc
        for i in range(num_samples):
            per_proc[proc_of_file[file_of(i)]] += 1
        n_min = min(per_proc)
        self.batches_per_epoch = (
            n_min // self.local_batch
            if drop_last
            else -(-n_min // self.local_batch)
        )

    def epoch(self, epoch: int) -> list[np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(self.local_indices)
        out = []
        for b in range(self.batches_per_epoch):
            batch = order[b * self.local_batch : (b + 1) * self.local_batch]
            if len(batch) < self.local_batch:
                # pad by wrapping (non-drop_last tail); lockstep requires
                # every process to dispatch a full-shape batch
                batch = np.concatenate(
                    [batch, order[: self.local_batch - len(batch)]]
                )
            out.append(batch)
        return out


def global_batch(mesh, local_x: np.ndarray, spec=None):
    """Assemble a GLOBAL jax.Array for the train step from this process's
    local shard: the global batch axis is the concatenation of every
    process's ``local_x`` (in process order). Single-process runs fall back
    to a plain device_put so the trainer code path is identical."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data") if spec is None else spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_x), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_x)
    )


def local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array (e.g. the train
    step's logits), concatenated in global batch order. Metrics accumulate
    per host over local rows; single-process returns the full array."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    pieces: dict[int, np.ndarray] = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        pieces[start] = np.asarray(s.data)  # model-axis replicas dedupe here
    return np.concatenate([pieces[k] for k in sorted(pieces)], axis=0)
