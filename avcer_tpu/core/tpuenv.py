"""Process-level TPU environment knobs that must be set before libtpu loads.

The fused Pallas kernels (ops/pallas/fused_resnet_kernel.py,
fused_ssh_kernel.py) hold a whole bottleneck chain's temporaries on the
Mosaic VMEM stack; at serving band sizes that exceeds libtpu's default 16 MiB
scoped-vmem limit (measured: 47.8 MiB for the r50 layer1 chain at band 30 on
v5e, which has 128 MiB VMEM/core). ``--xla_tpu_scoped_vmem_limit_kib`` is a
libtpu flag — it is NOT accepted in ``XLA_FLAGS`` (host XLA aborts on the
unknown flag) and must ride ``LIBTPU_INIT_ARGS`` before the first backend
init. Verified to propagate through the axon remote-compile relay
(experiments/exp_r7_results.jsonl: band-30 compile OK under the flag,
VMEM-OOM without).
"""

from __future__ import annotations

import os

SCOPED_VMEM_KIB = 65536  # 64 MiB of 128 MiB v5e VMEM; leaves XLA headroom


def ensure_scoped_vmem(kib: int = SCOPED_VMEM_KIB) -> None:
    """Append --xla_tpu_scoped_vmem_limit_kib to LIBTPU_INIT_ARGS (no-op if
    the caller already set one). Must run before jax initializes the TPU
    backend; safe to call multiple times."""
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" in cur:
        return
    flag = f"--xla_tpu_scoped_vmem_limit_kib={kib}"
    os.environ["LIBTPU_INIT_ARGS"] = f"{cur} {flag}".strip()


_CACHE_DISABLE_TOKENS = ("0", "off", "none", "disabled")


def default_compile_cache_dir() -> str:
    """$AVCER_COMPILE_CACHE if set (the tokens 0/off/none/disabled turn the
    cache off → ""), else the per-user default ~/.cache/avcer_tpu/xla."""
    env = os.environ.get("AVCER_COMPILE_CACHE")
    if env is not None:
        return "" if env.strip().lower() in _CACHE_DISABLE_TOKENS else env
    return os.path.join(os.path.expanduser("~"), ".cache", "avcer_tpu", "xla")


def enable_compile_cache(path: str = "") -> str:
    """Turn on JAX's persistent compilation cache at ``path`` (default:
    :func:`default_compile_cache_dir`; ``AVCER_COMPILE_CACHE=0`` disables —
    then this is a no-op returning "").

    Serving cold-start is dominated by XLA compilation — ~20-40 s per
    program on a directly-attached TPU and 10-15 min through this dev
    harness's remote-compile relay (BENCH_NOTES). The reference pays the
    analogous torch/TF model-load + cudnn-autotune cost on every process
    start with no mitigation (/root/reference/src/run.py:192-221 builds all
    models inline). With a cache dir every jitted serving/training program
    is compiled once per (machine, jax version, program) and then loaded
    from disk on later process starts, so a serving fleet restarts warm.

    Thresholds are zeroed so even the small per-stage programs (decode,
    fusion, windowing) are cached — a serving process runs ~a dozen
    programs and the misses are exactly the cheap ones otherwise.

    Measured through this harness's remote-compile relay: a second process
    loads a cached executable in 0.9 s where the cold compile took 60 s
    (the cache is keyed on program + jax version + backend, so hits are
    exact; a directly-attached chip sees the same ~20-40 s → sub-second
    drop). Write failures degrade to a warning + normal compile.
    """
    path = path or default_compile_cache_dir()
    if not path:
        return ""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
