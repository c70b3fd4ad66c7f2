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
