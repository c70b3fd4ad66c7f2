"""Persistent XLA compilation-cache support (core/tpuenv.py).

Serving cold-start is compile-dominated (~20-40 s/program on TPU; measured
60 s -> 0.9 s relay hit in BENCH_NOTES round-11). These tests pin the
resolution rules and the end-to-end populate path on the CPU backend.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from avcer_tpu.core.tpuenv import default_compile_cache_dir

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_dir_resolution(monkeypatch):
    # unset -> per-user default
    monkeypatch.delenv("AVCER_COMPILE_CACHE", raising=False)
    assert default_compile_cache_dir().endswith(
        os.path.join(".cache", "avcer_tpu", "xla"))
    # explicit dir wins
    monkeypatch.setenv("AVCER_COMPILE_CACHE", "/x/y")
    assert default_compile_cache_dir() == "/x/y"
    # disable tokens
    for tok in ("0", "off", "NONE", " disabled "):
        monkeypatch.setenv("AVCER_COMPILE_CACHE", tok)
        assert default_compile_cache_dir() == ""


def test_disabled_enable_is_noop(monkeypatch):
    from avcer_tpu.core.tpuenv import enable_compile_cache

    monkeypatch.setenv("AVCER_COMPILE_CACHE", "0")
    assert enable_compile_cache() == ""


@pytest.mark.slow
def test_cache_populates_and_hits(tmp_path):
    """Two fresh processes against one cache dir: the first populates it,
    the second runs correctly against the existing entries (the measured
    relay hit behavior — 60 s -> 0.9 s — is recorded in BENCH_NOTES)."""
    prog = (
        "import jax, jax.numpy as jnp\n"
        "from avcer_tpu.core.tpuenv import enable_compile_cache\n"
        "assert enable_compile_cache() != ''\n"
        "assert float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((16, 16))))"
        " == 16.0 ** 3\n"
    )
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", AVCER_COMPILE_CACHE=str(tmp_path))
    for _ in range(2):
        out = subprocess.run(
            [sys.executable, "-c", prog], env=env, cwd=ROOT,
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
    entries = [f for f in os.listdir(tmp_path) if f.endswith("-cache")]
    assert entries, "cache dir not populated"
