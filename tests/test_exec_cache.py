"""utils/exec_cache.py: cross-process executable cache (keyed on package
sources + arg avals + device/flags, NOT the lowered program — tracing is
itself a major cold cost) — the persistent-compile-cache layer the axon
TPU helper bypasses (PERF.md round-3/4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.utils import exec_cache


def f(x):
    return jnp.sin(x) @ x.T


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("CTRLV_EXEC_CACHE", raising=False)
    assert exec_cache.cache_dir() is None  # conftest pins JAX_PLATFORMS=cpu


def test_env_overrides(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", "0")
    assert exec_cache.cache_dir() is None
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    assert exec_cache.cache_dir() == str(tmp_path)


def test_compile_roundtrip_and_hit(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
    c1 = exec_cache.compile_cached(f, (x,), tag="t")
    files = list(tmp_path.glob("t-*.jexec"))
    assert len(files) == 1
    # second call with identical program must load the SAME entry
    c2 = exec_cache.compile_cached(f, (x,), tag="t")
    assert list(tmp_path.glob("t-*.jexec")) == files
    np.testing.assert_allclose(np.asarray(c1(x)), np.asarray(c2(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c1(x)), np.sin(np.asarray(x)) @ np.asarray(x).T, rtol=1e-5)


def test_key_changes_with_program_and_options(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    x = jnp.ones((8, 8), jnp.float32)
    exec_cache.compile_cached(f, (x,), tag="t")
    exec_cache.compile_cached(lambda x: jnp.cos(x) @ x.T, (x,), tag="t")
    assert len(list(tmp_path.glob("t-*.jexec"))) == 2


def test_prune_keeps_newest_under_budget(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    for i, name in enumerate(["old.jexec", "mid.jexec", "new.jexec"]):
        p = tmp_path / name
        p.write_bytes(b"x" * 100)
        import os

        os.utime(p, (1000 + i, 1000 + i))
    monkeypatch.setattr(exec_cache, "_MAX_BYTES", 250)
    exec_cache._prune(str(tmp_path))
    left = sorted(p.name for p in tmp_path.glob("*.jexec"))
    assert left == ["mid.jexec", "new.jexec"]


def test_corrupt_entry_falls_back(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    x = jnp.ones((8, 8), jnp.float32)
    exec_cache.compile_cached(f, (x,), tag="t")
    (entry,) = tmp_path.glob("t-*.jexec")
    entry.write_bytes(b"garbage")
    c = exec_cache.compile_cached(f, (x,), tag="t")  # must not raise
    assert np.isfinite(np.asarray(c(x))).all()
