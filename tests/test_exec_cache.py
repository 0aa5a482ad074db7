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


def test_closure_files_scoped_to_real_deps():
    """r5 key design: a program keys on its transitive import closure, so
    edits to tools/, tests, or unrelated subsystems stop invalidating the
    sampler entries (the round-4 snapshot commit poisoned every entry via
    the whole-package hash — VERDICT r4 weak #2)."""
    import os

    from ctrlv_tpu.pipelines import video_control

    files = exec_cache.closure_files(video_control.StableVideoControlPipeline.__call__)
    rel = {os.path.relpath(p, os.path.dirname(os.path.dirname(exec_cache.__file__))) for p in files}
    rel = {p.replace(os.sep, "/") for p in rel}
    # real dependencies are in
    assert any(p.endswith("models/unet_st.py") for p in rel)
    assert any(p.endswith("pipelines/common.py") for p in rel)
    # non-dependencies are out: train/, data/, baseline/ never feed the sampler
    for banned in ("train/", "data/", "baseline/"):
        assert not any(banned in p for p in rel), (banned, sorted(rel))


def test_closure_key_ignores_out_of_closure_edits(monkeypatch, tmp_path):
    """The key must CHANGE when a file inside the fn's import closure is
    edited (stale-hit prevention — the r4 postmortem's bug class) and the
    closure must EXCLUDE unrelated package files (so edits there cannot
    invalidate the entry). Uses a temp seed module so the test can edit
    sources without touching the repo."""
    import importlib.util

    seed = tmp_path / "probe_mod.py"
    seed.write_text(
        "from ctrlv_tpu.utils import packed_params\n"
        "def probe(x):\n"
        "    return x\n"
    )
    spec = importlib.util.spec_from_file_location("probe_mod", seed)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    exec_cache._closure_hash_cache.clear()
    files = exec_cache.closure_files(mod.probe)
    rel = {p.replace("\\", "/") for p in files}
    # the closure follows the seed's ctrlv_tpu imports...
    assert any(p.endswith("utils/packed_params.py") for p in rel), rel
    # ...and excludes unrelated package files (edits there can't poison)
    assert not any("models/" in p or "pipelines/" in p for p in rel), rel

    h1 = exec_cache._closure_hash(mod.probe)
    # per-seed memoization: identical without an edit
    assert exec_cache._closure_hash(mod.probe) == h1
    # an edit INSIDE the closure (even a comment) must change the hash
    seed.write_text(seed.read_text() + "# edited\n")
    exec_cache._closure_hash_cache.clear()
    assert exec_cache._closure_hash(mod.probe) != h1
    # an edit OUTSIDE the closure must NOT change the hash
    (tmp_path / "unrelated.py").write_text("x = 1\n")
    exec_cache._closure_hash_cache.clear()
    h2 = exec_cache._closure_hash(mod.probe)
    (tmp_path / "unrelated.py").write_text("x = 2\n")
    exec_cache._closure_hash_cache.clear()
    assert exec_cache._closure_hash(mod.probe) == h2

    x = jnp.ones((8, 8), jnp.float32)
    # legacy whole-package key is different from the closure key but stable
    monkeypatch.setenv("CTRLV_EXEC_CACHE_KEY", "all")
    k_all = exec_cache._key(f, (x,), None, "")
    assert exec_cache._key(f, (x,), None, "") == k_all


def test_closure_seed_redirects_the_scan(tmp_path):
    """packed_init wraps the caller's init fn in a package-internal
    wrapper; compile_cached(closure_seed=...) must key on the CALLER's
    closure, not the wrapper's, or model edits would stop invalidating
    packed-init entries."""
    import importlib.util

    seed = tmp_path / "caller_mod.py"
    seed.write_text(
        "from ctrlv_tpu import models\n"
        "def init(x):\n"
        "    return x\n"
    )
    spec = importlib.util.spec_from_file_location("caller_mod", seed)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def wrapper(x):  # lives in tests/, like packed_init's lives in utils/
        return mod.init(x)

    x = jnp.ones((4,), jnp.float32)
    exec_cache._closure_hash_cache.clear()
    k_wrapped = exec_cache._key(wrapper, (x,), None, "", closure_seed=mod.init)
    # editing the caller module must change the redirected key
    seed.write_text(seed.read_text() + "# edited\n")
    exec_cache._closure_hash_cache.clear()
    assert exec_cache._key(wrapper, (x,), None, "", closure_seed=mod.init) != k_wrapped


def test_corrupt_entry_falls_back(monkeypatch, tmp_path):
    monkeypatch.setenv("CTRLV_EXEC_CACHE", str(tmp_path))
    x = jnp.ones((8, 8), jnp.float32)
    exec_cache.compile_cached(f, (x,), tag="t")
    (entry,) = tmp_path.glob("t-*.jexec")
    entry.write_bytes(b"garbage")
    c = exec_cache.compile_cached(f, (x,), tag="t")  # must not raise
    assert np.isfinite(np.asarray(c(x))).all()
