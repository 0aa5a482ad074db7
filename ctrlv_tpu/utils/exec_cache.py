"""Persistent compiled-executable cache for the big sampler programs.

The usual fix for cold starts is jax's persistent compilation cache
(`jax_compilation_cache_dir`) — but the axon TPU tunnel routes compiles
through a remote helper that bypasses it entirely (measured in PERF.md
round-3: /tmp/jax_cache stays empty, full-pipeline cold compiles cost
100-300+ s on a 1-core host). This module rebuilds that layer one level
up: serialize the *compiled executable* (jax.experimental
.serialize_executable) and deserialize on the next process start. A warm
start then skips trace, lower, AND compile (measured: the Box2Video
sampler pays 51 s trace+lower + 420 s helper-cold compile on this host;
a cache hit loads the 453 MB sampler entry in ~5 s and the 442 MB
four-model init entry in ~14 s).

Axon timing caveat (measured, PERF.md round-4): under the axon tunnel,
`block_until_ready` returns EARLY while deferred compile or executable
upload is still queued — a freshly loaded executable's first call can
"block" in 0.00 s while the real work happens at the first host
transfer. Results are correct either way (execution is forced by any
np.asarray/device_get); only block-based *timing* lies. Anything that
times a cached executable must fence on a host-materialized scalar
(see bench.py::run_fenced).

Keying: because tracing itself is the second-biggest cold cost, the key
deliberately does NOT hash the lowered program. It hashes everything the
program is a function of instead: the SOURCE CLOSURE of the entry
function (its defining module plus every ctrlv_tpu module transitively
reachable from it through static imports — round-4's whole-package hash
meant ANY edit, even to tools/ or an unrelated subsystem, poisoned every
entry; that is exactly how the round-4 snapshot commit cost the driver
~18 min of cold start), jax/flax versions, device kind/count, XLA env
flags, compiler options, the function's qualname, arg avals/treedef, and
a caller-provided key_extra for static config that shapes don't capture
(e.g. the SamplingConfig). Any closure-source edit, shape change, or
flag change misses the cache and recompiles; a hit on a
stale-but-matching key is impossible unless the program depends on state
outside that closure (don't do that; note dynamic importlib tricks are
invisible to the static scan — the package has none). Set
CTRLV_EXEC_CACHE_KEY=all to fall back to the whole-package hash.
Deserialization failures fall back to a fresh compile and overwrite the
entry.

Enabled by default on TPU backends (where the helper bypass bites);
disable with CTRLV_EXEC_CACHE=0, redirect with CTRLV_EXEC_CACHE=<dir>.
The reference has no analog — torch.compile caches per-process only
(/root/reference/tools/train_video_diffusion.py warms up by just running).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import time
from typing import Any, Callable, Dict, Optional

import jax

_DEFAULT_DIR = "/tmp/ctrlv_exec_cache"
_DEBUG = os.environ.get("CTRLV_EXEC_CACHE_DEBUG", "") == "1"
# Entries are large (the full sampler serializes to ~450 MB) and every
# source edit re-keys, so stale entries accumulate fast. Keep the most
# recently USED entries under this byte budget (mtime is bumped on hits).
_MAX_BYTES = int(os.environ.get("CTRLV_EXEC_CACHE_MAX_BYTES", 6 * 1024**3))


def _prune(cdir: str) -> None:
    try:
        entries = []
        for n in os.listdir(cdir):
            if n.endswith(".jexec"):
                p = os.path.join(cdir, n)
                st = os.stat(p)
                entries.append((st.st_mtime, st.st_size, p))
        entries.sort(reverse=True)  # newest first
        total = 0
        for mtime, size, p in entries:
            total += size
            if total > _MAX_BYTES:
                os.remove(p)
                _dbg(f"pruned {os.path.basename(p)} ({size >> 20} MB)")
    except OSError:
        pass


def _dbg(msg: str) -> None:
    if _DEBUG:
        print(f"[exec_cache] {msg}", file=sys.stderr, flush=True)


def cache_dir() -> Optional[str]:
    """Resolved cache directory, or None when the cache is disabled."""
    env = os.environ.get("CTRLV_EXEC_CACHE", "")
    if env == "0":
        return None
    if env:
        return env
    # Default on for TPU only: CPU/GPU backends already honor jax's own
    # persistent cache, and the virtual-mesh CPU tests rely on it.
    if jax.default_backend() != "tpu":
        return None
    return _DEFAULT_DIR


_src_hash_cache: Optional[str] = None


def _source_hash() -> str:
    """Hash of every .py under the ctrlv_tpu package plus the repo-root
    top-level scripts (bench.py, __graft_entry__.py, ...).

    Round-4 legacy key (CTRLV_EXEC_CACHE_KEY=all) and the fallback when
    the closure scan fails. Deliberately does NOT hash __main__: the same
    cached program must key identically whether it is built by `python
    bench.py`, an import of __graft_entry__ from an external harness, or
    a `python -c` pre-warm — every compile_cached call site lives in the
    hashed sources, and config that shapes the traced program beyond
    avals goes through key_extra."""
    global _src_hash_cache
    if _src_hash_cache is not None:
        return _src_hash_cache
    h = hashlib.sha256()
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    files = []
    for root, _dirs, names in os.walk(pkg_root):
        files.extend(os.path.join(root, n) for n in names if n.endswith(".py"))
    try:
        files.extend(
            os.path.join(repo_root, n)
            for n in os.listdir(repo_root)
            if n.endswith(".py")
        )
    except OSError:
        pass
    for f in sorted(files):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    _src_hash_cache = h.hexdigest()
    return _src_hash_cache


_PKG_NAME = "ctrlv_tpu"
_closure_hash_cache: Dict[str, str] = {}


def _module_file(modname: str, pkg_root: str) -> Optional[str]:
    """Map a ctrlv_tpu.<...> dotted name to its source file, if it exists."""
    rel = modname.split(".")[1:]  # drop the package name
    base = os.path.join(pkg_root, *rel)
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.isfile(cand):
            return cand
    return None


def _imports_of(path: str, modname: str) -> set:
    """Dotted ctrlv_tpu module names statically imported by `path`.

    Walks the whole AST, so imports inside function bodies (the package's
    lazy-import idiom) are seen. `from pkg.mod import name` adds both
    pkg.mod and pkg.mod.name (the latter resolves only if it is itself a
    module). Relative imports resolve against `modname`'s package."""
    import ast

    try:
        tree = ast.parse(open(path, "rb").read())
    except SyntaxError:
        return set()
    is_pkg = os.path.basename(path) == "__init__.py"
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == _PKG_NAME or a.name.startswith(_PKG_NAME + "."):
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                base = node.module or ""
            else:
                # resolve `from ..x import y` against this module's package
                parts = modname.split(".")
                # package of this module: drop trailing component unless
                # this file IS a package __init__
                pkg_parts = parts if is_pkg else parts[:-1]
                up = node.level - 1
                if up > len(pkg_parts):
                    continue
                anchor = pkg_parts[: len(pkg_parts) - up]
                base = ".".join(anchor + ([node.module] if node.module else []))
            if not (base == _PKG_NAME or base.startswith(_PKG_NAME + ".")):
                continue
            out.add(base)
            for a in node.names:
                out.add(base + "." + a.name)
    return out


def closure_files(fn: Callable) -> list:
    """Sorted source files in the transitive ctrlv_tpu closure of fn.

    The seed is the file that DEFINES fn (bench.py, __graft_entry__.py, a
    pipeline module, ...); BFS over static ctrlv_tpu imports from there."""
    import inspect

    seed = inspect.getsourcefile(fn)
    if seed is None:
        raise ValueError("no source file")
    seed = os.path.abspath(seed)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def name_of(path: str) -> str:
        rel = os.path.relpath(path, os.path.dirname(pkg_root))
        parts = rel[:-3].split(os.sep)  # strip .py
        if parts[-1] == "__init__":
            parts = parts[:-1]
        return ".".join(parts)

    seed_mod = (
        name_of(seed)
        if seed.startswith(pkg_root + os.sep)
        # out-of-package seeds (bench.py, tests) have no relative imports
        else _PKG_NAME + ".__seed__"
    )
    files = {seed}
    frontier = [(seed, seed_mod)]
    seen_mods = set()
    while frontier:
        path, modname = frontier.pop()
        for imp in _imports_of(path, modname):
            # walk up the dotted name: ctrlv_tpu.a.b pulls a/__init__ too
            parts = imp.split(".")
            for i in range(1, len(parts) + 1):
                sub = ".".join(parts[:i])
                if sub in seen_mods:
                    continue
                seen_mods.add(sub)
                f = _module_file(sub, pkg_root)
                if f and f not in files:
                    files.add(f)
                    frontier.append((f, sub))
    return sorted(files)


def _closure_hash(fn: Callable) -> str:
    """Hash of fn's source closure. Edits to sources outside it (tools/*,
    tests, unrelated subsystems) no longer invalidate the entry."""
    import inspect

    seed = os.path.abspath(inspect.getsourcefile(fn))
    if seed in _closure_hash_cache:
        return _closure_hash_cache[seed]
    files = closure_files(fn)
    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    digest = h.hexdigest()
    _dbg(f"closure of {os.path.basename(seed)}: {len(files)} files -> {digest[:12]}")
    _closure_hash_cache[seed] = digest
    return digest


def _key(
    fn: Callable,
    args: tuple,
    compiler_options: Optional[Dict[str, str]],
    key_extra: str,
    closure_seed: Optional[Callable] = None,
) -> str:
    import flax

    h = hashlib.sha256()
    if os.environ.get("CTRLV_EXEC_CACHE_KEY", "") == "all":
        h.update(_source_hash().encode())
    else:
        try:
            h.update(_closure_hash(closure_seed or fn).encode())
        except Exception as e:
            _dbg(f"closure scan failed ({type(e).__name__}: {e}); whole-package key")
            h.update(_source_hash().encode())
    h.update(jax.__version__.encode())
    h.update(flax.__version__.encode())
    try:
        dev = jax.devices()[0]
        h.update(dev.device_kind.encode())
        h.update(str(jax.device_count()).encode())
    except Exception:
        pass
    h.update(os.environ.get("XLA_FLAGS", "").encode())
    h.update(os.environ.get("LIBTPU_INIT_ARGS", "").encode())
    h.update(repr(sorted((compiler_options or {}).items())).encode())
    h.update(getattr(fn, "__qualname__", repr(fn)).encode())
    h.update(key_extra.encode())
    flat, treedef = jax.tree.flatten(args)
    h.update(str(treedef).encode())
    for leaf in flat:
        aval = jax.api_util.shaped_abstractify(leaf)
        h.update(str(aval).encode())
    return h.hexdigest()[:24]


def compile_cached(
    fn: Callable,
    args: tuple,
    *,
    tag: str,
    compiler_options: Optional[Dict[str, str]] = None,
    key_extra: str = "",
    donate_argnums=None,
    closure_seed: Optional[Callable] = None,
) -> Any:
    """jit(fn) compiled for `args`, with a cross-process executable cache.

    On a hit, trace/lower/compile are all skipped (the key is computed
    from sources + avals, not the lowered program). Returns a loaded
    Compiled object (callable with the same arg structure). On any
    cache/serialization error falls back to a plain compile — the cache
    is an accelerator, never a correctness gate. Pass key_extra for any
    static configuration that changes the traced program without
    changing arg shapes (e.g. repr of a SamplingConfig). Pass
    closure_seed when fn is a package-internal wrapper around a
    caller-supplied function (utils/packed_params.py::packed_init): the
    source-closure scan must seed from the CALLER's function, or edits
    to the models the wrapped init actually builds would stop
    invalidating the entry.
    """
    from jax.experimental import serialize_executable as se

    jitted = jax.jit(
        fn,
        compiler_options=compiler_options,
        donate_argnums=tuple(donate_argnums) if donate_argnums else (),
    )
    cdir = cache_dir()
    if cdir is None:
        return jitted.lower(*args).compile()

    os.makedirs(cdir, exist_ok=True)
    t0 = time.time()
    key = _key(
        fn, args, compiler_options,
        key_extra + (f"|donate{tuple(donate_argnums)}" if donate_argnums else ""),
        closure_seed=closure_seed,
    )
    _dbg(f"{tag}: key {time.time() - t0:.1f}s -> {key}")
    path = os.path.join(cdir, f"{tag}-{key}.jexec")
    if os.path.exists(path):
        try:
            t0 = time.time()
            with open(path, "rb") as fh:
                n_dev, blob = pickle.load(fh)
            os.utime(path)  # LRU: hits keep an entry alive across prunes
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; a single-device program loaded on a multi-device
            # host then demands n_local shards per arg. Pin the loaded
            # executable to the first n_dev devices it was compiled for.
            out = se.deserialize_and_load(
                *blob, execution_devices=jax.devices()[:n_dev]
            )
            _dbg(f"{tag}: cache HIT, load {time.time() - t0:.1f}s")
            return out
        except Exception as e:
            _dbg(f"{tag}: stale entry ({type(e).__name__}), recompiling")
    t0 = time.time()
    compiled = jitted.lower(*args).compile()
    _dbg(f"{tag}: cache MISS, trace+compile {time.time() - t0:.1f}s")
    try:
        n_dev = len(compiled._executable.xla_executable.local_devices())
        blob = se.serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((n_dev, blob), fh)
        os.replace(tmp, path)
        _dbg(f"{tag}: wrote {os.path.getsize(path) >> 20} MB entry")
        _prune(cdir)
    except Exception:
        pass  # non-serializable program or full disk: still return compiled
    return compiled
