"""AOT-persisted lane executables: the cold-open trace killer.

The persistent XLA compile cache (.jax_cache) removes COMPILATION from a fresh
process's first query, but not Python TRACING + executable load — measured
478 ms for the 10K x 384 dense lane on this host (fresh process, warm disk
cache) vs 12 ms to `jax.experimental.serialize_executable.deserialize_and_load`
a persisted executable. This module persists the compiled executables of the
first-query lanes keyed by (lane name, static signature, arg avals, pytree
structure, jax version, backend, device kind), so a cold open skips tracing
entirely on any shape it has served before.

Usage — wrap the lane call site:

    from wax_tpu.utils.aot_cache import aot_call
    vals, rows, fids = aot_call("flat_scan", f"k={k}", lambda q, s: flat_scan_topk(q, s, k), q, snap)

Semantics: identical results to calling `fn(*args)` (it is the same program,
compiled once and reloaded); any failure (serialize API change, stale file,
incompatible executable) falls back to the plain call and disables the key for
the process. `WAX_TPU_DISABLE_AOT=1` disables the whole mechanism; the cache
directory resolves from `WAX_TPU_AOT_DIR`, else `~/.wax-tpu/aot`.

Files are pickles of our own serialized executables (trusted local cache, same
trust model as .jax_cache); a hostile cache dir is equivalent to a hostile
.jax_cache.

(reference: the Metal pipeline caching the reference gets from the OS —
MTLBinaryArchive semantics — which is why its 17 ms cold open never pays
pipeline compilation; Sources/WaxVectorSearch/MetalVectorEngine.swift:1.)
"""
from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

__all__ = ["aot_call", "aot_dir", "clear_memory_registry"]

_LOCK = threading.Lock()
_HANDLES: dict[str, object] = {}  # key -> loaded Compiled
_FAILED: set[str] = set()  # keys that failed once: plain calls for the process
_STATS = {"hits": 0, "loads": 0, "builds": 0, "fallbacks": 0}


def aot_dir() -> str:
    d = os.environ.get("WAX_TPU_AOT_DIR")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".wax-tpu", "aot")
    return d


def _enabled() -> bool:
    return os.environ.get("WAX_TPU_DISABLE_AOT") != "1"


def _key(name: str, static_sig: str, leaves, treedef) -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(
        "|".join(
            [
                name,
                static_sig,
                str(treedef),
                jax.__version__,
                jax.default_backend(),
                getattr(dev, "device_kind", str(dev)),
            ]
        ).encode()
    )
    for leaf in leaves:
        aval = jax.api_util.shaped_abstractify(leaf)
        h.update(str(aval).encode())
    return h.hexdigest()


def stats() -> dict:
    return dict(_STATS)


def clear_memory_registry() -> None:
    """Drop in-process handles (tests; files stay)."""
    with _LOCK:
        _HANDLES.clear()
        _FAILED.clear()


def aot_call(name: str, static_sig: str, fn, *args):
    """Call `fn(*args)` through a persisted AOT executable when possible.

    fn must be a pure jit-able function of exactly `args` (close over statics
    and fold them into `static_sig`). Results are bit-identical to fn(*args) —
    it is the same lowered program.
    """
    if not _enabled():
        return fn(*args)
    leaves, treedef = jax.tree.flatten(args)
    try:
        key = _key(name, static_sig, leaves, treedef)
    except Exception:
        return fn(*args)
    if key in _FAILED:
        return fn(*args)
    handle = _HANDLES.get(key)
    if handle is not None:
        _STATS["hits"] += 1
        return handle(*leaves)
    path = os.path.join(aot_dir(), f"{name}-{key[:32]}.aotx")
    from jax.experimental import serialize_executable as se

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            handle = se.deserialize_and_load(*payload)
            with _LOCK:
                _HANDLES[key] = handle
            _STATS["loads"] += 1
            return handle(*leaves)
        except Exception:
            # stale/incompatible file: rebuild below and overwrite
            try:
                os.unlink(path)
            except OSError:
                pass
    try:
        flat_fn = lambda *ls: fn(*jax.tree.unflatten(treedef, ls))  # noqa: E731
        compiled = jax.jit(flat_fn).lower(*leaves).compile()
        payload = se.serialize(compiled)
        os.makedirs(aot_dir(), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        with _LOCK:
            _HANDLES[key] = compiled
        _STATS["builds"] += 1
        return compiled(*leaves)
    except Exception:
        _STATS["fallbacks"] += 1
        with _LOCK:
            _FAILED.add(key)
        return fn(*args)
