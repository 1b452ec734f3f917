"""Persistent XLA compilation cache (fast server restarts + benches).

TPU compiles of the full serving envelope (bucket ladders x prefill/decode
variants) cost minutes per process; the reference amortizes them with CUDA
graphs captured per process. On TPU the right amortization is JAX's
persistent compilation cache: executables are keyed by HLO and reloaded on
the next process start, so a server restart (or the driver's per-round
bench) skips straight past warmup compiles. Measured over the axon tunnel:
6.2s -> 2.1s for a single jit; serving warmups drop from tens of minutes
to seconds once warm.

Enabled by default at ~/.cache/scalellm_tpu/jax; override with
SCALELLM_COMPILE_CACHE=<dir>, disable with SCALELLM_COMPILE_CACHE=0.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def enable_compilation_cache() -> None:
    """Idempotent; call before the first jit compile (engine init does)."""
    global _enabled
    if _enabled:
        return
    loc = os.environ.get("SCALELLM_COMPILE_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "scalellm_tpu", "jax"
        )
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Bound the cache: every round's kernel changes mint fresh HLO keys,
        # so the dir grows unboundedly on the bench host (advisor r3).
        # jax's own LRU eviction path races on its -atime sidecar files
        # across concurrent processes (FileNotFoundError inside put, every
        # write lost), so keep eviction disabled (max_size=-1 default,
        # which also keeps the atomic-write patch active) and prune oldest
        # entries ourselves at startup instead.
        _prune_cache_dir(
            loc, int(os.environ.get("SCALELLM_COMPILE_CACHE_MAX", 8 << 30))
        )
        _patch_atomic_writes()
        _enabled = True
        logger.info("persistent compilation cache at %s", loc)
    except Exception:  # never fail engine init over a cache
        logger.exception("compilation cache setup failed (continuing)")


def _prune_cache_dir(loc: str, max_bytes: int) -> None:
    """Evict oldest cache entries until the dir fits max_bytes. Runs once
    per process at enable time; concurrent-safe (missing files are fine)."""
    try:
        entries = []
        with os.scandir(loc) as it:
            for e in it:
                try:
                    st = e.stat()
                except OSError:
                    continue
                if e.is_file():
                    entries.append((st.st_mtime, st.st_size, e.path))
        total = sum(sz for _, sz, _ in entries)
        if total <= max_bytes:
            return
        entries.sort()  # oldest first
        for _, sz, path in entries:
            try:
                os.remove(path)
            except OSError:
                pass
            total -= sz
            if total <= max_bytes:
                break
        logger.info("pruned compile cache to %.1f GB", total / 1e9)
    except Exception:  # never fail startup over cache hygiene
        logger.exception("compile-cache prune failed (continuing)")


def _patch_atomic_writes() -> None:
    """Make cache-entry writes ATOMIC (tmp file + os.replace).

    jax's LRUCache.put writes entries with a bare Path.write_bytes: a
    process killed mid-write (deploy restart, bench timeout, OOM-kill)
    leaves a TORN entry on disk, and the next process to read it can
    segfault inside XLA executable deserialization — every subsequent
    server start then crashes until the cache dir is wiped (observed on
    this repo's CI: a timeout-killed bench bricked the shared cache and
    the test suite segfaulted deterministically in
    compilation_cache.get_executable_and_time). rename() on the same
    filesystem is atomic, so readers only ever see whole entries."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:  # cache layout changed: skip hardening, keep cache
        logger.exception("compile-cache atomic-write patch failed")
        return
    if getattr(_lru.LRUCache, "_scalellm_atomic", False):
        return

    _orig_put = _lru.LRUCache.put

    def _atomic_put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        try:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            if self.eviction_enabled:
                # Preserve the original locking/eviction semantics.
                return _orig_put(self, key, val)
            if cache_path.exists():
                return
            tmp = self.path / f"{key}.tmp.{os.getpid()}"
            tmp.write_bytes(val)
            os.replace(tmp, cache_path)
        except Exception:
            logger.exception("compile-cache write failed (continuing)")

    _lru.LRUCache.put = _atomic_put
    _lru.LRUCache._scalellm_atomic = True
