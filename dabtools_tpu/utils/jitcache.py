"""Persistent JAX compilation cache (survives processes and relay weather).

This machine reaches its TPU through a compile relay whose bad windows
last minutes to tens of minutes; inside one, every FRESH compile fails
process-wide (``UNIMPLEMENTED`` / compile-helper HTTP 500) while cached
executables keep running.  The relay also serves differently-optimized
executables per process (measured 2-16x sustained-perf spread on the same
program).  An on-disk cache fixes both: a program that compiled once in a
good window (a) never needs the compile helper again and (b) pins the
executable that was measured, ending the per-process lottery.

Verified on the 'axon' backend 2026-08-17: entries serialize/deserialize
correctly across processes (bit-identical outputs, ~3x faster load).
"""

from __future__ import annotations

import logging
import os
import pathlib

log = logging.getLogger("dabtools_tpu.jitcache")

_DEFAULT = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_cache(path: str | os.PathLike | None = None) -> bool:
    """Turn on jax's on-disk compilation cache (best-effort; False if the
    runtime refused).  ``DABTOOLS_JIT_CACHE=off`` disables; any other value
    overrides the location (default: ``<repo>/.jax_cache``)."""
    env = os.environ.get("DABTOOLS_JIT_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return False
    path = pathlib.Path(env or path or _DEFAULT)
    try:
        import jax

        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache EVERYTHING: in a bad relay window even trivial programs
        # fail to compile, so small/fast entries are worth keeping too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # noqa: BLE001 — never break the caller
        log.warning("persistent compilation cache unavailable: %s", e)
        return False
