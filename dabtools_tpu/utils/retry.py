"""Retry guard for transient TPU runtime failures.

The axon-tunnelled TPU backend on this machine intermittently fails a fresh
compile with ``UNIMPLEMENTED: TPU backend error`` (remote-compile relay
flakiness); the identical program compiles fine on retry.  Production
receivers must not drop a stream for that (failure-detection duty,
SURVEY.md s5.3), so device-step callers wrap with this.
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger("dabtools_tpu.retry")


def call_with_retries(fn, *args, retries: int | None = None,
                      backoff_s: float | None = None,
                      relay_errors: bool | None = None, **kwargs):
    """Call ``fn``; on a JAX runtime error, clear its jit cache (if any)
    and retry up to ``retries`` times with linear backoff.

    Defaults come from ``DABTOOLS_RETRIES`` / ``DABTOOLS_RETRY_BACKOFF``
    (else 3 / 0.5 s).  The relay's bad windows on this machine last
    MINUTES (measured: a 270 s stall then full recovery), so hardware
    harnesses set e.g. ``DABTOOLS_RETRIES=6 DABTOOLS_RETRY_BACKOFF=30``
    to ride a window out instead of dying 3 s into it.

    ``relay_errors``: the relay re-raises its transient failures as
    ValueError/RuntimeError from np.asarray paths ("UNIMPLEMENTED: TPU
    backend error", "Array has been deleted" after a poisoned fetch).
    Matching those substrings library-wide would also silently retry a
    GENUINE use-after-free ("Array has been deleted" from real donated-
    buffer misuse), so the broadened catch is OPT-IN: pass
    ``relay_errors=True`` at relay-facing call sites, or set
    ``DABTOOLS_RELAY_ERRORS=1`` process-wide (bench.py does).  The
    default retries only ``JaxRuntimeError``.  Note retried ``fn``s must
    be idempotent — callers bundle execute+fetch into one unit for this
    reason (see bench.py ``fetch_fresh``).
    """
    import os

    from jax.errors import JaxRuntimeError

    if retries is None:
        retries = int(os.environ.get("DABTOOLS_RETRIES", 3))
    if backoff_s is None:
        backoff_s = float(os.environ.get("DABTOOLS_RETRY_BACKOFF", 0.5))
    if relay_errors is None:
        relay_errors = os.environ.get("DABTOOLS_RELAY_ERRORS", "") not in (
            "", "0", "false")
    last = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except (JaxRuntimeError, ValueError, RuntimeError) as e:
            # pragma: no cover - TPU infra
            transient = isinstance(e, JaxRuntimeError) or (
                relay_errors and any(
                    k in str(e)
                    for k in ("UNIMPLEMENTED", "TPU backend error",
                              "DEADLINE", "has been deleted")))
            if not transient:
                raise
            last = e
            log.warning("device step failed (attempt %d/%d): %s",
                        attempt + 1, retries + 1, str(e)[:200])
            if hasattr(fn, "clear_cache"):
                fn.clear_cache()
            time.sleep(backoff_s * (attempt + 1))
    raise last
