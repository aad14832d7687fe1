"""Time the radix-4 Viterbi ACS selection realizations on hardware.

The predecessor-selection step (``pred[p*64+t] = pm[4*(t&15)+p]``) is the
sequential chain's dominant op; ``ops/viterbi_pallas4.py`` offers two
interchangeable realizations (matmul@HIGHEST / VPU shuffle; a matmul@HIGH
variant was removed — Mosaic rejects non-HIGHEST f32 dot precision on
this target).  This probe measures each with the honest chained protocol
(bench._chained_time_ex: device-chained L1-L0 differencing with
self-consistency stamps) plus a fetch-free on-device bit-exactness
verdict, on the same 576x3078 workload as the bench kernels section.

Run under tools/weatherwait.py; results append to BENCH_PARTIAL.log via
bench.log().  The decision rule: flip the production default only if a
variant is faster AND bit-exact on chip.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from dabtools_tpu.mod.convcode import conv_encode  # noqa: E402
from dabtools_tpu.ops.viterbi_pallas4 import (  # noqa: E402
    _SELECTS, viterbi_decode_pallas4)


def main() -> int:
    rng = np.random.default_rng(42)
    msgs = rng.integers(0, 2, size=(576, 3072), dtype=np.uint8)
    soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft = bench._device_put_chunked(
        (soft + rng.normal(scale=0.5, size=soft.shape)).astype(np.float32))
    msgs_d = jax.device_put(msgs)

    results = {}
    for select in _SELECTS:
        f = jax.jit(lambda s, _sel=select: viterbi_decode_pallas4(
            s, select=_sel))
        try:
            t, stamp = bench._chained_time_ex(f, soft)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            bench.log(f"# [viterbi-select] {select}: FAILED ({e})")
            continue

        def ok_fn(_f=f):
            bits, _ = _f(soft)
            return jnp.all(bits == msgs_d)

        verdict = bench._verdict_by_timing(ok_fn)
        results[select] = (t, verdict)
        bench.log(f"# [viterbi-select] {select} (576x3078): "
                  f"{t * 1e3:.2f} ms; decoded bits {verdict} {stamp}")

    exact = {s: t for s, (t, v) in results.items() if v.startswith("OK")}
    if "matmul" in exact and len(exact) > 1:
        base = exact["matmul"]
        best = min(exact, key=exact.get)
        bench.log(f"# [viterbi-select] decision data: best={best} "
                  f"({exact[best] * 1e3:.2f} ms, {base / exact[best]:.2f}x "
                  f"vs matmul@HIGHEST)")
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
