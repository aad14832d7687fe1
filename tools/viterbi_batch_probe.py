"""Lane-occupancy scaling of the radix-4 Viterbi kernel on hardware.

Decides WHERE the next kernel effort goes (VERDICT r4 item 6: measure,
don't guess).  The ACS chain is ~1539 sequential double-steps; the open
question is whether a step's cost is LATENCY-bound (fixed per step —
then more lanes per chunk are ~free, and raising the VMEM-bound
``B_CHUNK`` ceiling directly multiplies config-3/64-frame aggregate
throughput) or BANDWIDTH/issue-bound (cost ∝ lanes — then B_CHUNK is
irrelevant and only per-step op reduction helps the headline).

Times ``viterbi_decode_pallas4`` at the SAME codeword length (3078, the
MSC production shape) across lane counts 128..896 (one chunk each) and
1792 (two sequential 896-lane chunks), with the honest chained protocol
and a device-side bits check per point.  Results land in
BENCH_PARTIAL.log + BENCH_LEDGER.jsonl via bench.log().

Run under tools/weatherwait.py.
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
    B_CHUNK, viterbi_decode_pallas4)

LANES = (128, 384, 640, 896, 2 * B_CHUNK, 2432)
# 2432 = the config-3 batched block's exact lane count (8 streams x
# (9 subch x 32 CIFs + FIC) at 8 frames): its 3-chunk time here, vs the
# full batched block's 37.19 ms (ledger 2026-08-20T17:25), splits the
# config-3 gap into Viterbi-chunking vs vmapped-front-end parts.


def main() -> int:
    rng = np.random.default_rng(11)
    b_max = max(LANES)
    msgs = rng.integers(0, 2, size=(b_max, 3072), dtype=np.uint8)
    soft_all = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft_all = (soft_all + rng.normal(scale=0.5, size=soft_all.shape)
                ).astype(np.float32)

    results = {}
    for b in LANES:
        soft = bench._device_put_chunked(soft_all[:b])
        msgs_d = jax.device_put(msgs[:b])
        f = jax.jit(lambda s: viterbi_decode_pallas4(s))
        try:
            t, stamp = bench._chained_time_ex(f, soft)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            bench.log(f"# [viterbi-batch] B={b}: FAILED ({str(e)[:90]})")
            continue

        def ok_fn(_f=f, _s=soft, _m=msgs_d):
            bits, _ = _f(_s)
            return jnp.all(bits == _m)

        verdict = bench._verdict_by_timing(ok_fn)
        results[b] = t
        n_chunks = -(-b // B_CHUNK)
        per_lane_step = t / (b * 1539)
        bench.log(f"# [viterbi-batch] B={b} ({n_chunks} chunk"
                  f"{'s' if n_chunks > 1 else ''}, T=3078): "
                  f"{t * 1e3:.2f} ms = {per_lane_step * 1e9:.1f} ns per "
                  f"lane-double-step; bits {verdict.split(' [')[0]} "
                  f"{stamp}")

    if 128 in results and 896 in results:
        r = results[896] / results[128]
        regime = ("LATENCY-bound (lanes ~free: raise B_CHUNK for "
                  "aggregate throughput)" if r < 2.0 else
                  "ISSUE/BANDWIDTH-bound (cost tracks lanes: only "
                  "per-step op reduction helps)")
        bench.log(f"# [viterbi-batch] decision data: t(896)/t(128) = "
                  f"{r:.2f}x at 7x the lanes => {regime}")
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
