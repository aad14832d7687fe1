"""Hardware A/B of f32- vs bf16-stored branch metrics (radix-4 Viterbi).

What bf16 buys is a higher per-call lane ceiling (B_CHUNK 896 -> 1280,
scoped-VMEM bound): at the config-3 / 64-frame lane count (2432) the
decode drops from 3 sequential chunks to 2.  Whether that is wall-clock
profit depends on the lane-scaling regime (tools/viterbi_batch_probe):
if chunk cost is ~fixed, 2 chunks ~ 2/3 the time; if it tracks lanes,
nothing changes and bf16 only halves scratch traffic.

Times both realizations at the single-chunk production shape (576
lanes; isolates the pure bm-storage effect) and at 2432 lanes (the
chunk-count effect), decoded bits checked against the ground-truth
messages per point.  The 2432-lane bf16 point is also the AOT
validation that B_CHUNK_BF16=1280 compiles inside the 16 MiB scoped
VMEM limit.  Results -> BENCH_PARTIAL.log + ledger via bench.log().

Run under tools/weatherwait.py (fresh compiles).
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
    b_chunk_for, viterbi_decode_pallas4)


def main() -> int:
    rng = np.random.default_rng(13)
    b_max = 2432
    msgs = rng.integers(0, 2, size=(b_max, 3072), dtype=np.uint8)
    soft_all = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft_all = (soft_all + rng.normal(scale=0.5, size=soft_all.shape)
                ).astype(np.float32)

    ok_points = 0
    for b in (576, 2432):
        soft = bench._device_put_chunked(soft_all[:b])
        msgs_d = jax.device_put(msgs[:b])
        for bm in ("f32", "bf16"):
            f = jax.jit(lambda s, _bm=bm: viterbi_decode_pallas4(s, bm=_bm))
            try:
                t, stamp = bench._chained_time_ex(f, soft)
            except Exception as e:  # noqa: BLE001 — report, don't die
                bench.log(f"# [viterbi-bm] {bm} B={b}: FAILED "
                          f"({str(e)[:110]})")
                continue

            def ok_fn(_f=f, _s=soft, _m=msgs_d):
                bits, _ = _f(_s)
                return jnp.all(bits == _m)

            verdict = bench._verdict_by_timing(ok_fn)
            chunk = b_chunk_for(bm)
            n_chunks = -(-b // chunk)
            ok_points += 1
            bench.log(f"# [viterbi-bm] {bm} B={b} ({n_chunks} chunk"
                      f"{'s' if n_chunks > 1 else ''} @ {chunk}, T=3078): "
                      f"{t * 1e3:.2f} ms; bits vs ground truth "
                      f"{verdict.split(' [')[0]} {stamp}")
    return 0 if ok_points else 1


if __name__ == "__main__":
    sys.exit(main())
