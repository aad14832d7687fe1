"""Decision-packing share of the radix-4 ACS step (hardware probe).

Per double-step the ACS kernel (ops/viterbi_pallas4.py) does the
select/add/max tree AND packs 64 two-bit decisions into four int32
words (shift + four 16-sublane sums).  If that packing is a large
share of the step — the step count is the whole cost of the chain —
an MXU-packed realization (one (8,64)@(64,B) dot, exact for 8
decisions per f32 word) becomes the next headline lever; if small,
it is not worth the added kernel complexity.

Three timings at the production MSC shape (576x3078), honest chained
protocol:
  full        — production kernel (metric + decisions + traceback)
  acs         — traceback DCEd (metric output only; packing included)
  acs-nodec   — packing skipped in-kernel (metric exact, dec garbage)

packing share = (acs - acs_nodec) / acs.  Results -> BENCH_PARTIAL.log
+ BENCH_LEDGER.jsonl via bench.log().  Run under tools/weatherwait.py.
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
    _decode4_call, viterbi_decode_pallas4)


def main() -> int:
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, size=(576, 3072), dtype=np.uint8)
    soft_np = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft = bench._device_put_chunked(
        (soft_np + rng.normal(scale=0.5, size=soft_np.shape))
        .astype(np.float32))
    t2 = jnp.full((576,), 3078 // 2, jnp.int32)

    msgs_d = jax.device_put(msgs)
    f_full = jax.jit(lambda s: viterbi_decode_pallas4(s))
    f_acs = jax.jit(lambda s: viterbi_decode_pallas4(s)[1])
    f_nodec = jax.jit(
        lambda s: _decode4_call(s, t2, select="shuffle",
                                skip_dec=True)[1])
    f_mxu8 = jax.jit(lambda s: viterbi_decode_pallas4(s, pack="mxu8"))
    results = {}
    for name, f in (("full", f_full), ("acs", f_acs),
                    ("acs-nodec", f_nodec), ("full-mxu8", f_mxu8)):
        try:
            t, stamp = bench._chained_time_ex(f, soft)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            bench.log(f"# [viterbi-pack] {name}: FAILED ({str(e)[:90]})")
            continue
        results[name] = t
        verdict = ""
        if name in ("full", "full-mxu8"):
            def ok_fn(_f=f):
                bits, _ = _f(soft)
                return jnp.all(bits == msgs_d)
            verdict = ("; bits "
                       + bench._verdict_by_timing(ok_fn).split(" [")[0])
        bench.log(f"# [viterbi-pack] {name} (576x3078): "
                  f"{t * 1e3:.2f} ms{verdict} {stamp}")
    if "acs" in results and "acs-nodec" in results:
        share = (results["acs"] - results["acs-nodec"]) / results["acs"]
        bench.log(f"# [viterbi-pack] packing share: "
                  f"{share * 100:.0f}% of the ACS chain "
                  f"({(results['acs'] - results['acs-nodec']) * 1e3:+.2f}"
                  f" ms)")
    if "full" in results and "full-mxu8" in results:
        d = results["full"] - results["full-mxu8"]
        bench.log(f"# [viterbi-pack] decision data: mxu8 pack "
                  f"{d * 1e3:+.2f} ms vs shift4 "
                  f"({results['full-mxu8'] * 1e3:.2f} vs "
                  f"{results['full'] * 1e3:.2f} ms) => "
                  f"{'FLIP default (re-prewarm!)' if d > 0.1e-3 else 'keep shift4'}")
    return 0 if results else 1


if __name__ == "__main__":
    sys.exit(main())
