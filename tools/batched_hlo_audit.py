"""Offline (CPU) structural audit of the config-3 batched program.

Lowers the 8-channel vmapped receiver block (the exact program behind
the config-3 capture) and the single-stream equivalent to StableHLO and
prints an op histogram diff plus every gather/scatter/while with its
operand shapes.  The TPU-side cost of a construct differs from CPU, but
vmap-induced *structure* (dynamic_slice -> gather, batched-iota scans,
lifted while loops) shows up identically in the unoptimized module —
this is the cheap first look while tools/batched_profile.py waits for a
hardware window.
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def histo(text: str) -> collections.Counter:
    ops = re.findall(r"stablehlo\.(\w+)", text)
    return collections.Counter(ops)


def main() -> int:
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples
    from dabtools_tpu.ops.fec import init_deinterleave_ring
    from dabtools_tpu.parallel.channel import channel_parallel_block

    n_ch, nf = 8, 8
    ens = _flagship_ensemble()
    rng = np.random.default_rng(0)
    z = rng.normal(size=(n_ch, block_samples(nf), 2)).astype(np.float32)
    xb = jnp.asarray((z[..., 0] + 1j * z[..., 1]).astype(np.complex64))
    rings8 = {str(s.subchid): jnp.tile(
        init_deinterleave_ring(s.profile.tx_bits)[None], (n_ch, 1, 1))
        for s in ens.subchannels}
    rings1 = {k: v[0] for k, v in rings8.items()}
    cif = jnp.asarray(0, jnp.int32)

    def batched(xb, rings8):
        return channel_parallel_block(
            xb, rings8, cif, ensemble=ens, n_frames=nf, mesh=None)

    def single(xc, rc):
        return channel_parallel_block(
            xc[None], {k: v[None] for k, v in rc.items()}, cif,
            ensemble=ens, n_frames=nf, mesh=None)

    lo8 = jax.jit(batched).lower(xb, rings8).as_text()
    lo1 = jax.jit(single).lower(xb[0], rings1).as_text()
    h8, h1 = histo(lo8), histo(lo1)
    print(f"{'op':28s} {'1ch':>8s} {'8ch':>8s}")
    for op in sorted(set(h8) | set(h1),
                     key=lambda o: -(h8.get(o, 0) + h1.get(o, 0))):
        if h8.get(op, 0) + h1.get(op, 0) < 4 and h8.get(op) == h1.get(op):
            continue
        print(f"{op:28s} {h1.get(op, 0):>8d} {h8.get(op, 0):>8d}")

    print("\n--- gathers in the 8ch module (operand -> result) ---")
    seen = collections.Counter()
    for m in re.finditer(
            r'"stablehlo\.gather"\(([^)]*)\).*?'
            r"tensor<([^>]+)>.*?->\s*tensor<([^>]+)>", lo8):
        seen[(m.group(2), m.group(3))] += 1
    for (src, dst), n in seen.most_common(20):
        print(f"  x{n:<4d} {src} -> {dst}")

    print("\n--- while/scan loop counts ---")
    print("  1ch:", lo1.count("stablehlo.while"),
          "8ch:", lo8.count("stablehlo.while"))
    for name, lo in (("1ch", lo1), ("8ch", lo8)):
        ffts = collections.Counter(
            m.group(1) for m in re.finditer(
                r"stablehlo\.fft.*?->\s*tensor<([^>]+)>", lo))
        print(f"  {name} fft results:",
              dict(ffts.most_common(8)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
