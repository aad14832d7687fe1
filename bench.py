"""Headline benchmark: real-time multiple of full-ensemble DAB decode per
TPU chip (BASELINE config #1 on the flagship 9x128kbit/s mux).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's implicit ~1x real-time on a desktop
CPU core (BASELINE.md: upstream publishes no numbers).

Run on the real chip: ``python bench.py`` (tests force CPU; this does not).
Extra per-stage numbers go to stderr so stdout stays one line.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _steady_state_time(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples, process_block
    from dabtools_tpu.ops.fec import init_deinterleave_ring

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ens = _flagship_ensemble()
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform}), "
          f"block={n_frames} frames", file=sys.stderr)

    rng = np.random.default_rng(0)
    n = block_samples(n_frames)
    z = rng.normal(size=(n, 2)).astype(np.float32) * 0.3
    x = jnp.asarray(z[:, 0] + 1j * z[:, 1], dtype=jnp.complex64)
    rings = {str(s.subchid): init_deinterleave_ring(s.profile.tx_bits)
             for s in ens.subchannels}
    cif = jnp.asarray(0, dtype=jnp.int32)

    def step(x, rings, cif):
        return process_block(x, rings, cif, ensemble=ens, n_frames=n_frames)

    from dabtools_tpu.utils.retry import call_with_retries
    t0 = time.perf_counter()
    out, rings2, cif2 = call_with_retries(step, x, rings, cif, retries=5,
                                          backoff_s=5.0)
    jax.block_until_ready(out)
    print(f"# compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t = _steady_state_time(step, (x, rings, cif))
    samples = n_frames * C.MODE_I.frame_size
    sps = samples / t
    rt = sps / C.SAMPLE_RATE
    print(f"# block time: {t * 1e3:.2f} ms, {sps / 1e6:.1f} Msamples/s, "
          f"{rt:.1f}x real-time", file=sys.stderr)

    print(json.dumps({
        "metric": "realtime_multiple_full_ensemble_per_chip",
        "value": round(rt, 2),
        "unit": "x_realtime_2.048Msps",
        "vs_baseline": round(rt, 2),
    }))


if __name__ == "__main__":
    main()
