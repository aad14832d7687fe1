"""Hardware A/B of the OFDM window-extraction gather layouts.

Two realizations of "extract 76 symbol windows x 2048 from every frame"
(`ops.ofdm.gather_symbol_windows`):

  twostage — production today: one row-slice gather of whole frame
             windows (m rows x ~197k), then a traced-index gather of the
             (76, 2048) local windows WITHIN each frame slice.  The
             second gather's operand carries the frame batch (and the
             channel batch under config 3's vmap).
  persym   — one row-slice gather straight to the symbol windows
             (m*76 rows x 2048): ~20% fewer bytes gathered, no second
             gather, and under the channel vmap it is a single
             flat-operand gather (the proven-fast class).

This tool times both at config-1b shape (1 stream x 64 frames) and the
config-3 batched shape (8 streams x 8 frames, channel axis vmapped),
with bench's honest chained protocol and a checksum equality assert
between realizations (same indices => bit-identical values).  The
faster one should become the production layout; flip only on this
datum.  Results land in BENCH_PARTIAL.log + BENCH_LEDGER.jsonl.

Run under tools/weatherwait.py (fresh compiles).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from dabtools_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()
    import bench
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples
    from dabtools_tpu.ops.slicing import window_slices

    mode = C.MODE_I
    sym_idx = np.arange(mode.n_symbols, dtype=np.int32)
    frame_len = (mode.null_size + (mode.n_symbols - 1) * mode.symbol_size
                 + mode.guard + mode.fft_size + 64)
    local = jnp.asarray(
        mode.null_size + sym_idx[:, None] * mode.symbol_size + mode.guard
        + np.arange(mode.fft_size, dtype=np.int32)[None, :])
    off = jnp.asarray(mode.null_size + sym_idx * mode.symbol_size
                      + mode.guard, jnp.int32)

    def twostage(x, starts):
        frames = window_slices(x, starts, frame_len)
        return frames[:, local]

    def persym(x, starts):
        s = (starts[:, None] + off[None, :]).reshape(-1)
        win = window_slices(x, s, mode.fft_size)
        return win.reshape(starts.shape[0], mode.n_symbols, mode.fft_size)

    rng = np.random.default_rng(5)

    def mk(n_ch, nf):
        z = rng.normal(size=(n_ch, block_samples(nf), 2)).astype(np.float32)
        x = bench._device_put_chunked(
            (z[..., 0] + 1j * z[..., 1]).astype(np.complex64))
        # per-frame starts with a little per-channel/per-frame jitter
        # (realistic sync wander, still inside the block's slack frame)
        jitter = (np.arange(n_ch)[:, None] * 37
                  + np.arange(nf)[None, :] * 13) % 997
        starts = jnp.asarray(
            np.arange(nf)[None, :] * mode.frame_size + jitter, jnp.int32)
        return x, starts

    shapes = (("1x64f", 1, 64), ("8x8f", 8, 8))
    for label, n_ch, nf in shapes:
        x, starts = mk(n_ch, nf)
        outs = {}
        for name, fn in (("twostage", twostage), ("persym", persym)):
            if n_ch == 1:
                f = jax.jit(lambda x, s, _fn=fn: _fn(x[0], s[0]).sum())
            else:
                f = jax.jit(lambda x, s, _fn=fn: jax.vmap(_fn)(x, s).sum())
            t0 = time.time()
            try:
                t, stamp = bench._chained_time_ex(f, x, starts)
            except Exception as e:  # noqa: BLE001 — report, don't die
                bench.log(f"# [window-gather] {name} {label}: FAILED "
                          f"({str(e)[:90]})")
                continue
            outs[name] = complex(np.asarray(jax.device_get(f(x, starts))))
            gb = (n_ch * nf * mode.n_symbols * mode.fft_size * 8) / 1e9
            bench.log(f"# [window-gather] {name} {label}: {t * 1e3:.2f} ms "
                      f"({gb / t:.0f} GB/s of windows; measured in "
                      f"{time.time() - t0:.0f}s) {stamp}")
        # identical elements, different f32 summation order: allow the
        # ~1e-4 relative drift a 10M-element f32 reduction can carry
        if len(outs) == 2 and not np.isclose(
                outs["twostage"], outs["persym"], rtol=5e-4):
            bench.log(f"# [window-gather] {label}: CHECKSUM MISMATCH "
                      f"{outs['twostage']} vs {outs['persym']}")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
