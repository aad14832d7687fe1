"""Per-stage device cost of the config-3 BATCHED block (8 streams).

The first-ever config-3 hardware capture (2026-08-20: 37.19 ms per
8x8-frame block = 338 Msamples/s aggregate) is ~3x worse per sample
than config 1 (1063 Msamples/s), and the Viterbi's expected 3-chunk
cost explains only ~8-11 ms of it.  This tool times nested vmapped
programs — sync only, +demod, all-but-viterbi, full — with bench's
honest chained protocol, so consecutive differences locate the other
~25 ms.  Same shapes as bench._extra_batched (the capture being
diagnosed).  Results -> BENCH_PARTIAL.log + ledger via bench.log().

Run under tools/weatherwait.py (fresh compiles needed).
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
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples, pipeline_core
    from dabtools_tpu.ops.fec import (depuncture, init_deinterleave_ring,
                                      time_deinterleave)
    from dabtools_tpu.ops.ofdm import demod_frames
    from dabtools_tpu.ops.sync import (coarse_null_sync, fine_sync_prs,
                                       fractional_cfo)
    from dabtools_tpu.ops.viterbi import viterbi_decode
    from dabtools_tpu.parallel.channel import channel_parallel_block
    from dabtools_tpu.tables.puncturing import FIC_PROFILE

    n_ch, nf = 8, 8
    mode = C.MODE_I
    ens = _flagship_ensemble()
    dc = ens.decode_config()
    rng = np.random.default_rng(0)
    z = rng.normal(size=(n_ch, block_samples(nf), 2)).astype(np.float32)
    xb = bench._device_put_chunked(
        (z[..., 0] + 1j * z[..., 1]).astype(np.complex64) * 0.3)
    rings8 = jax.device_put({str(s.subchid): np.tile(
        init_deinterleave_ring(s.profile.tx_bits)[None], (n_ch, 1, 1))
        for s in ens.subchannels})
    cif = jnp.asarray(0, jnp.int32)

    def sync_part(xc):
        sync = coarse_null_sync(xc, mode)
        off = jnp.arange(nf, dtype=jnp.int32) * mode.frame_size
        guesses = sync["null_start"] + off
        frac = fractional_cfo(xc, guesses[0], mode)
        prs_guess = guesses + mode.null_size + mode.guard
        fine = jax.vmap(lambda g: fine_sync_prs(
            xc, g, mode, 192, 8, frac_cfo=frac))(prs_guess)
        starts = guesses + fine["offset"]
        cfo = frac + fine["int_cfo"][0].astype(jnp.float32)
        return starts, cfo, fine["peak"]

    def one_sync(xc):
        starts, cfo, peak = sync_part(xc)
        return starts.astype(jnp.float32).sum() + cfo + peak.sum()

    def one_demod(xc):
        starts, cfo, peak = sync_part(xc)
        soft, _ = demod_frames(xc, starts, mode, cfo, 0.0)
        return soft.sum() + peak.sum()

    def one_nov(xc, rc):
        """All-but-viterbi: sync + demod + FIC depuncture + per-subch
        deinterleave + MSC depuncture (mirrors stage_profile's
        prog_deint, per stream)."""
        starts, cfo, peak = sync_part(xc)
        soft, _ = demod_frames(xc, starts, mode, cfo, 0.0)
        total_fic = nf * mode.fic_bits_per_frame
        fic_soft = soft[:, : mode.n_fic_syms, :].reshape(
            total_fic // C.FIC_PUNCTURED_BITS, C.FIC_PUNCTURED_BITS)
        acc = depuncture(fic_soft, FIC_PROFILE).sum()
        n_cifs = nf * mode.n_cifs
        msc = soft[:, mode.n_fic_syms:, :].reshape(n_cifs, C.CIF_BITS)
        groups: dict = {}
        for s in dc.subchannels:
            groups.setdefault(s.profile, []).append(s)
        for profile, subs in groups.items():
            aligned_all = []
            for s in subs:
                lo = s.start_cu * C.CU_BITS
                ring, aligned = time_deinterleave(
                    rc[str(s.subchid)], cif,
                    msc[:, lo: lo + profile.tx_bits])
                aligned_all.append(aligned)
                acc = acc + ring.sum()
            acc = acc + depuncture(
                jnp.concatenate(aligned_all, axis=0), profile).sum()
        return acc + peak.sum()

    def full(xb, rings8):
        out, new_rings, _ = channel_parallel_block(
            xb, rings8, cif, ensemble=ens, n_frames=nf, mesh=None)
        return (sum(v.astype(jnp.float32).sum()
                    for v in out["subch"].values())
                + out["fic_metric"].sum()
                + sum(v.sum() for v in new_rings.values()))

    stages = [
        ("sync", jax.jit(lambda xb: jax.vmap(one_sync)(xb).sum()), None),
        ("sync+demod",
         jax.jit(lambda xb: jax.vmap(one_demod)(xb).sum()), "sync"),
        ("all-but-viterbi",
         jax.jit(lambda xb: jax.vmap(one_nov)(xb, rings8).sum()),
         "sync+demod"),
        ("full", jax.jit(full), "all-but-viterbi"),
    ]
    times: dict = {}
    agg_samples = n_ch * nf * mode.frame_size
    for name, fn, base in stages:
        t0 = time.time()
        try:
            if name == "full":
                t, stamp = bench._chained_time_ex(fn, xb, rings8)
            else:
                t, stamp = bench._chained_time_ex(fn, xb)
        except Exception as e:  # noqa: BLE001 — report, don't die
            bench.log(f"# [batched-profile] {name}: FAILED "
                      f"({str(e)[:90]})")
            continue
        times[name] = t
        d = t - times.get(base, 0.0)
        bench.log(f"# [batched-profile] {name} (8ch x 8-frame): "
                  f"{t * 1e3:.2f} ms/block (+{d * 1e3:.2f} ms vs "
                  f"{base or 'zero'}; {agg_samples / t / 1e6:.0f} "
                  f"Msamples/s aggregate; measured in "
                  f"{time.time() - t0:.0f}s) {stamp}")
    return 0 if times else 1


if __name__ == "__main__":
    sys.exit(main())
