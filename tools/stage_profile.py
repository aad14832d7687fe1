"""Per-stage device cost of the 16-frame decode block (honest protocol).

Builds four nested programs — sync only, +OFDM demod, +FIC decode, the
full pipeline — and times each with bench._chained_time (device-chained
scan, dispatch overhead cancelled), so consecutive differences give the
cost of each stage.  Run on the TPU in a fetch-capable window:

  python tools/stage_profile.py [n_frames]
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
    if jax.devices()[0].platform == "cpu":
        # CPU datum run (explicit or plugin fallback): keep its lines
        # out of the TPU evidence ledger and the TPU partial log —
        # bench's guards key on this env var.
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        bench._PARTIAL_PATH = "/tmp/BENCH_PARTIAL_cpu.log"
    from __graft_entry__ import _flagship_ensemble
    from dabtools_tpu import constants as C
    from dabtools_tpu.models.receiver import block_samples, pipeline_core
    from dabtools_tpu.ops.fec import depuncture, init_deinterleave_ring
    from dabtools_tpu.ops.ofdm import demod_frames
    from dabtools_tpu.ops.sync import (
        coarse_null_sync,
        fine_sync_prs,
        fractional_cfo,
    )
    from dabtools_tpu.ops.viterbi import viterbi_decode
    from dabtools_tpu.tables.puncturing import FIC_PROFILE
    from tests.test_closed_loop import modulate

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    ens = _flagship_ensemble()
    dc = ens.decode_config()
    n = block_samples(n_frames)
    xm, _ = modulate(ens, n_frames + 4, seed=0)
    x = bench._device_put_chunked(xm[:n].astype(np.complex64))
    rings = {str(s.subchid): bench._device_put_chunked(
        init_deinterleave_ring(s.profile.tx_bits))
        for s in ens.subchannels}
    cif = jnp.asarray(0, jnp.int32)
    mode = C.MODE_I

    def sync_part(x):
        sync = coarse_null_sync(x, mode)
        off = jnp.arange(n_frames, dtype=jnp.int32) * mode.frame_size
        guesses = sync["null_start"] + off
        frac = fractional_cfo(x, guesses[0], mode)
        prs_guess = guesses + mode.null_size + mode.guard
        fine = jax.vmap(lambda g: fine_sync_prs(
            x, g, mode, 192, 8, frac_cfo=frac))(prs_guess)
        starts = guesses + fine["offset"]
        cfo = frac + fine["int_cfo"][0].astype(jnp.float32)
        return starts, cfo, fine["peak"]

    def prog_sync(x):
        starts, cfo, peak = sync_part(x)
        return starts.astype(jnp.float32).sum() + cfo + peak.sum()

    def prog_demod(x):
        starts, cfo, peak = sync_part(x)
        soft, diag = demod_frames(x, starts, mode, cfo, 0.0)
        return soft.sum() + peak.sum()

    def prog_fic(x):
        starts, cfo, peak = sync_part(x)
        soft, diag = demod_frames(x, starts, mode, cfo, 0.0)
        total_fic = n_frames * mode.fic_bits_per_frame
        fic_soft = soft[:, : mode.n_fic_syms, :].reshape(
            total_fic // C.FIC_PUNCTURED_BITS, C.FIC_PUNCTURED_BITS)
        bits, metric = viterbi_decode(depuncture(fic_soft, FIC_PROFILE))
        return soft.sum() + bits.astype(jnp.float32).sum() + metric.sum()

    def prog_deint(x):
        """Everything EXCEPT the Viterbi dispatch and bit packing: the
        'full' minus this is (almost exactly) the merged ragged Viterbi
        cost inside the production block."""
        from dabtools_tpu.ops.fec import time_deinterleave
        starts, cfo, peak = sync_part(x)
        soft, diag = demod_frames(x, starts, mode, cfo, 0.0)
        total_fic = n_frames * mode.fic_bits_per_frame
        fic_soft = soft[:, : mode.n_fic_syms, :].reshape(
            total_fic // C.FIC_PUNCTURED_BITS, C.FIC_PUNCTURED_BITS)
        acc = depuncture(fic_soft, FIC_PROFILE).sum()
        n_cifs = n_frames * mode.n_cifs
        msc = soft[:, mode.n_fic_syms:, :].reshape(n_cifs, C.CIF_BITS)
        groups = {}
        for s in dc.subchannels:
            groups.setdefault(s.profile, []).append(s)
        for profile, subs in groups.items():
            aligned_all = []
            for s in subs:
                lo = s.start_cu * C.CU_BITS
                ring, aligned = time_deinterleave(
                    rings[str(s.subchid)], cif,
                    msc[:, lo: lo + profile.tx_bits])
                aligned_all.append(aligned)
                acc = acc + ring.sum()
            acc = acc + depuncture(
                jnp.concatenate(aligned_all, axis=0), profile).sum()
        return acc + peak.sum()

    def prog_full(x):
        sync = coarse_null_sync(x, mode)
        off = jnp.arange(n_frames, dtype=jnp.int32) * mode.frame_size
        out, new_rings, _ = pipeline_core(
            x, sync["null_start"] + off, rings, cif, ensemble=dc,
            mode=mode)
        return (out["fib_bytes"].astype(jnp.float32).sum()
                + sum(v.astype(jnp.float32).sum()
                      for v in out["subch"].values())
                + sum(v.sum() for v in new_rings.values()))

    # (name, program, baseline stage the printed delta is against —
    # 'all-but-viterbi' is NOT a superset of the fic stage, so its
    # delta reads vs sync+demod, and 'full' minus it is the merged
    # ragged Viterbi + packing cost.)
    stages = [("sync", prog_sync, None),
              ("sync+demod", prog_demod, "sync"),
              ("sync+demod+fic", prog_fic, "sync+demod"),
              ("all-but-viterbi", prog_deint, "sync+demod"),
              ("full", prog_full, "all-but-viterbi")]
    sig_s = n_frames * mode.frame_size / C.SAMPLE_RATE
    times: dict = {}
    print(f"# {n_frames}-frame block = {sig_s:.3f} s of signal; "
          f"device: {jax.devices()[0].device_kind}")
    for name, fn, base in stages:
        jf = jax.jit(fn)
        t0 = time.time()
        # bench.log => BENCH_PARTIAL.log + the evidence ledger: each
        # stage's line survives a later-stage crash or client wedge
        # (r4's TPU capture died mid-run and left nothing committed).
        t, stamp = bench._chained_time_ex(jf, x)
        times[name] = t
        d = t - times.get(base, 0.0)
        bench.log(
            f"# [stage-profile] {name} ({n_frames}-frame): "
            f"{t * 1e3:.2f} ms/block (+{d * 1e3:.2f} ms vs "
            f"{base or 'zero'}; {sig_s / t:.0f}x realtime; measured in "
            f"{time.time() - t0:.0f}s) {stamp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
