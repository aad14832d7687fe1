"""Sharded decode under RF impairments (VERDICT r2 item 3).

Every other sharding test runs on clean modulated signal; these push
COST 207 TU6 urban multipath + a 2.5-carrier CFO + 50 ppm sample-clock
drift + AWGN through `timeblock_receiver` and `channel_parallel_block`.
Per-shard sync runs independently (each time shard estimates its own
fractional CFO from its first frame's guard interval), so the property
asserted is *full payload decode with seam integrity* — every output
row, including the rows adjacent to shard seams, matches the modulator
payload — not bit-equality with the sequential receiver's internal
estimates.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dabtools_tpu import constants as C
from dabtools_tpu.mod.impairments import MultipathChannel, awgn, carrier_offset
from dabtools_tpu.models.receiver import block_samples
from dabtools_tpu.ops.fec import init_deinterleave_ring
from dabtools_tpu.parallel.channel import channel_parallel_block
from dabtools_tpu.parallel.mesh import make_receiver_mesh
from dabtools_tpu.parallel.timeblock import halo_sizes, timeblock_receiver
from dabtools_tpu.utils.crc import crc16_ok

from tests.test_closed_loop import build_ensemble, modulate
from tests.test_tools_and_drift import _resample_ppm

# 2.5 carriers at Mode I's 1 kHz spacing: exercises BOTH the integer-CFO
# PRS hypothesis search and the fractional guard-interval estimator.
CFO_HZ = 2500.0


def _impair(x: np.ndarray, seed: int, ppm: float = 50.0,
            snr_db: float = 22.0, doppler_hz: float = 0.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ch = MultipathChannel(doppler_hz=doppler_hz,
                          rng=np.random.default_rng(seed + 1))  # TU6
    x = ch(x)
    x = carrier_offset(x, CFO_HZ)
    x = _resample_ppm(x, ppm)
    return awgn(x, snr_db, rng)


def test_timeblock_impaired_tu6_cfo_drift():
    """TU6 + 2.5-carrier CFO + 50 ppm drift + 22 dB AWGN across a
    4-shard time mesh: all payload rows decode, including across seams.

    Drift makes true null starts walk ~10 samples/frame away from the
    nominal frame grid the span is sliced on (~300 samples over the
    span), so the per-frame PRS search window is widened to cover it —
    a receiver-configuration knob, not a test concession."""
    ens = build_ensemble()
    n_time, f_own, warmup = 4, 6, 5
    g0 = warmup + 1
    n_frames_total = g0 + n_time * f_own + 1
    x, payload_bytes = modulate(ens, n_frames_total, seed=21)
    x = _impair(x, seed=42)

    fr = C.MODE_I.frame_size
    lh, rh = halo_sizes(warmup)
    span_start = g0 * fr
    span_len = n_time * f_own * fr
    span = x[span_start: span_start + span_len]
    prefix = x[span_start - lh: span_start]
    suffix = x[span_start + span_len: span_start + span_len + rh]

    mesh = make_receiver_mesh(n_channels=2, n_time=n_time)
    fn = timeblock_receiver(mesh, ens, frames_per_shard=f_own,
                            warmup_frames=warmup, search=448)
    xb = jnp.asarray(np.stack([span, span]))
    out = fn(xb, jnp.asarray(np.stack([prefix, prefix])),
             jnp.asarray(np.stack([suffix, suffix])), g0)

    # Per-shard CFO estimates agree to within a fraction of a carrier
    # (and all resolve the same integer bin).
    cfo = np.asarray(out["cfo_carriers"]).ravel()
    assert np.all(np.abs(cfo - CFO_HZ / 1000.0) < 0.15), cfo
    assert np.ptp(cfo) < 0.1, f"per-shard CFO estimates diverged: {cfo}"

    fib_bytes = np.asarray(out["fib_bytes"])
    n_fib_ok = sum(crc16_ok(fib_bytes[c, f, i].tobytes())
                   for c in range(2)
                   for f in range(n_time * f_own) for i in range(12))
    assert n_fib_ok == 2 * n_time * f_own * 12

    got = np.asarray(out["subch"]["1"])
    bad = []
    for c in range(2):
        for j in range(n_time * f_own * 4):
            n = g0 * 4 + j - 15
            if n < 0:
                continue
            if got[c, j].tobytes() != payload_bytes[1][n].tobytes():
                bad.append((c, j, j // (f_own * 4)))  # (chan, row, shard)
    assert not bad, f"{len(bad)} impaired rows failed, first 10: {bad[:10]}"


def test_timeblock_impaired_with_fading():
    """Same chain with 4 Hz Rayleigh fading on the TU6 taps (time-varying
    channel): payloads still decode on every shard at 26 dB SNR."""
    ens = build_ensemble()
    n_time, f_own, warmup = 2, 6, 5
    g0 = warmup + 1
    n_frames_total = g0 + n_time * f_own + 1
    x, payload_bytes = modulate(ens, n_frames_total, seed=23)
    x = _impair(x, seed=47, snr_db=26.0, doppler_hz=4.0)

    fr = C.MODE_I.frame_size
    lh, rh = halo_sizes(warmup)
    span_start = g0 * fr
    span_len = n_time * f_own * fr

    import jax
    mesh = make_receiver_mesh(
        n_channels=1, n_time=n_time, devices=jax.devices()[:n_time])
    fn = timeblock_receiver(mesh, ens, frames_per_shard=f_own,
                            warmup_frames=warmup, search=448)
    out = fn(jnp.asarray(x[span_start: span_start + span_len])[None],
             jnp.asarray(x[span_start - lh: span_start])[None],
             jnp.asarray(x[span_start + span_len:
                           span_start + span_len + rh])[None], g0)

    got = np.asarray(out["subch"]["1"])
    for j in range(n_time * f_own * 4):
        n = g0 * 4 + j - 15
        if n < 0:
            continue
        assert got[0, j].tobytes() == payload_bytes[1][n].tobytes(), \
            f"row {j} (shard {j // (f_own * 4)}) mismatch under fading"


def test_channel_parallel_impaired():
    """8 channel-sharded streams, each independently impaired (different
    noise/fading realizations, same TU6+CFO+drift): all payloads decode."""
    ens = build_ensemble()
    n_frames = 6
    n_ch = 8
    xs, payloads = [], []
    for c in range(n_ch):
        x, p = modulate(ens, n_frames + 2, seed=300 + c)
        x = _impair(x, seed=500 + c)
        xs.append(x[: block_samples(n_frames)])
        payloads.append(p)
    xb = jnp.asarray(np.stack(xs))

    mesh = make_receiver_mesh(n_channels=n_ch, n_time=1)
    rings = {str(s.subchid): jnp.tile(
        init_deinterleave_ring(s.profile.tx_bits)[None], (n_ch, 1, 1))
        for s in ens.subchannels}
    out, _, _ = channel_parallel_block(
        xb, rings, jnp.asarray(0, jnp.int32), ensemble=ens,
        n_frames=n_frames, mesh=mesh, search=448)

    cfo = np.asarray(out["cfo_carriers"])
    assert np.all(np.abs(cfo - CFO_HZ / 1000.0) < 0.15), cfo

    n_cifs = n_frames * 4
    for c in range(n_ch):
        got = np.asarray(out["subch"]["1"][c])
        for j in range(15, n_cifs):
            assert got[j].tobytes() == payloads[c][1][j - 15].tobytes(), \
                f"channel {c} row {j} mismatch"
