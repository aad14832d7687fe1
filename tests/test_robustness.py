"""Impairment sweeps + failure detection/recovery (SURVEY.md s5.3, s7
stage 5): SNR threshold behaviour, ERR marking, sync loss and re-lock."""

import json

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.mod.impairments import awgn, carrier_offset
from dabtools_tpu.models.receiver import DabReceiver

from tests.test_closed_loop import build_ensemble, modulate


def _decode_rate(snr_db, seed=0):
    ens = build_ensemble()
    x, payload_bytes = modulate(ens, 12, seed=seed)
    rng = np.random.default_rng(1000 + seed)
    x = awgn(x, snr_db, rng)
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    if rx.ensemble is None or not eti:
        return 0.0
    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    good = sum(f.subchannel_data(1) == payload_bytes[1][a + k].tobytes()
               for k, f in enumerate(frames))
    return good / len(frames)


def test_snr_threshold_behaviour():
    """EEP 3-A (rate 1/2) decodes cleanly at moderate SNR and degrades at
    very low SNR — the FEC waterfall is where it should be."""
    assert _decode_rate(12.0) == 1.0
    assert _decode_rate(8.0) == 1.0
    assert _decode_rate(-2.0) < 1.0     # below the rate-1/2 DQPSK cliff


def test_large_cfo_with_integer_part():
    """CFO of several carrier spacings (integer + fractional) is corrected."""
    ens = build_ensemble()
    x, payload_bytes = modulate(ens, 12, seed=3)
    rng = np.random.default_rng(3)
    x = awgn(carrier_offset(x, 4300.0), 16.0, rng)   # 4.3 carrier spacings
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    assert abs(rx.stats[-1].cfo_carriers - 4.3) < 0.05
    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    for k, f in enumerate(frames):
        assert f.subchannel_data(1) == payload_bytes[1][a + k].tobytes()


def test_sync_loss_marks_err_and_recovers():
    """Noise-only gap mid-stream: frames during the gap carry a degraded
    ERR byte; the receiver re-locks afterwards and decodes cleanly."""
    ens = build_ensemble()
    x1, p1 = modulate(ens, 8, seed=5)
    rng = np.random.default_rng(5)
    gap = (0.3 * (rng.normal(size=4 * C.MODE_I.frame_size)
                  + 1j * rng.normal(size=4 * C.MODE_I.frame_size))
           ).astype(np.complex64)
    x2, p2 = modulate(ens, 8, seed=6)

    rx = DabReceiver(n_frames=4)
    eti = rx.feed(np.concatenate([x1, gap, x2]))
    assert rx.ensemble is not None
    frames = list(EtiParser().feed(b"".join(eti)))
    errs = [f.err for f in frames]
    assert 0xFF in errs, "no clean frames at all"
    assert any(e != 0xFF for e in errs), \
        "noise gap did not degrade any ERR byte"
    # tail frames (back in sync) are clean again
    assert errs[-1] == 0xFF


def test_stats_jsonl(tmp_path):
    ens = build_ensemble()
    x, _ = modulate(ens, 10, seed=7)
    path = tmp_path / "stats.jsonl"
    rx = DabReceiver(n_frames=4, stats_jsonl=str(path))
    rx.feed(x)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) >= 2
    for rec in lines:
        assert {"cif_count", "null_ratio", "cfo_carriers",
                "fib_crc_ok"} <= set(rec)
    assert any(k.startswith("subch") for k in lines[-1])


@pytest.mark.parametrize("cfo_hz", [2500.0, -3500.0, 1499.0])
def test_half_carrier_cfo_boundary(cfo_hz):
    """CFO at (or near) a half-carrier boundary: the fractional estimate
    wraps to either side of +-0.5 and the PRS integer search must pick
    the CONSISTENT bin (regression for the 1-carrier pairing error the
    impaired-sharding tests exposed; fine_sync_prs now derotates the
    fractional estimate before the template correlation)."""
    ens = build_ensemble()
    x, payload_bytes = modulate(ens, 12, seed=5)
    rng = np.random.default_rng(7)
    x = awgn(carrier_offset(x, cfo_hz), 18.0, rng)
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    assert abs(rx.stats[-1].cfo_carriers - cfo_hz / 1000.0) < 0.05
    frames = list(EtiParser().feed(b"".join(eti)))
    assert frames
    a = rx._activation_cif
    for k, f in enumerate(frames):
        assert f.subchannel_data(1) == payload_bytes[1][a + k].tobytes()
