"""Multipath / SFN channel model and receiver robustness through it.

The reference was validated against live broadcasts only (SURVEY.md s4);
the tapped-delay-line channel (COST 207 TU6/RA4 profiles, Rayleigh fading,
SFN echoes) synthesizes those propagation conditions deterministically so
guard-interval tolerance is testable without an antenna.
"""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.mod.impairments import (
    RA4,
    TU6,
    MultipathChannel,
    _frac_delay_fir,
    awgn,
    carrier_offset,
    multipath,
    sfn_echo,
)
from dabtools_tpu.models.receiver import DabReceiver

from tests.test_closed_loop import build_ensemble, modulate


# ---------------------------------------------------------------- units

def test_fractional_delay_phase_slope():
    """Delaying a complex exponential by d samples rotates it by
    -2*pi*f*d/fs — checked across the occupied DAB band."""
    fs = C.SAMPLE_RATE
    n = np.arange(4096)
    for f in (0.1e6, 0.3e6, 0.7e6):
        x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
        for d in (0.25, 0.5, 0.77):
            h = _frac_delay_fir(d)
            bulk = (h.size - 1) // 2
            y = np.convolve(x, h)[bulk:bulk + x.size]
            expect = x * np.exp(-2j * np.pi * f * d / fs)
            assert np.abs(y[100:-100] - expect[100:-100]).max() < 1e-3


@pytest.mark.parametrize("doppler", [0.0, 40.0])
def test_streaming_equals_one_shot(doppler):
    rng = np.random.default_rng(3)
    x = (rng.normal(size=20000) + 1j * rng.normal(size=20000)).astype(
        np.complex64)
    y1 = multipath(x, TU6, doppler_hz=doppler,
                   rng=np.random.default_rng(7))
    ch = MultipathChannel(TU6, doppler_hz=doppler,
                          rng=np.random.default_rng(7))
    y2 = np.concatenate([ch(x[:777]), ch(x[777:5000]), ch(x[5000:])])
    np.testing.assert_array_equal(y1, y2)


def test_unit_mean_power():
    """Tap powers are normalized: the channel neither amplifies nor
    attenuates on average (fading gains are unit-power Jakes sums)."""
    rng = np.random.default_rng(4)
    x = (rng.normal(size=200000) + 1j * rng.normal(size=200000)).astype(
        np.complex64)
    pin = np.mean(np.abs(x) ** 2)
    y = multipath(x, TU6, doppler_hz=80.0, rng=np.random.default_rng(1))
    assert abs(np.mean(np.abs(y) ** 2) / pin - 1.0) < 0.15


def test_sfn_echo_delay_and_power():
    fs = C.SAMPLE_RATE
    n = np.arange(65536)
    rng = np.random.default_rng(6)
    x = (rng.normal(size=n.size) + 1j * rng.normal(size=n.size)).astype(
        np.complex64)
    y = sfn_echo(x, 50.0, -3.0, phase=0.3)
    e = y - x                                      # the echo alone
    d = 50e-6 * fs                                 # 102.4 samples
    k = int(d)
    # cross-correlate: peak must sit at the fractional delay
    c = np.abs(np.correlate(e[k + 40:k + 4040], x[:4000], "valid"))
    ref = np.abs(np.correlate(x[40:4040], x[:4000], "valid"))
    assert np.argmax(ref) == np.argmax(c)          # integer part matches
    p = np.mean(np.abs(e[200:]) ** 2) / np.mean(np.abs(x) ** 2)
    assert abs(p - 10 ** (-3 / 10)) < 0.05         # -3 dB echo power


# ---------------------------------------------- receiver through channels

def _decode_subch1(x, payload):
    rx = DabReceiver(n_frames=4)
    eti = b"".join(rx.feed(x))
    p = EtiParser()
    got = b"".join(fr.streams[1].data for fr in p.feed(eti)
                   if 1 in fr.streams)
    want = payload[1].tobytes()
    assert len(got) >= 4000, "too few ETI frames decoded"
    idx = want.find(got[:64])
    assert idx == 0 and want[:len(got)] == got, \
        "payload not bit-exact through the channel"
    st = rx.stats[-1]
    assert st.fib_crc_bad == 0
    return rx


def test_receiver_through_sfn_echo():
    """A -2 dB SFN echo at 150 us — well inside Mode I's 246 us guard —
    must decode bit-exactly (the whole point of the guard interval), and
    the PRS channel-impulse-response estimate must report the echo: RMS
    delay spread of taps {0 dB @ 0, -2 dB @ 150 us} is 73.1 us."""
    x, payload = modulate(build_ensemble(), 14)
    rng = np.random.default_rng(5)
    rx = _decode_subch1(
        sfn_echo(awgn(x, 20.0, rng), 150.0, -2.0, phase=1.1), payload)
    assert abs(rx.stats[-1].delay_spread_us - 73.1) < 4.0


def test_receiver_through_tu6_static():
    """COST 207 Typical Urban, static (frequency-selective fades up to
    5 us delay spread) at 20 dB SNR.  The profile's theoretical RMS
    delay spread is 1.06 us; the CIR estimate must land near it (the
    1.536 MHz bandwidth limits resolution to ~0.65 us)."""
    x, payload = modulate(build_ensemble(), 14)
    rng = np.random.default_rng(5)
    rx = _decode_subch1(multipath(awgn(x, 20.0, rng), TU6,
                                  rng=np.random.default_rng(11)), payload)
    assert 0.7 < rx.stats[-1].delay_spread_us < 1.8


@pytest.mark.parametrize("snr", [8, 15, 22])
def test_snr_estimate_tracks_awgn(snr):
    """FrameStats.snr_db (null-symbol noise-floor estimate) tracks the
    injected AWGN level within 1 dB across the useful range."""
    x, _ = modulate(build_ensemble(), 10)
    rx = DabReceiver(n_frames=4)
    rx.feed(awgn(x, float(snr), np.random.default_rng(1)))
    assert abs(rx.stats[-1].snr_db - snr) < 1.0


def test_delay_spread_clean_floor():
    """Single-path channel: the delay-spread estimate sits at the sinc
    sidelobe floor (~0.3 us), far below any multipath reading."""
    x, payload = modulate(build_ensemble(), 14)
    rx = _decode_subch1(x, payload)
    assert rx.stats[-1].delay_spread_us < 0.6


def test_receiver_through_tu6_fading_with_cfo():
    """TU6 with 10 Hz Rayleigh fading plus a 300 Hz carrier offset —
    a moving receiver; the DQPSK differential demod and per-frame
    tracking must ride it."""
    x, payload = modulate(build_ensemble(), 14)
    rng = np.random.default_rng(5)
    y = carrier_offset(
        multipath(awgn(x, 24.0, rng), TU6, doppler_hz=10.0,
                  rng=np.random.default_rng(11)), 300.0)
    _decode_subch1(y, payload)


def test_receiver_through_ra4():
    """COST 207 Rural Area: short delay spread, strong LOS."""
    x, payload = modulate(build_ensemble(), 14)
    rng = np.random.default_rng(5)
    _decode_subch1(multipath(awgn(x, 20.0, rng), RA4,
                             rng=np.random.default_rng(2)), payload)
