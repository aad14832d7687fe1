"""Rational resampler: tones, streaming equivalence, and a full DAB decode
from a native-rate (2.4 Msps) capture."""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.ops.resample import Resampler


def fft_resample(x: np.ndarray, n_out: int) -> np.ndarray:
    """Exact spectral resample (test synthesis only)."""
    spec = np.fft.fft(x)
    out = np.zeros(n_out, dtype=np.complex128)
    half = min(x.size, n_out) // 2
    out[:half] = spec[:half]
    out[-half:] = spec[-half:]
    return (np.fft.ifft(out) * n_out / x.size).astype(np.complex64)


class TestResampler:
    def test_ratio(self):
        r = Resampler(2_400_000)
        assert (r.up, r.down) == (64, 75)

    def test_tone_frequency_preserved(self):
        fs_in = 2_400_000
        r = Resampler(fs_in)
        t = np.arange(fs_in // 10)
        f0 = 300_000.0
        x = np.exp(2j * np.pi * f0 * t / fs_in).astype(np.complex64)
        y = r(x)
        assert y.size > 0
        seg = y[2000:2000 + 8192]
        spec = np.abs(np.fft.fft(seg))
        f = np.fft.fftfreq(8192, d=1 / C.SAMPLE_RATE)
        peak = f[int(np.argmax(spec))]
        assert abs(peak - f0) < 300
        # amplitude preserved within the passband
        assert abs(np.abs(seg).mean() - 1.0) < 0.05

    def test_streaming_matches_oneshot(self):
        rng = np.random.default_rng(0)
        x = (rng.normal(size=300_000) + 1j * rng.normal(size=300_000)
             ).astype(np.complex64)
        one = Resampler(2_400_000)(x)
        r = Resampler(2_400_000)
        parts = [r(x[:50_000]), r(x[50_000:50_137]), r(x[50_137:200_000]),
                 r(x[200_000:])]
        streamed = np.concatenate([p for p in parts if p.size])
        n = min(one.size, streamed.size)
        np.testing.assert_allclose(streamed[:n], one[:n], atol=2e-4)

    def test_dab_decode_from_native_rate_capture(self):
        """Modulate at 2.048, spectrally shift to 2.4 Msps (the RTL-SDR
        native rate), resample back with the polyphase front-end, decode."""
        from dabtools_tpu.models.receiver import DabReceiver
        from tests.test_closed_loop import build_ensemble, modulate

        ens = build_ensemble()
        x, payload_bytes = modulate(ens, 12, seed=31)
        n24 = int(round(x.size * 75 / 64))
        cap24 = fft_resample(x, n24)

        r = Resampler(2_400_000)
        y = r(cap24)
        rx = DabReceiver(n_frames=4)
        eti = rx.feed(y)
        assert rx.ensemble is not None and rx.ensemble.eid == ens.eid
        assert rx.stats[-1].fib_crc_bad == 0
        assert len(eti) > 0
        from dabtools_tpu.eti.parse import EtiParser
        frames = list(EtiParser().feed(b"".join(eti)))
        a = rx._activation_cif
        off = round(rx.stats[0].null_start / C.MODE_I.frame_size) * 4
        for k, f in enumerate(frames):
            assert f.subchannel_data(1) == \
                payload_bytes[1][a + k + off].tobytes(), k


def test_dab2eti_cli_native_rate(tmp_path):
    """dab2eti --rate 2.4e6 end to end via the CLI surface."""
    import subprocess
    import sys
    from tests.test_closed_loop import build_ensemble, modulate

    ens = build_ensemble()
    x, _ = modulate(ens, 12, seed=32)
    cap24 = fft_resample(x, int(round(x.size * 75 / 64)))
    cap = tmp_path / "native24.cf32"
    cap24.astype(np.complex64).tofile(cap)
    out = tmp_path / "out.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", "cf32", "--rate", "2400000",
         "--frames-per-block", "4", str(cap), "-o", str(out)],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr
    assert "resampling 2.4000 Msps" in r.stderr
    assert out.stat().st_size >= 4 * 6144
