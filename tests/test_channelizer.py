"""Wideband channelizer tests: tone extraction + full two-block DAB decode
from a synthesized 16.384 Msps capture."""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.ops.fir import Channelizer, design_lowpass


def upconvert(baseband: np.ndarray, factor: int, offset_hz: int,
              fs_out: float) -> np.ndarray:
    """Frequency-domain upsample + shift (test synthesis only)."""
    n = baseband.size
    spec = np.fft.fft(baseband)
    wide = np.zeros(n * factor, dtype=np.complex128)
    half = n // 2
    wide[:half] = spec[:half]
    wide[-(n - half):] = spec[half:]
    x = np.fft.ifft(wide) * factor
    t = np.arange(x.size)
    return (x * np.exp(2j * np.pi * offset_hz * t / fs_out)).astype(
        np.complex64)


class TestFilter:
    def test_lowpass_response(self):
        h = design_lowpass(383, cutoff_norm=0.85e6 / 16.384e6)
        w = np.fft.rfftfreq(1 << 16) * 16.384e6
        mag = np.abs(np.fft.rfft(h, 1 << 16))
        assert mag[w < 0.768e6].min() > 0.97
        assert mag[w > 1.1e6].max() < 1e-2   # adjacent block rejected


class TestChannelizer:
    def test_tone_extraction(self):
        fs = 16_384_000
        ch = Channelizer(fs, offsets_hz=[3_424_000, -1_712_000])
        t = np.arange(fs // 8)
        tone1 = np.exp(2j * np.pi * (3_424_000 + 100_000) * t / fs)
        tone2 = np.exp(2j * np.pi * (-1_712_000 - 250_000) * t / fs)
        y = ch((tone1 + tone2).astype(np.complex64))
        assert y.shape[0] == 2
        for k, expect_hz in enumerate((100_000, -250_000)):
            spec = np.abs(np.fft.fft(y[k][2000:2000 + 4096]))
            f = np.fft.fftfreq(4096, d=1 / C.SAMPLE_RATE)
            peak = f[int(np.argmax(spec))]
            assert abs(peak - expect_hz) < 600
            # the other tone is rejected
            other = spec[np.abs(f - (-350_000 if k == 0 else 350_000)) < 2e3]
            assert spec.max() > 50 * other.max()

    def test_streaming_matches_oneshot(self):
        fs = 8_192_000
        rng = np.random.default_rng(0)
        x = (rng.normal(size=fs // 4) + 1j * rng.normal(size=fs // 4)
             ).astype(np.complex64)
        one = Channelizer(fs, offsets_hz=[1_712_000])(x)
        ch = Channelizer(fs, offsets_hz=[1_712_000])
        parts = [ch(x[:100_000]), ch(x[100_000:100_128]),
                 ch(x[100_128:1_500_000]), ch(x[1_500_000:])]
        streamed = np.concatenate([p for p in parts if p.size], axis=-1)
        n = min(one.shape[-1], streamed.shape[-1])
        np.testing.assert_allclose(streamed[:, :n], one[:, :n],
                                   atol=1e-4)

    def test_two_dab_blocks_decode(self):
        """Synthesize two modulated ensembles at +-1.712 MHz in one wideband
        capture; channelize; both FIC streams must decode bit-exactly."""
        from tests.test_closed_loop import build_ensemble, modulate
        from dabtools_tpu.fic.config import Ensemble, Subchannel
        from dabtools_tpu.models.receiver import DabReceiver

        fs = 8_192_000
        factor = fs // C.SAMPLE_RATE
        ens_a = build_ensemble()
        ens_b = Ensemble(eid=0xB10C, label="BLOCK B",
                         subchannels=(Subchannel.eep(4, 0, 2, "B", 64),))
        xa, pa = modulate(ens_a, 12, seed=11)
        xb, pb = modulate(ens_b, 12, seed=22)
        wide = (upconvert(xa, factor, +1_712_000, fs)
                + upconvert(xb, factor, -1_712_000, fs))
        wide *= 0.5

        ch = Channelizer(fs, offsets_hz=[+1_712_000, -1_712_000])
        y = ch(wide)

        rx_a, rx_b = DabReceiver(n_frames=4), DabReceiver(n_frames=4)
        eti_a = rx_a.feed(y[0])
        eti_b = rx_b.feed(y[1])
        assert rx_a.ensemble is not None and rx_a.ensemble.eid == ens_a.eid
        assert rx_b.ensemble is not None and rx_b.ensemble.eid == 0xB10C
        assert rx_a.stats[-1].fib_crc_bad == 0
        assert rx_b.stats[-1].fib_crc_bad == 0
        assert len(eti_a) > 0 and len(eti_b) > 0
        # payloads survive the channelizer bit-exactly post-FEC; the FIR
        # group delay shifts the stream, so the receiver's first decoded
        # frame is a later modulator frame: account via null_start.
        from dabtools_tpu.eti.parse import EtiParser
        frames = list(EtiParser().feed(b"".join(eti_a)))
        assert len(frames) >= 4
        a = rx_a._activation_cif
        off = round(rx_a.stats[0].null_start / C.MODE_I.frame_size) * 4
        for k, f in enumerate(frames):
            assert f.subchannel_data(1) == pa[1][a + k + off].tobytes(), k


class TestMethodEquivalence:
    def test_fft_matches_direct(self):
        rng = np.random.default_rng(9)
        fs = 16_384_000
        x = (rng.normal(size=fs // 16) + 1j * rng.normal(size=fs // 16)
             ).astype(np.complex64)
        offs = [3_424_000, -1_712_000, 0]
        yd = Channelizer(fs, offs, method="direct")(x)
        yf = Channelizer(fs, offs, method="fft")(x)
        n = min(yd.shape[1], yf.shape[1])
        np.testing.assert_allclose(yf[:, :n], yd[:, :n], atol=2e-5)

    def test_unknown_method_rejected(self):
        with pytest.raises(ValueError):
            Channelizer(8_192_000, [0], method="FFT")

    def test_unaligned_offset_falls_back_to_direct(self):
        ch = Channelizer(8_192_000, [1_712_000 + 1000], method="auto")
        assert ch.method == "direct"
