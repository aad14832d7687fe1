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


def test_dab2eti_wideband_cli(tmp_path):
    """dab2eti --wideband: one wideband capture -> per-block ETI files,
    driven through the real CLI (BASELINE config #4 surface)."""
    import subprocess
    import sys

    from tests.test_closed_loop import build_ensemble, modulate
    from dabtools_tpu.fic.config import Ensemble, Subchannel
    from dabtools_tpu.fic.fig import FigParser
    from dabtools_tpu.eti.parse import EtiParser

    fs = 8_192_000
    factor = fs // C.SAMPLE_RATE
    center = 178_352_000                  # block 5C; 5B/5D at -/+1.712 MHz
    ens_a = build_ensemble()
    ens_b = Ensemble(eid=0xB10C, label="BLOCK B",
                     subchannels=(Subchannel.eep(4, 0, 2, "B", 64),))
    # 14 frames: the filter ramp-in clips frame 0's null, so coarse sync
    # locks on frame 1 and each 4-frame block consumes ~5 frames of
    # buffer; 10 frames would end one block short.
    xa, _ = modulate(ens_a, 14, seed=31)
    xb, _ = modulate(ens_b, 14, seed=32)
    wide = (upconvert(xa, factor, -1_712_000, fs)
            + upconvert(xb, factor, +1_712_000, fs)) * 0.5
    cap = tmp_path / "wide.cf32"
    wide.astype(np.complex64).tofile(cap)

    outdir = tmp_path / "eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", "cf32", "--wideband", str(center), "--rate", str(fs),
         "--blocks", "5B,5D", "--frames-per-block", "4",
         str(cap), "-o", str(outdir)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "block 5B" in r.stderr and "0x4FFF" in r.stderr
    assert "block 5D" in r.stderr and "0xB10C" in r.stderr

    for block, eid in (("5B", ens_a.eid), ("5D", 0xB10C)):
        frames = list(EtiParser().feed((outdir / f"{block}.eti")
                                       .read_bytes()))
        assert len(frames) >= 4, block
        assert all(f.header_crc_ok and f.mst_crc_ok for f in frames)
        fig = FigParser()
        for f in frames:
            for i in range(0, len(f.fic), 32):
                fig.feed_fib(f.fic[i:i + 32])
        assert fig.ensemble().eid == eid


def test_dab2eti_wideband_cli_errors(tmp_path):
    import subprocess
    import sys

    cap = tmp_path / "x.cf32"
    np.zeros(4096, np.complex64).tofile(cap)
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", "cf32", "--wideband", "178352000", "--rate", "8192000",
         "--blocks", "9Z", str(cap), "-o", str(tmp_path / "d")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 2
    assert "not inside" in r.stderr
