import numpy as np
import pytest

import jax.numpy as jnp

from dabtools_tpu import constants as C
from dabtools_tpu.mod.convcode import conv_encode, viterbi_decode_ref
from dabtools_tpu.mod.modulator import Modulator, SubchannelSource
from dabtools_tpu.ops.fec import depuncture, descramble, init_deinterleave_ring, time_deinterleave
from dabtools_tpu.ops.ofdm import cfo_from_hz, demod_frames
from dabtools_tpu.ops.sync import coarse_null_sync, fine_sync_prs, fractional_cfo
from dabtools_tpu.ops.viterbi import viterbi_decode
from dabtools_tpu.tables.puncturing import FIC_PROFILE, eep_profile
from dabtools_tpu.tables.time_interleave import DELAYS
from dabtools_tpu.utils.prbs import scramble_bits


class TestViterbiJax:
    def test_matches_reference_clean(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, size=(3, 768), dtype=np.uint8)
        soft = np.stack([1.0 - 2.0 * conv_encode(b) for b in bits])
        decoded, metric = viterbi_decode(jnp.asarray(soft))
        assert (np.asarray(decoded) == bits).all()
        # clean correlation metric = number of coded bits
        np.testing.assert_allclose(metric, soft.shape[1], rtol=1e-6)

    def test_matches_reference_noisy_punctured(self):
        rng = np.random.default_rng(1)
        mask = FIC_PROFILE.mask().astype(bool)
        batch_soft, batch_ref = [], []
        for _ in range(4):
            bits = rng.integers(0, 2, size=768, dtype=np.uint8)
            soft = 1.0 - 2.0 * conv_encode(bits).astype(np.float64)
            soft += rng.normal(scale=0.7, size=soft.shape)
            soft[~mask] = 0.0
            batch_soft.append(soft)
            batch_ref.append(viterbi_decode_ref(soft))
        decoded, _ = viterbi_decode(jnp.asarray(np.stack(batch_soft),
                                                dtype=jnp.float32))
        # Same decisions as the slow reference decoder (float32 vs float64
        # tie-breaks are astronomically unlikely with continuous noise).
        assert (np.asarray(decoded) == np.stack(batch_ref)).all()

    def test_single_codeword_shape(self):
        bits = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint8)
        soft = 1.0 - 2.0 * conv_encode(bits)
        dec, m = viterbi_decode(jnp.asarray(soft, dtype=jnp.float32))
        assert dec.shape == (8,)
        assert (np.asarray(dec) == bits).all()


class TestFec:
    def test_depuncture_inverts_puncture(self):
        rng = np.random.default_rng(2)
        prof = eep_profile(3, "A", 64)
        mother = rng.normal(size=(2, prof.mother_bits)).astype(np.float32)
        mask = prof.mask().astype(bool)
        tx = mother[:, mask]
        restored = np.asarray(depuncture(jnp.asarray(tx), prof))
        assert restored.shape == mother.shape
        np.testing.assert_array_equal(restored[:, mask], mother[:, mask])
        assert (restored[:, ~mask] == 0).all()

    def test_descramble_matches_host(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, size=(5, 768), dtype=np.uint8)
        dev = np.asarray(descramble(jnp.asarray(bits)))
        host = np.stack([scramble_bits(b) for b in bits])
        assert (dev == host).all()

    def test_time_deinterleave_inverts_modulator(self):
        """Receiver ring undoes SubchannelSource's transmit interleaver."""
        rng = np.random.default_rng(4)
        prof = eep_profile(3, "A", 8)      # small: 512 coded bits
        sub = SubchannelSource(0, prof)
        n_cifs = 40
        coded_frames = []
        tx_cifs = []
        from dabtools_tpu.mod.convcode import conv_encode as enc
        from dabtools_tpu.tables.puncturing import puncture_mask_for_profile
        mask = puncture_mask_for_profile(prof).astype(bool)
        for n in range(n_cifs):
            payload = rng.integers(0, 2, size=prof.data_bits, dtype=np.uint8)
            coded_frames.append(enc(scramble_bits(payload))[mask]
                                .astype(np.float32))
            tx_cifs.append(sub.encode_cif(payload).astype(np.float32))
        tx = 1.0 - 2.0 * np.stack(tx_cifs)          # soft, bit0 -> +1

        ring = init_deinterleave_ring(prof.tx_bits)
        ring, out = time_deinterleave(ring, jnp.asarray(0, jnp.int32),
                                      jnp.asarray(tx))
        out = np.asarray(out)
        # out row j = coded logical frame j-15
        for j in range(15, n_cifs):
            expect = 1.0 - 2.0 * coded_frames[j - 15]
            np.testing.assert_array_equal(out[j], expect)

    def test_time_deinterleave_across_chunks(self):
        """Splitting the CIF stream across calls gives identical output."""
        rng = np.random.default_rng(5)
        prof = eep_profile(3, "A", 8)
        n_bits = prof.tx_bits
        cifs = rng.normal(size=(24, n_bits)).astype(np.float32)
        ring = init_deinterleave_ring(n_bits)
        _, whole = time_deinterleave(ring, jnp.asarray(0, jnp.int32),
                                     jnp.asarray(cifs))
        ring2 = init_deinterleave_ring(n_bits)
        ring2, a = time_deinterleave(ring2, jnp.asarray(0, jnp.int32),
                                     jnp.asarray(cifs[:10]))
        _, b = time_deinterleave(ring2, jnp.asarray(10, jnp.int32),
                                 jnp.asarray(cifs[10:]))
        np.testing.assert_array_equal(np.asarray(whole),
                                      np.concatenate([a, b]))


def _modulated_frames(n_frames, seed=0, bitrate=64):
    rng = np.random.default_rng(seed)
    prof = eep_profile(3, "A", bitrate)
    sub = SubchannelSource(0, prof)
    mod = Modulator([sub])
    fibs = rng.integers(0, 256, size=(n_frames, 12, 32), dtype=np.uint8)
    payloads = rng.integers(
        0, 2, size=(n_frames, 4, prof.data_bits), dtype=np.uint8)
    x = mod.frames(n_frames, lambda f: fibs[f], lambda f, i: payloads[f])
    return x, fibs, payloads, prof


class TestSyncDemod:
    def test_coarse_null_on_clean_signal(self):
        x, *_ = _modulated_frames(2)
        pad = 5000
        x = np.concatenate([np.ones(pad, np.complex64), x])  # not silent
        sync = coarse_null_sync(jnp.asarray(x))
        # argmin of a zero null can land anywhere inside the flat null dip;
        # accept the true start within the null width
        assert 0 <= int(sync["null_start"]) - pad < C.MODE_I.null_size // 2
        assert float(sync["null_ratio"]) < 0.05

    def test_fractional_cfo_estimate(self):
        from dabtools_tpu.mod.impairments import awgn, carrier_offset
        x, *_ = _modulated_frames(1, seed=1)
        rng = np.random.default_rng(9)
        x = awgn(carrier_offset(x, 300.0), 25, rng)
        est = fractional_cfo(jnp.asarray(x), jnp.asarray(0, jnp.int32))
        est_hz = float(est) * C.SAMPLE_RATE / C.MODE_I.fft_size
        assert abs(est_hz - 300.0) < 20.0

    def test_fine_sync_prs_finds_offset_and_int_cfo(self):
        from dabtools_tpu.mod.impairments import carrier_offset
        x, *_ = _modulated_frames(1, seed=2)
        shift = 37
        x = np.concatenate([np.zeros(shift, np.complex64), x])
        x = carrier_offset(x, 3 * C.SAMPLE_RATE / C.MODE_I.fft_size)  # +3 carriers
        guess = C.MODE_I.null_size + C.MODE_I.guard  # unshifted guess
        res = fine_sync_prs(jnp.asarray(x), jnp.asarray(guess, jnp.int32),
                            search=128, max_int_cfo=4)
        assert int(res["offset"]) == shift
        assert int(res["int_cfo"]) == 3
        assert float(res["peak"]) > 0.5

    def test_demod_recovers_fic_bits(self):
        x, fibs, _, _ = _modulated_frames(2, seed=3)
        starts = jnp.asarray([0, C.MODE_I.frame_size], dtype=jnp.int32)
        soft, _ = demod_frames(jnp.asarray(x), starts)
        assert soft.shape == (2, 75, 3072)
        from dabtools_tpu.tables.puncturing import fic_puncture_mask
        from dabtools_tpu.mod.convcode import conv_encode
        mask = fic_puncture_mask().astype(bool)
        for f in range(2):
            triplet = np.unpackbits(fibs[f, :3].reshape(-1))
            expect = conv_encode(scramble_bits(triplet))[mask]
            got = np.asarray(soft[f, 0, :]) < 0  # bit 1 <=> negative soft
            assert (got[:2304].astype(np.uint8) == expect[:2304]).all() or \
                   (got.astype(np.uint8)[:2304] == expect).all()

    def test_demod_with_cfo_correction(self):
        from dabtools_tpu.mod.impairments import awgn, carrier_offset
        x, fibs, _, _ = _modulated_frames(1, seed=4)
        rng = np.random.default_rng(11)
        x = awgn(carrier_offset(x, 420.0), 22, rng)
        soft, _ = demod_frames(jnp.asarray(x),
                               jnp.asarray([0], dtype=jnp.int32),
                               cfo_norm=cfo_from_hz(420.0))
        from dabtools_tpu.tables.puncturing import fic_puncture_mask
        from dabtools_tpu.mod.convcode import conv_encode
        mask = fic_puncture_mask().astype(bool)
        triplet = np.unpackbits(fibs[0, :3].reshape(-1))
        expect = conv_encode(scramble_bits(triplet))[mask][:3072]
        got = (np.asarray(soft[0, 0, :]) < 0).astype(np.uint8)
        bit_errors = int(np.sum(got[:expect.size] != expect[:3072]))
        assert bit_errors < 20  # pre-Viterbi raw BER well under 1%

    def test_drift_phase_undo_matches_clipped_window_shift(self):
        """A drift estimate BEYOND the static clip margin must degrade
        gracefully: demod's phase undo must use the same CLIPPED
        per-symbol window shift that the gather applied (ADVICE r3 —
        an unclipped undo silently corrupted the DQPSK differential).

        Probe: a pure tone at FFT bin 512.  512*symbol_size is a
        multiple of fft_size, so the true symbol-to-symbol differential
        at that bin is exactly 0 phase; any gather/undo mismatch shows
        up as a rotated (sign-flipped) soft bit at the tone's
        deinterleaved position."""
        from dabtools_tpu.ops.ofdm import _DRIFT_MARGIN
        from dabtools_tpu.tables.freq_interleave import freq_interleave_map

        mode = C.MODE_I
        b0 = 512
        n = mode.frame_size + 4 * _DRIFT_MARGIN + mode.fft_size
        t = np.arange(n, dtype=np.float64)
        x = np.exp(2j * np.pi * b0 * t / mode.fft_size).astype(np.complex64)
        # drift far beyond the margin: unclipped adj reaches ~550 while
        # the gather clips at _DRIFT_MARGIN=64
        soft, _ = demod_frames(jnp.asarray(x),
                               jnp.asarray([0], dtype=jnp.int32),
                               drift=600.0)
        p0 = int(np.where(freq_interleave_map(mode) == b0)[0][0])
        tone_soft = np.asarray(soft[0, :, p0])
        # zero differential phase => strongly positive real part at p0
        # for EVERY symbol pair (pre-fix: sign flips once the clip and
        # the undo diverge, a few symbols into the frame)
        assert (tone_soft > 0).all(), \
            f"{(tone_soft <= 0).sum()} symbols sign-flipped"
