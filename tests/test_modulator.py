import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.mod.convcode import conv_encode
from dabtools_tpu.mod.modulator import Modulator, SubchannelSource
from dabtools_tpu.tables.freq_interleave import freq_interleave_map
from dabtools_tpu.tables.prs import prs_spectrum
from dabtools_tpu.tables.puncturing import eep_profile, fic_puncture_mask
from dabtools_tpu.utils.prbs import scramble_bits


def make_modulator():
    sub = SubchannelSource(start_cu=0, profile=eep_profile(3, "A", 64))
    return Modulator([sub])


def random_fibs(rng):
    return rng.integers(0, 256, size=(12, 32), dtype=np.uint8)


def test_frame_geometry():
    rng = np.random.default_rng(0)
    mod = make_modulator()
    payload = rng.integers(0, 2, size=(4, mod.subchannels[0].profile.data_bits),
                           dtype=np.uint8)
    frame = mod.frame(random_fibs(rng), {0: payload})
    assert frame.shape == (C.MODE_I.frame_size,)
    assert frame.dtype == np.complex64
    # Null symbol is silent.
    assert np.abs(frame[:C.MODE_I.null_size]).max() == 0.0
    # Data symbols are not.
    assert np.abs(frame[C.MODE_I.null_size:]).max() > 0.0


def test_prs_symbol_demodulates_to_table():
    rng = np.random.default_rng(1)
    mod = make_modulator()
    payload = rng.integers(0, 2, size=(4, mod.subchannels[0].profile.data_bits),
                           dtype=np.uint8)
    frame = mod.frame(random_fibs(rng), {0: payload})
    m = C.MODE_I
    start = m.null_size + m.guard  # useful part of symbol 1 (PRS)
    spec = np.fft.fft(frame[start:start + m.fft_size])
    ref = prs_spectrum(m) * m.fft_size / np.sqrt(m.n_carriers)
    np.testing.assert_allclose(spec, ref, atol=1e-2)


def test_guard_interval_is_cyclic_prefix():
    rng = np.random.default_rng(2)
    mod = make_modulator()
    payload = rng.integers(0, 2, size=(4, mod.subchannels[0].profile.data_bits),
                           dtype=np.uint8)
    frame = mod.frame(random_fibs(rng), {0: payload})
    m = C.MODE_I
    for sym in range(3):
        s0 = m.null_size + sym * m.symbol_size
        guard = frame[s0:s0 + m.guard]
        tail = frame[s0 + m.fft_size:s0 + m.symbol_size]
        np.testing.assert_allclose(guard, tail, atol=1e-6)


def test_fic_symbol_bits_roundtrip():
    """Differentially demodulate FIC symbol 1 by hand -> coded FIC bits."""
    rng = np.random.default_rng(3)
    mod = make_modulator()
    payload = rng.integers(0, 2, size=(4, mod.subchannels[0].profile.data_bits),
                           dtype=np.uint8)
    fibs = random_fibs(rng)
    frame = mod.frame(fibs, {0: payload})
    m = C.MODE_I

    def sym_spec(l):  # l = 0 is PRS
        start = m.null_size + l * m.symbol_size + m.guard
        return np.fft.fft(frame[start:start + m.fft_size])

    z = sym_spec(1) * np.conj(sym_spec(0))
    q = z[freq_interleave_map(m)]
    bits = np.concatenate([(q.real < 0), (q.imag < 0)]).astype(np.uint8)

    mask = fic_puncture_mask().astype(bool)
    triplet_bits = np.unpackbits(fibs[:3].reshape(-1))
    expect = conv_encode(scramble_bits(triplet_bits))[mask]
    # Symbol 1 carries the first bits_per_symbol (3072) of the 9216-bit FIC
    # stream = codeword 0 (2304 bits) + start of codeword 1; compare the
    # codeword-0 prefix.
    assert (bits[:expect.size] == expect).all()


def test_time_interleaver_startup_and_alignment():
    """After 16 CIFs, bit i of output CIF n comes from input CIF n-d(i)."""
    sub = SubchannelSource(start_cu=0, profile=eep_profile(3, "A", 64))
    rng = np.random.default_rng(4)
    n_cifs = 20
    payloads = rng.integers(0, 2, size=(n_cifs, sub.profile.data_bits),
                            dtype=np.uint8)
    coded = []
    outs = []
    from dabtools_tpu.tables.puncturing import puncture_mask_for_profile
    mask = puncture_mask_for_profile(sub.profile).astype(bool)
    for n in range(n_cifs):
        expect_coded = conv_encode(scramble_bits(payloads[n]))[mask]
        coded.append(expect_coded)
        outs.append(sub.encode_cif(payloads[n]))
    from dabtools_tpu.tables.time_interleave import DELAYS
    d = DELAYS[np.arange(sub.tx_bits) % 16]
    for n in range(16, n_cifs):
        src = np.stack([coded[n - di][i] for i, di in enumerate(d)])
        assert (outs[n] == src).all()
