"""Native dabhost library vs the pure-Python implementations."""

import numpy as np
import pytest

from dabtools_tpu.utils import native
from dabtools_tpu.utils.crc import crc16_ccitt_py as crc16_ccitt, firecode_py as firecode
from dabtools_tpu.utils.prbs import energy_dispersal_bits

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native toolchain unavailable")


def test_crc16_matches_python():
    rng = np.random.default_rng(0)
    for n in (0, 1, 30, 96, 5000):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert native.crc16_ccitt(data) == crc16_ccitt(data)


def test_firecode_matches_python():
    rng = np.random.default_rng(1)
    for n in (9, 11, 120):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert native.firecode(data) == firecode(data)


def test_prbs_matches_python():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=768 // 8, dtype=np.uint8)
    got = native.prbs_xor(data)
    prbs_bytes = np.packbits(energy_dispersal_bits(768))
    assert (got == (data ^ prbs_bytes)).all()


def test_u8_to_cf32_matches_python():
    from dabtools_tpu.mod.impairments import u8_to_complex
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=2048, dtype=np.uint8)
    np.testing.assert_allclose(native.u8_to_cf32(u8), u8_to_complex(u8),
                               rtol=1e-6)


def test_eti_build_matches_python_assembler():
    from dabtools_tpu.eti.assemble import EtiAssembler, tpl_for_subchannel
    from tests.test_fig_eti import example_ensemble

    ens = example_ensemble()
    asm = EtiAssembler(ens)
    rng = np.random.default_rng(4)
    fibs = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
            for _ in range(3)]
    data = {s.subchid: rng.integers(0, 256, s.data_bytes,
                                    dtype=np.uint8).tobytes()
            for s in ens.subchannels}
    py_frame = asm.frame(fibs, data)

    # Build the identical frame natively.
    stc = bytearray()
    sad = 96 // 8
    subch = b""
    for s in ens.sorted_subchannels():
        stl = len(data[s.subchid]) // 8
        stc.append((s.subchid << 2) | ((sad >> 8) & 0x03))
        stc.append(sad & 0xFF)
        stc.append((tpl_for_subchannel(s) << 2) | ((stl >> 8) & 0x03))
        stc.append(stl & 0xFF)
        sad += stl
        subch += data[s.subchid]
    c_frame = native.eti_build(0, 0, 0xFF, 1, bytes(stc),
                               len(ens.subchannels), b"".join(fibs), subch)
    assert c_frame == py_frame


def test_eti_find_fsync():
    from dabtools_tpu import constants as C
    buf = b"\x12\x34" * 10 + b"\xff" + C.ETI_FSYNC.to_bytes(3, "big") + b"\x00" * 10
    assert native.eti_find_fsync(buf) == 20
    assert native.eti_find_fsync(b"\x00" * 50) == -1


class TestIqRing:
    def test_roundtrip_and_wrap(self):
        rb = native.IqRing(1 << 12)
        rng = np.random.default_rng(5)
        total_in, total_out = b"", b""
        for _ in range(50):
            chunk = rng.integers(0, 256, size=rng.integers(1, 300),
                                 dtype=np.uint8).tobytes()
            wrote = rb.write(chunk)
            total_in += chunk[:wrote]
            total_out += rb.read(rng.integers(1, 400))
        total_out += rb.read(1 << 12)
        assert total_out == total_in
        assert rb.fill == 0

    def test_overflow_drops_and_counts(self):
        rb = native.IqRing(1 << 10)
        wrote = rb.write(b"\xab" * 2000)
        assert wrote == 1 << 10
        assert rb.dropped == 2000 - (1 << 10)


def test_eti_find_fsync_matches_python_hunt():
    """The native FSYNC hunt and parse.py's Python one stay equivalent."""
    from dabtools_tpu.eti.parse import _find_fsync
    from dabtools_tpu import constants as C

    rng = np.random.default_rng(5)
    buf = bytearray(rng.integers(0, 256, 4000, dtype=np.uint8).tobytes())
    # plant both sync words (normal + inverted phase)
    buf[700:703] = C.ETI_FSYNC.to_bytes(3, "big")
    buf[2100:2103] = C.ETI_FSYNC_INV.to_bytes(3, "big")
    # convention offset: the native hunt returns the FRAME start (the ERR
    # byte at/after `start`, one before FSYNC); the Python hunt returns
    # the FSYNC offset strictly after `start` — so ERR byte >= start.
    for start in (-1, 0, 699, 700, 2099, 2500):
        py = _find_fsync(buf, start)
        nat = native.eti_find_fsync(bytes(buf), max(start, 0))
        assert nat == (py - 1 if py > 0 else -1), start


def test_eti_build_batch_matches_sequential():
    """frame_batch (one native crossing per device block) is bit-identical
    to N frame() calls, including ERR levels, FCT/FP continuity across
    batches, and TIST stamping."""
    from dabtools_tpu.eti.assemble import EtiAssembler
    from dabtools_tpu.fic.config import Ensemble, Subchannel

    subs = tuple(Subchannel.eep(i + 1, i * 96, 3, "A", 128)
                 for i in range(9))
    ens = Ensemble(eid=0x4FFF, subchannels=subs)
    rng = np.random.default_rng(11)
    fibs = [[rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
             for _ in range(3)] for _ in range(20)]
    datas = [{s.subchid: rng.integers(0, 256, s.data_bytes,
                                      dtype=np.uint8).tobytes()
              for s in subs} for _ in range(20)]
    errs = [0] * 16 + [1, 2, 3, 0]
    for tist in (None, 0.25):
        a_seq = EtiAssembler(ens, tist_start=tist)
        a_bat = EtiAssembler(ens, tist_start=tist)
        seq = [a_seq.frame(f, d, e)
               for f, d, e in zip(fibs, datas, errs)]
        # two batches back to back: FCT/FP must continue across the seam
        bat = (a_bat.frame_batch(fibs[:7], datas[:7], errs[:7])
               + a_bat.frame_batch(fibs[7:], datas[7:], errs[7:]))
        assert seq == bat, f"tist={tist}"
