"""Packet-mode FEC (EN 300 401 s5.3.5): RS(204,188) frame math, the
streaming encoder/decoder (mid-stream join, resync, burst correction),
FIG 0/14 signalling, and the dabmux -> eti2audio CLI path with a
corrupted ETI stream (beyond-reference: upstream dabtools has no packet
mode at all)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from dabtools_tpu.eti.packet import PacketDecoder, PacketEncoder
from dabtools_tpu.eti.pfec import (
    APP_BYTES,
    FEC_FRAME_LEN,
    FecDecoder,
    FecEncoder,
    fec_correct,
    fec_packets,
)
from dabtools_tpu.fic.config import Ensemble, Subchannel
from dabtools_tpu.fic.fig import FigParser, build_fibs_for_ensemble


def test_fec_frame_roundtrip_and_burst():
    rng = np.random.default_rng(1)
    app = rng.integers(0, 256, APP_BYTES, dtype=np.uint8).tobytes()
    frame = bytearray(app + fec_packets(app))
    got, n = fec_correct(bytes(frame))
    assert got == app and n == 0

    # a whole corrupted 96-byte packet = 8 bytes per RS row (= t): the
    # column-wise interleave makes exactly this burst correctable
    burst = bytearray(frame)
    for i in range(192, 288):
        burst[i] ^= 0x5A
    got, n = fec_correct(bytes(burst))
    assert got == app and n == 96

    # corruption of the FEC packets' own RS bytes is also correctable
    fecside = bytearray(frame)
    for i in range(APP_BYTES + 2, APP_BYTES + 2 + 8):
        fecside[i] ^= 0xFF
    got, n = fec_correct(bytes(fecside))
    assert got == app

    # beyond t=8 per row: detected as uncorrectable, app returned as-is
    heavy = bytearray(frame)
    for i in range(0, 400):
        heavy[i] ^= 0xA5
    got, n = fec_correct(bytes(heavy))
    assert n == -1 and got == bytes(heavy[:APP_BYTES])


def test_fec_correct_partial_row_failure_keeps_other_corrections():
    """One uncorrectable row must not discard the corrections the other
    11 rows achieved (review finding)."""
    rng = np.random.default_rng(9)
    app = rng.integers(0, 256, APP_BYTES, dtype=np.uint8).tobytes()
    frame = bytearray(app + fec_packets(app))
    # row 0 = app bytes at k % 12 == 0: 9 errors -> uncorrectable (t=8)
    for col in range(9):
        frame[col * 12] ^= 0xAA
    # row 1 (k % 12 == 1): 1 error -> trivially correctable
    frame[1] ^= 0x55
    got, n = fec_correct(bytes(frame))
    assert n == -1
    table_got = np.frombuffer(got, dtype=np.uint8).reshape(188, 12).T
    table_want = np.frombuffer(app, dtype=np.uint8).reshape(188, 12).T
    # row 1 corrected despite row 0's failure; row 0 as received
    np.testing.assert_array_equal(table_got[1], table_want[1])
    bad_row0 = np.frombuffer(bytes(frame[:APP_BYTES]),
                             dtype=np.uint8).reshape(188, 12).T[0]
    np.testing.assert_array_equal(table_got[0], bad_row0)


def test_fec_encoder_flush_no_spurious_frame():
    """flush() on a 24-byte remainder must close the frame with exactly
    one padding packet, not open a second all-padding FEC frame."""
    from dabtools_tpu.eti.packet import build_packet
    enc = FecEncoder()
    for _ in range(93):                       # 93 x 24 = 2232 app bytes
        enc.add_packet(build_packet(5, b"x", 0, True, True, 24))
    enc.flush()
    assert enc.pending_bytes == APP_BYTES + 9 * 24   # exactly one frame


def test_fec_lockstep_tolerates_header_bit_errors():
    """Corrupted FEC packet headers (unprotected bytes) must not discard
    an otherwise-correctable frame once lockstep is established."""
    rng = np.random.default_rng(10)
    groups = [rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
              for _ in range(30)]
    stream = bytearray(_fec_stream(groups))
    # corrupt 2 of the 9 headers in BOTH the first FEC group (initial
    # sync needs only 7 of 9) and the second (lockstep needs 6 of 9)
    stream[APP_BYTES] ^= 0xFF
    stream[APP_BYTES + 48 + 1] ^= 0xFF
    base = FEC_FRAME_LEN + APP_BYTES
    stream[base] ^= 0xFF
    stream[base + 24 + 1] ^= 0xFF
    dec = FecDecoder()
    got = [dg for a, dg in dec.feed(bytes(stream)) if a == 5]
    assert got == groups
    assert dec.stats["resyncs"] == 0


def _fec_stream(groups, frame_bytes=24 * 12):
    pe = PacketEncoder(address=5, packet_size=96)
    for g in groups:
        pe.add_data_group(g)
    enc = FecEncoder()
    while (pkt := pe.take_packet()) is not None:
        enc.add_packet(pkt)
    enc.flush()
    stream = bytearray()
    while enc.pending_bytes:
        stream += enc.take_frame(frame_bytes)
    return bytes(stream)


def test_fec_stream_aligned_start_lossless():
    rng = np.random.default_rng(2)
    groups = [rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
              for n in rng.integers(30, 400, 40)]
    stream = _fec_stream(groups)
    assert len(stream) % (24 * 12) == 0    # whole logical frames
    dec = FecDecoder()
    got = [dg for a, dg in dec.feed(stream) if a == 5]
    assert got == groups                 # nothing lost from byte 0
    assert dec.stats["rs_failures"] == 0
    assert dec.stats["crc_failures"] == 0   # merged packet stats


def test_fec_stream_midjoin_and_corruption():
    rng = np.random.default_rng(3)
    groups = [rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
              for n in rng.integers(30, 400, 40)]
    stream = bytearray(_fec_stream(groups))
    # 5 random corrupted bytes per FEC frame (well under t=8 per row)
    for base in range(0, len(stream) - FEC_FRAME_LEN, FEC_FRAME_LEN):
        for i in rng.integers(0, FEC_FRAME_LEN, 5):
            stream[base + int(i)] ^= 0xFF
    dec = FecDecoder()
    got = []
    buf = bytes(stream[1000:])           # join mid-transmission
    for i in range(0, len(buf), 512):    # straddling feeds
        got += [dg for a, dg in dec.feed(buf[i:i + 512]) if a == 5]
    sent = set(groups)
    assert all(dg in sent for dg in got), "corrupt data group leaked"
    # sync may discard up to one FEC frame of app data beyond the drop
    assert len(got) >= len(groups) - 14
    assert dec.stats["rs_corrected_bytes"] > 0
    assert dec.stats["rs_failures"] == 0


def test_fec_stream_resync_after_gap():
    rng = np.random.default_rng(4)
    groups = [rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
              for _ in range(60)]
    stream = _fec_stream(groups)
    # drop a non-multiple-of-24 chunk mid-stream: lockstep breaks
    cut = bytes(stream[:3 * FEC_FRAME_LEN]) + bytes(
        stream[3 * FEC_FRAME_LEN + 1001:])
    dec = FecDecoder()
    got = [dg for a, dg in dec.feed(cut) if a == 5]
    sent = set(groups)
    assert all(dg in sent for dg in got)
    assert dec.stats["resyncs"] >= 1
    assert len(got) >= len(groups) // 2  # both sides of the gap decode


def test_fig_0_5_and_0_17_roundtrip():
    from dabtools_tpu.fic.fig import fig_0_5, fig_0_17
    ens = Ensemble(eid=1, subchannels=(Subchannel.eep(2, 0, 3, "A", 64),))
    parser = FigParser()
    for fib in build_fibs_for_ensemble(
            ens, 0, extra_figs=(fig_0_5(2, 0x09), fig_0_17(0x1234, 10))):
        parser.feed_fib(fib.tobytes())
    assert parser.languages[("subch", 2)] == 0x09      # English
    assert parser.ptys[0x1234] == (10, True)           # Pop Music, static


def test_fig_0_17_rejects_data_service_sid():
    from dabtools_tpu.fic.fig import fig_0_17
    with pytest.raises(ValueError):
        fig_0_17(0xE1C00042, 3)      # 32-bit SId would truncate silently


def test_fig_0_6_and_0_21_roundtrip():
    from dabtools_tpu.fic.fig import fig_0_6, fig_0_21
    ens = Ensemble(eid=1, subchannels=(Subchannel.eep(2, 0, 3, "A", 64),))
    parser = FigParser()
    figs = (fig_0_6(0x123, (0x1111, 0x2222), idlq=0),
            fig_0_6(0x124, (0xA201, 0xA202), idlq=1, hard=False),
            fig_0_6(0x125, (0xE0_1111,), international=True),
            fig_0_21(0x4FFF, (227_360_000, 225_648_000), rm=0),
            fig_0_21(0x89AB, (95_800_000,), rm=8, region=3))
    for fib in build_fibs_for_ensemble(ens, 0, extra_figs=figs):
        parser.feed_fib(fib.tobytes())
    ls = parser.linkage_sets[0x123]
    assert ls["ids"] == (0x1111, 0x2222) and ls["hard"] and ls["active"]
    ls2 = parser.linkage_sets[0x124]
    assert ls2["idlq"] == 1 and not ls2["hard"]
    # ILS=1: ECC-prefixed 24-bit ids round-trip
    ls_intl = parser.linkage_sets[0x125]
    assert ls_intl["international"] and ls_intl["ids"] == (0xE0_1111,)
    # DAB frequencies quantized to 16 kHz units survive exactly
    assert parser.freq_info[(0, 0x4FFF, 0)] == (227_360_000, 225_648_000)
    assert parser.freq_info[(3, 0x89AB, 8)] == (95_800_000,)

    # FIG 0/24: OE services round-trip (oe=False: "also found in");
    # multiple FIGs for one service MERGE, 32-bit data-service SIds ride
    # the pd bit, and this/other-ensemble info stay separate databases.
    from dabtools_tpu.fic.fig import fig_0_24
    parser24 = FigParser()
    figs24 = (fig_0_24(0x5678, (0x4FFF, 0xC0FE), oe=False),
              fig_0_24(0x5678, (0xC0FE, 0xAAAA), oe=False),   # merge+dedup
              fig_0_24(0x5678, (0xBBBB,), oe=True),           # distinct db
              fig_0_24(0xE1C00042, (0x1234,), oe=False))      # 32-bit SId
    for fib in build_fibs_for_ensemble(ens, 0, extra_figs=figs24):
        parser24.feed_fib(fib.tobytes())
    assert parser24.oe_services[(0x5678, False)] == (0x4FFF, 0xC0FE, 0xAAAA)
    assert parser24.oe_services[(0x5678, True)] == (0xBBBB,)
    assert parser24.oe_services[(0xE1C00042, False)] == (0x1234,)
    with pytest.raises(ValueError):
        fig_0_24(1, tuple(range(14)))    # over the 29-byte body cap

    # FIG 0/25 + 0/26: other-ensemble announcements round-trip
    from dabtools_tpu.fic.fig import fig_0_25, fig_0_26
    parser25 = FigParser()
    for fib in build_fibs_for_ensemble(
            ens, 0, extra_figs=(
                fig_0_25(0x1111, 0x0002, (0x4FFF,)),
                fig_0_26(5, 0x0002, 0x4FFF, 9))):
        parser25.feed_fib(fib.tobytes())
    assert parser25.oe_announce_support[0x1111] == (0x0002, (0x4FFF,))

    # max-size FIGs must still fit a FIB; one-over raises at build time
    for fig in (fig_0_24(1, tuple(range(1, 13))),            # pd=0 cap 12
                fig_0_24(0x10000001, tuple(range(1, 12))),   # pd=1 cap 11
                fig_0_25(1, 1, tuple(range(1, 12)))):        # cap 11
        assert len(build_fibs_for_ensemble(ens, 0, extra_figs=(fig,)))
    with pytest.raises(ValueError):
        fig_0_24(1, tuple(range(13)))
    with pytest.raises(ValueError):
        fig_0_24(0x10000001, tuple(range(12)))
    with pytest.raises(ValueError):
        fig_0_25(1, 1, tuple(range(12)))

    # >11 ensembles span several FIG 0/25s: the parser merges them
    for fib in build_fibs_for_ensemble(
            ens, 0, extra_figs=(
                fig_0_25(0x2222, 0x0001, tuple(range(1, 12))),
                fig_0_25(0x2222, 0x0001, (11, 12, 13)))):
        parser25.feed_fib(fib.tobytes())
    assert parser25.oe_announce_support[0x2222] == (
        0x0001, tuple(range(1, 14)))
    asw, eid_o, cl_o, _ = parser25.oe_announce_active[5]
    assert (asw, eid_o, cl_o) == (0x0002, 0x4FFF, 9)
    # ASw = 0 ends it
    for fib in build_fibs_for_ensemble(
            ens, 0, extra_figs=(fig_0_26(5, 0, 0x4FFF, 9),)):
        parser25.feed_fib(fib.tobytes())
    assert 5 not in parser25.oe_announce_active

    # change-event form (no id list) updates flags without erasing ids
    parser2 = FigParser()
    for fib in build_fibs_for_ensemble(
            ens, 0, extra_figs=(fig_0_6(0x123, (0x1111,)),)):
        parser2.feed_fib(fib.tobytes())
    from dabtools_tpu.fic.fig import _BitWriter
    w = _BitWriter()
    w.put(0, 1); w.put(0, 1); w.put(0, 1); w.put(6, 5)
    w.put(0, 1); w.put(0, 1); w.put(1, 1); w.put(0, 1)   # deactivated
    w.put(0x123, 12)
    body = w.bytes()
    fig6 = bytes([0x00 | len(body)]) + body
    for fib in build_fibs_for_ensemble(ens, 0, extra_figs=(fig6,)):
        parser2.feed_fib(fib.tobytes())
    ls3 = parser2.linkage_sets[0x123]
    assert not ls3["active"] and ls3["ids"] == (0x1111,)


def test_fig_0_14_roundtrip():
    ens = Ensemble(
        eid=0x7E57,
        subchannels=(Subchannel.eep(3, 0, 3, "A", 32),
                     Subchannel.eep(4, 24, 3, "A", 32)),
        fec_schemes=((3, 1),))
    parser = FigParser()
    for f in range(2):
        for fib in build_fibs_for_ensemble(ens, f):
            parser.feed_fib(fib.tobytes())
    got = parser.ensemble()
    assert got.fec_schemes == ((3, 1),)
    assert got.fec_scheme(3) == 1
    assert got.fec_scheme(4) == 0
    # JSON checkpoint round-trip keeps the schemes
    assert Ensemble.from_dict(
        json.loads(json.dumps(got.to_dict()))).fec_schemes == ((3, 1),)


@pytest.fixture(scope="module")
def fec_mux(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fecmux")
    obj = tmp / "guide.bin"
    obj.write_bytes(np.random.default_rng(7).integers(
        0, 256, 900, dtype=np.uint8).tobytes())
    cfg = {
        "eid": "0xFEC1", "label": "FEC MUX",
        "services": [
            {"sid": "0xE1C00099", "label": "EPGFEC", "type": "packet",
             "subch": {"id": 9, "start_cu": 0, "protection": "EEP-3A",
                       "bitrate": 32},
             "scid": 4, "address": 21, "objects": [str(obj)],
             "fec": True, "language": 9},
        ],
    }
    cfg_path = tmp / "mux.json"
    cfg_path.write_text(json.dumps(cfg))
    eti = tmp / "out.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg_path),
         "--cifs", "80", "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    return {"tmp": tmp, "eti": eti, "obj": obj.read_bytes()}


def test_dabmux_fec_etiinfo(fec_mux):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo",
         str(fec_mux["eti"])], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "FEC RS(204,188)" in r.stdout
    assert "English" in r.stdout     # FIG 0/5 on a packet component


def test_dabmux_fec_list_shows_fec_and_language(fec_mux):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--list",
         str(fec_mux["eti"])], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "+FEC" in r.stdout and "[English]" in r.stdout


def test_dabmux_fec_extraction_clean(fec_mux):
    outdir = fec_mux["tmp"] / "objs"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0xE1C00099", "--objects", str(outdir),
         str(fec_mux["eti"]), "-o", str(fec_mux["tmp"] / "dg.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "packet-mode FEC" in r.stderr
    assert (outdir / "guide.bin").read_bytes() == fec_mux["obj"]


def test_dabmux_fec_extraction_corrupted(fec_mux):
    """Corrupt MST bytes inside the packet sub-channel of many ETI
    frames; the RS(204,188) layer recovers the MOT object anyway."""
    from dabtools_tpu.eti.parse import EtiParser

    raw = bytearray(fec_mux["eti"].read_bytes())
    frames = list(EtiParser().feed(bytes(raw)))
    frame_len = len(raw) // len(frames)
    s = frames[0].streams[9]
    rng = np.random.default_rng(8)
    # locate the sub-channel bytes inside frame 0 by content search
    pos = bytes(raw[:frame_len]).find(s.data)
    assert pos > 0
    for k in range(len(frames)):
        if k % 3 == 0:                   # corrupt 3 bytes in every 3rd frame
            for i in rng.integers(0, len(s.data), 3):
                raw[k * frame_len + pos + int(i)] ^= 0xFF
    bad = fec_mux["tmp"] / "corrupt.eti"
    bad.write_bytes(bytes(raw))
    outdir = fec_mux["tmp"] / "objs_corrupt"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0xE1C00099", "--objects", str(outdir), str(bad),
         "-o", str(fec_mux["tmp"] / "dg2.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (outdir / "guide.bin").read_bytes() == fec_mux["obj"]
