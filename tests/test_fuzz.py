"""Fuzz the byte-level parsers: arbitrary garbage must never raise
(SURVEY.md s5.3 — degrade to counters, keep the stream alive)."""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.fig import FigParser
from dabtools_tpu.eti.dabplus import SuperframeDecoder
from dabtools_tpu.utils.crc import crc16_ccitt


def test_fig_parser_survives_random_fibs():
    rng = np.random.default_rng(0)
    p = FigParser()
    for _ in range(300):
        data = rng.integers(0, 256, 30, dtype=np.uint8).tobytes()
        fib = data + crc16_ccitt(data).to_bytes(2, "big")  # CRC-valid junk
        p.feed_fib(fib)                                    # must not raise
    # and raw junk with bad CRCs
    for _ in range(100):
        p.feed_fib(rng.integers(0, 256, 32, dtype=np.uint8).tobytes())
    assert p.fibs_bad == 100
    # whatever it extracted, building the ensemble must not raise either
    p.ensemble()


def test_eti_parser_survives_garbage_and_truncation():
    rng = np.random.default_rng(1)
    p = EtiParser()
    # random garbage in random chunk sizes
    blob = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    i = 0
    while i < len(blob):
        n = int(rng.integers(1, 9000))
        list(p.feed(blob[i:i + n]))
        i += n
    # frames with FSYNC but corrupt interiors
    junk = bytearray(rng.integers(0, 256, C.ETI_FRAME_BYTES, dtype=np.uint8))
    junk[1:4] = C.ETI_FSYNC.to_bytes(3, "big")
    for f in EtiParser().feed(bytes(junk) * 3):
        assert not (f.header_crc_ok and f.mst_crc_ok) or True


def test_superframe_decoder_survives_garbage():
    rng = np.random.default_rng(2)
    d = SuperframeDecoder(64)
    for _ in range(25):
        frame = rng.integers(0, 256, 192, dtype=np.uint8).tobytes()
        d.feed(frame)                                      # must not raise
    assert d.stats["superframes"] >= 0


def test_eti2audio_handles_garbage_file(tmp_path):
    import subprocess
    import sys
    p = tmp_path / "garbage.eti"
    p.write_bytes(np.random.default_rng(3).integers(
        0, 256, 50_000, dtype=np.uint8).tobytes())
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", str(p)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1                               # clean failure
    assert "Traceback" not in r.stderr


def test_af_parser_survives_garbage():
    """EDI AF de-framer: random bytes and truncated packets never raise."""
    import numpy as np
    from dabtools_tpu.eti.edi import AfParser, af_packet
    rng = np.random.default_rng(3)
    p = AfParser()
    for _ in range(20):
        p.feed(rng.integers(0, 256, rng.integers(1, 400),
                            dtype=np.uint8).tobytes())
    # Embedded valid packet still found after arbitrary garbage.
    got = p.feed(b"\x00AF\x00" + af_packet(b"ok", 7))
    assert b"ok" in got


def test_edi_reader_survives_garbage_tags():
    import numpy as np
    from dabtools_tpu.eti.edi import EdiReader, af_packet, tag_item
    rng = np.random.default_rng(4)
    r = EdiReader()
    # Valid AF framing around nonsense TAG contents.
    for i in range(10):
        junk = rng.integers(0, 256, rng.integers(0, 60),
                            dtype=np.uint8).tobytes()
        payload = tag_item(b"zzzz", junk)
        assert r.feed(af_packet(payload, i)) == []


def test_mot_decoder_survives_garbage():
    import numpy as np
    from dabtools_tpu.eti.mot import APP_DGLI, APP_MOT_CONT, APP_MOT_START, MotDecoder
    rng = np.random.default_rng(5)
    dec = MotDecoder()
    for _ in range(100):
        app = int(rng.choice([APP_DGLI, APP_MOT_START, APP_MOT_CONT]))
        data = rng.integers(0, 256, rng.integers(1, 48),
                            dtype=np.uint8).tobytes()
        dec.feed(app, data)
    dec.flush()
    assert dec.stats["objects"] == 0


def test_pad_decoder_survives_random_frames():
    import numpy as np
    from dabtools_tpu.eti.pad import PadDecoder
    rng = np.random.default_rng(6)
    dec = PadDecoder(mot=True)
    for _ in range(50):
        frame = rng.integers(0, 256, 192, dtype=np.uint8).tobytes()
        dec.feed_mp2_frame(frame)
        dec.feed_dabplus_au(rng.integers(0, 256, 60,
                                         dtype=np.uint8).tobytes())
    dec.flush()


def test_packet_decoder_survives_garbage():
    from dabtools_tpu.eti.packet import PacketDecoder

    rng = np.random.default_rng(13)
    dec = PacketDecoder()
    for _ in range(40):
        dec.feed(rng.integers(0, 256, rng.integers(1, 3000),
                              dtype=np.uint8).tobytes())
    # decoder state stays bounded and sane under pure noise
    assert dec.stats["crc_failures"] > 0
    assert len(dec._asm) <= 1024


def test_pft_reassembler_survives_garbage():
    from dabtools_tpu.eti.edi import PftReassembler

    rng = np.random.default_rng(14)
    r = PftReassembler()
    for _ in range(40):
        blob = bytearray(rng.integers(0, 256, 2000, dtype=np.uint8)
                         .tobytes())
        blob[:2] = b"PF"               # force sync-hunting into headers
        r.feed(bytes(blob))
    r.flush()


def test_fig_parser_survives_targeted_new_extensions():
    """FIG type 0 ext in {5, 6, 14, 17, 21, 24} with random bodies:
    the session's new parsers must degrade, never raise."""
    rng = np.random.default_rng(7)
    p = FigParser()
    for ext in (5, 6, 14, 17, 21, 24):
        for _ in range(80):
            n = int(rng.integers(1, 28))
            body = bytearray(rng.integers(0, 256, n, dtype=np.uint8))
            body[0] = (body[0] & 0xE0) | ext     # force the extension
            fig = bytes([0x00 | (n & 0x1F)]) + bytes(body)
            data = (fig + b"\xff").ljust(30, b"\x00")[:30]
            p.feed_fib(data + crc16_ccitt(data).to_bytes(2, "big"))
    p.ensemble()                                  # must not raise either


def test_fec_decoder_survives_garbage_then_recovers():
    """Garbage into the packet-FEC decoder must not raise, and a valid
    stream arriving afterwards must still sync and decode."""
    from dabtools_tpu.eti.packet import PacketEncoder
    from dabtools_tpu.eti.pfec import FecDecoder, FecEncoder

    rng = np.random.default_rng(8)
    dec = FecDecoder()
    for _ in range(20):
        dec.feed(rng.integers(0, 256, int(rng.integers(1, 4000)),
                              dtype=np.uint8).tobytes())
    # now a clean FEC stream: the decoder must resync onto it
    groups = [rng.integers(0, 256, 150, dtype=np.uint8).tobytes()
              for _ in range(40)]
    pe = PacketEncoder(address=9, packet_size=96)
    for g in groups:
        pe.add_data_group(g)
    enc = FecEncoder()
    while (pkt := pe.take_packet()) is not None:
        enc.add_packet(pkt)
    enc.flush()
    stream = bytearray()
    while enc.pending_bytes:
        stream += enc.take_frame(24 * 12)
    got = [dg for a, dg in dec.feed(bytes(stream)) if a == 9]
    sent = set(groups)
    assert all(dg in sent for dg in got)
    assert len(got) >= len(groups) // 2


def test_etiremux_survives_garbage_and_corruption(tmp_path):
    import subprocess
    import sys

    # pure garbage: clean exit 1, no traceback
    p = tmp_path / "garbage.eti"
    p.write_bytes(np.random.default_rng(5).integers(
        0, 256, 50_000, dtype=np.uint8).tobytes())
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiremux", str(p),
         "--keep", "1", "-o", str(tmp_path / "x.eti")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "Traceback" not in r.stderr

    # a real mux with bytes shredded mid-stream: parser resyncs, the
    # remux keeps going, output parses
    from tests.test_etiremux import _mux
    _, data, src = _mux(tmp_path)
    raw = bytearray(src.read_bytes())
    raw[6144 * 5 + 100: 6144 * 5 + 400] = b"\x55" * 300
    (tmp_path / "shredded.eti").write_bytes(bytes(raw))
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiremux",
         str(tmp_path / "shredded.eti"), "--keep", "1",
         "-o", str(tmp_path / "y.eti")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "Traceback" not in r.stderr
    from dabtools_tpu.eti.parse import EtiParser
    frames = list(EtiParser().feed((tmp_path / "y.eti").read_bytes()))
    assert len(frames) >= 20
    ok = sum(f.subchannel_data(1) in
             {data[1][n].tobytes() for n in range(24)} for f in frames)
    assert ok >= len(frames) - 2      # at most the shredded frame(s) lost
