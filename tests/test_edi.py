"""EDI (TS 102 693) closed-loop tests: ETI -> EDI -> ETI byte identity."""

import subprocess
import sys
import time

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.assemble import EtiAssembler
from dabtools_tpu.eti.edi import (AfParser, EdiReader, EdiWriter, af_packet,
                                  parse_tag_packet, tag_item)
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel


def _ensemble():
    return Ensemble(
        eid=0xED1, label="EDI TEST",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                     Subchannel.eep(5, 48, 2, "B", 96)),
        services=(Service(sid=1, components=(
            ServiceComponent(tmid=0, subchid=1),)),))


def _eti_stream(n_frames=5, tist_start=None):
    ens = _ensemble()
    asm = EtiAssembler(ens, tist_start=tist_start)
    rng = np.random.default_rng(0)
    raw = b""
    for _ in range(n_frames):
        fibs = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
                for _ in range(3)]
        data = {s.subchid: rng.integers(0, 256, s.data_bytes,
                                        dtype=np.uint8).tobytes()
                for s in ens.subchannels}
        raw += asm.frame(fibs, data)
    return raw


def test_af_roundtrip_and_seq():
    parser = AfParser()
    payloads = [b"hello tag payload", b"x" * 1000, b""]
    stream = b"".join(af_packet(p, i) for i, p in enumerate(payloads))
    got = parser.feed(stream)
    assert got == payloads
    assert parser.resyncs == 0 and parser.crc_failures == 0


def test_af_resync_and_crc_reject():
    parser = AfParser()
    good = af_packet(b"payload", 0)
    bad = bytearray(af_packet(b"corrupt me", 1))
    bad[12] ^= 0xFF
    got = parser.feed(b"\x00garbage" + good + bytes(bad)
                      + af_packet(b"after", 2))
    assert got == [b"payload", b"after"]
    assert parser.resyncs >= 1 and parser.crc_failures == 1


def test_tag_packet_roundtrip():
    items = [(b"*ptr", b"DETI\x00\x01\x00\x00"), (b"shrt", b"ab"),
             (b"est\x05", bytes(100))]
    payload = b"".join(tag_item(n, v) for n, v in items) + b"\x00" * 6
    assert parse_tag_packet(payload) == items


@pytest.mark.parametrize("tist_start", [None, 0.25])
def test_eti_edi_eti_byte_identity(tist_start):
    raw = _eti_stream(5, tist_start=tist_start)
    w = EdiWriter()
    edi = b"".join(w.from_eti_bytes(raw))
    r = EdiReader()
    back = b"".join(r.to_eti_bytes(f) for f in r.feed(edi))
    assert back == raw


def test_eti_edi_eti_subchid_order_differs_from_sad_order():
    """MST must be rebuilt in SAD order, not subchid order (ADVICE r1 high).

    Subchid 5 occupies the first CUs and subchid 1 the later ones; sorting
    streams by subchid while keeping the original SADs would swap their
    payload bytes (with all CRCs still passing).
    """
    ens = Ensemble(
        eid=0xED2, label="EDI SWAP",
        subchannels=(Subchannel.eep(5, 0, 3, "A", 64),
                     Subchannel.eep(1, 48, 2, "B", 96)),
        services=(Service(sid=1, components=(
            ServiceComponent(tmid=0, subchid=5),)),))
    asm = EtiAssembler(ens)
    rng = np.random.default_rng(7)
    payloads = {s.subchid: rng.integers(0, 256, s.data_bytes,
                                        dtype=np.uint8).tobytes()
                for s in ens.subchannels}
    fibs = [bytes(32)] * 3
    raw = asm.frame(fibs, payloads)
    r = EdiReader()
    back = b"".join(r.to_eti_bytes(f)
                    for f in r.feed(b"".join(EdiWriter().from_eti_bytes(raw))))
    assert back == raw
    # And independently: each subchannel's bytes land at its own SAD.
    for f in EtiParser().feed(back):
        for subchid, payload in payloads.items():
            assert f.streams[subchid].data == payload


def test_edi_frame_fields():
    raw = _eti_stream(2, tist_start=0.5)
    r = EdiReader()
    frames = r.feed(b"".join(EdiWriter().from_eti_bytes(raw)))
    assert len(frames) == 2
    f = frames[0]
    assert f.mid == 1 and len(f.fic) == 96
    assert sorted(s[0] for s in f.streams) == [1, 5]
    assert f.tist == int(0.5 * 16_384_000)
    assert frames[1].fct == (f.fct + 1) % 250


def test_cli_roundtrip(tmp_path):
    raw = _eti_stream(4)
    eti_in = tmp_path / "in.eti"
    eti_in.write_bytes(raw)
    edi = tmp_path / "out.edi"
    eti_out = tmp_path / "back.eti"
    r1 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2edi", str(eti_in),
         "-o", str(edi)], capture_output=True, text=True, timeout=120)
    assert r1.returncode == 0, r1.stderr
    assert "4 EDI AF packets" in r1.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.edi2eti", str(edi),
         "-o", str(eti_out)], capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0, r2.stderr
    assert eti_out.read_bytes() == raw
    # The regenerated ETI still parses cleanly.
    frames = list(EtiParser().feed(eti_out.read_bytes()))
    assert len(frames) == 4
    assert all(f.header_crc_ok and f.mst_crc_ok for f in frames)


def test_dab2eti_edi_flag(tmp_path):
    """dab2eti --edi emits AF packets; edi2eti recovers matching ETI."""
    import sys as _sys
    import pathlib as _pl
    _sys.path.insert(0, str(_pl.Path(__file__).parent))
    from test_closed_loop import build_ensemble, modulate
    x, _ = modulate(build_ensemble(), 10, seed=0)
    cap = tmp_path / "cap.cf32"
    x.astype(np.complex64).tofile(cap)
    edi = tmp_path / "out.edi"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", "cf32", "--edi", str(cap), "-o", str(edi)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "EDI frames" in r.stderr
    back = tmp_path / "back.eti"
    r2 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.edi2eti", str(edi),
         "-o", str(back)], capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0, r2.stderr
    frames = list(EtiParser().feed(back.read_bytes()))
    assert len(frames) >= 5
    assert all(f.header_crc_ok and f.mst_crc_ok for f in frames)


def test_pft_fragment_roundtrip():
    from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
    af = af_packet(b"payload " * 100, 0)
    frags = pft_fragments(af, seq=1, mtu=100)
    assert len(frags) > 5 and all(len(f) <= 100 for f in frags)
    r = PftReassembler()
    got = []
    for f in frags:
        got += r.feed(f)
    assert got == [af]


def test_pft_out_of_order_and_loss():
    from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
    a = af_packet(b"A" * 300, 0)
    b = af_packet(b"B" * 300, 1)
    fa = pft_fragments(a, seq=10, mtu=120)
    fb = pft_fragments(b, seq=11, mtu=120)
    r = PftReassembler()
    # Packet a loses a fragment; packet b arrives interleaved, reversed.
    stream = fa[:1] + list(reversed(fb)) + fa[2:]
    got = []
    for f in stream:
        got += r.feed(f)
    assert got == [b]
    # Lossy group is evicted once enough newer incomplete groups pend.
    for k in range(12, 24):
        first_frag = pft_fragments(af_packet(b"y" * 300, k), seq=k,
                                   mtu=120)[0]
        got += r.feed(first_frag)
    assert r.dropped_groups >= 1


def test_cli_pft_roundtrip(tmp_path):
    raw = _eti_stream(4)
    eti_in = tmp_path / "in.eti"
    eti_in.write_bytes(raw)
    edi = tmp_path / "out.pft.edi"
    back = tmp_path / "back.eti"
    r1 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2edi", "--pft-mtu",
         "500", str(eti_in), "-o", str(edi)],
        capture_output=True, text=True, timeout=120)
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.edi2eti", str(edi),
         "-o", str(back)], capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0, r2.stderr
    assert back.read_bytes() == raw


class TestPftFec:
    def _af(self, n=5000, seed=3):
        rng = np.random.default_rng(seed)
        return af_packet(rng.integers(0, 256, n, dtype=np.uint8).tobytes(), 7)

    def test_rs_roundtrip_no_loss(self):
        from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
        af = self._af()
        frags = pft_fragments(af, 1, mtu=600, fec=True)
        assert len(frags) > 3
        r = PftReassembler()
        got = r.feed(b"".join(frags))
        assert got == [af]

    @pytest.mark.parametrize("n_lost", [1, 2])
    def test_rs_recovers_lost_fragments(self, n_lost):
        from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
        af = self._af()
        frags = pft_fragments(af, 1, mtu=600, fec=True)
        assert len(frags) > n_lost + 2
        kept = frags[:1] + frags[1 + n_lost:]       # drop middle fragments
        r = PftReassembler()
        got = r.feed(b"".join(kept))
        got += r.flush()                            # closure triggers RS
        assert got == [af]
        assert r.recovered_groups == 1

    def test_rs_gives_up_beyond_budget(self):
        from dabtools_tpu.eti.edi import PFT_PARITY, PftReassembler, pft_fragments
        af = self._af(20000)
        frags = pft_fragments(af, 1, mtu=300, fec=True)
        # drop enough fragments to exceed 48 erased columns
        n_cols_per_frag = -(-(207 + PFT_PARITY) // len(frags))
        n_drop = PFT_PARITY // n_cols_per_frag + 2
        r = PftReassembler()
        got = r.feed(b"".join(frags[n_drop:])) + r.flush()
        assert got == [] and r.dropped_groups == 1

    def test_rs_loss_then_next_group_closes_previous(self):
        from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
        af1, af2 = self._af(seed=1), self._af(seed=2)
        f1 = pft_fragments(af1, 1, mtu=600, fec=True)
        f2 = pft_fragments(af2, 2, mtu=600, fec=True)
        r = PftReassembler(max_pending=0)           # immediate closure
        got = r.feed(b"".join(f1[:-1])) + r.feed(b"".join(f2))
        assert af1 in got and af2 in got

    def test_addressing_filter(self):
        from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
        af = self._af(2000)
        frags = pft_fragments(af, 5, mtu=600, addr=(0x1234, 0xBEEF))
        assert PftReassembler(dest=0xBEEF).feed(b"".join(frags)) == [af]
        assert PftReassembler(dest=0x0001).feed(b"".join(frags)) == []
        assert PftReassembler().feed(b"".join(frags)) == [af]  # no filter

    def test_fec_plus_addressing(self):
        from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
        af = self._af(4000)
        frags = pft_fragments(af, 9, mtu=500, fec=True, addr=(1, 2))
        r = PftReassembler(dest=2)
        got = r.feed(b"".join(frags[:2] + frags[3:])) + r.flush()
        assert got == [af] and r.recovered_groups == 1


def test_rs_erasure_correct_unit():
    from dabtools_tpu.utils.gf256 import rs_erasure_correct, rs_parity
    rng = np.random.default_rng(0)
    k, p, c = 50, 48, 4
    data = rng.integers(0, 256, (c, k), dtype=np.uint8)
    cw = np.concatenate([data, rs_parity(data, p)], axis=1)
    # erase the maximum correctable number of columns
    pos = rng.choice(k + p, size=p, replace=False)
    corrupted = cw.copy()
    corrupted[:, pos] = rng.integers(0, 256, (c, p), dtype=np.uint8)
    fixed, ok = rs_erasure_correct(corrupted, pos, p)
    assert ok and (fixed == cw).all()
    # one more than correctable fails cleanly
    _, ok2 = rs_erasure_correct(corrupted, list(pos) + [
        int(next(i for i in range(k + p) if i not in set(pos)))], p)
    assert not ok2


def test_cli_pft_fec_survives_fragment_loss(tmp_path):
    """eti2edi --pft-fec stream with dropped fragments -> edi2eti recovers
    every ETI frame through the RS erasure path (exit log reports it)."""
    from dabtools_tpu.eti.edi import PFT_SYNC
    from dabtools_tpu.utils.crc import crc16_ccitt

    raw = _eti_stream(4)
    eti_in = tmp_path / "in.eti"
    eti_in.write_bytes(raw)
    edi = tmp_path / "out.fec.edi"
    back = tmp_path / "back.eti"
    r1 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2edi", "--pft-fec",
         "--pft-mtu", "400", "--pft-addr", "0x1:0xBEEF",
         str(eti_in), "-o", str(edi)],
        capture_output=True, text=True, timeout=120)
    assert r1.returncode == 0, r1.stderr

    # Drop the second fragment of every PFT group (parse via header plen).
    blob = edi.read_bytes()
    frags, pos = [], 0
    while pos < len(blob):
        assert blob[pos:pos + 2] == PFT_SYNC
        flags = int.from_bytes(blob[pos + 10:pos + 12], "big")
        hlen = 12 + (2 if flags & 0x8000 else 0) + (4 if flags & 0x4000 else 0)
        assert crc16_ccitt(blob[pos:pos + hlen]) == int.from_bytes(
            blob[pos + hlen:pos + hlen + 2], "big")
        end = pos + hlen + 2 + (flags & 0x3FFF)
        frags.append(blob[pos:end])
        pos = end
    kept = [f for f in frags if int.from_bytes(f[4:7], "big") != 1]
    assert len(kept) < len(frags)
    (tmp_path / "lossy.edi").write_bytes(b"".join(kept))

    r2 = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.edi2eti", "--pft-dest",
         "0xBEEF", str(tmp_path / "lossy.edi"), "-o", str(back)],
        capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0, r2.stderr
    assert back.read_bytes() == raw
    assert "recovered=" in r2.stderr


def test_cli_udp_transport_roundtrip(tmp_path):
    """eti2edi -> UDP datagrams (one PFT fragment each, with FEC) ->
    edi2eti listener reconstructs the ETI byte stream, surviving a
    dropped datagram (simulated by a lossy local relay)."""
    import socket
    import threading

    raw = _eti_stream(4)
    eti_in = tmp_path / "in.eti"
    eti_in.write_bytes(raw)
    back = tmp_path / "back.eti"

    # pick a free port for the listener
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    listener = subprocess.Popen(
        [sys.executable, "-m", "dabtools_tpu.cli.edi2eti",
         f"udp://127.0.0.1:{port}", "--udp-idle", "3", "-o", str(back)],
        stderr=subprocess.PIPE, text=True)
    try:
        # Wait until the listener has actually bound the port (a fixed
        # sleep flakes under load: the child's imports can take >1 s).
        # /proc/net/udp lists bound sockets as :PORT_HEX.
        needle = f":{port:04X}"
        for _ in range(300):
            if needle in open("/proc/net/udp").read():
                break
            time.sleep(0.1)
        else:
            raise AssertionError("listener never bound the UDP port")
        r1 = subprocess.run(
            [sys.executable, "-m", "dabtools_tpu.cli.eti2edi", "--pft-fec",
             "--pft-mtu", "500", str(eti_in), "-o",
             f"udp://127.0.0.1:{port}"],
            capture_output=True, text=True, timeout=60)
        assert r1.returncode == 0, r1.stderr
        err = listener.communicate(timeout=30)[1]
    finally:
        if listener.poll() is None:
            listener.kill()
    assert listener.returncode == 0, err
    assert back.read_bytes() == raw


def test_pft_fcount_zero_datagram_is_rejected():
    """A craftable header with Fcount=0 (valid HCRC) must not crash the
    network-facing reassembler (was: ZeroDivisionError at group close)."""
    from dabtools_tpu.eti.edi import PftReassembler
    from dabtools_tpu.utils.crc import crc16_ccitt
    head = (b"PF" + (5).to_bytes(2, "big") + (0).to_bytes(3, "big")
            + (0).to_bytes(3, "big")                 # Fcount = 0
            + (0x8000 | 4).to_bytes(2, "big")        # FEC flag, Plen=4
            + bytes([48, 0]))                        # RSk, RSz
    frag = head + crc16_ccitt(head).to_bytes(2, "big") + b"XXXX"
    r = PftReassembler()
    assert r.feed(frag) == []
    assert r.feed(frag) == []            # repeat: still no crash
    got = r.flush()                      # and closing all groups is safe
    assert got == []


def test_pft_late_recovery_not_emitted_out_of_order():
    """A group completing after newer groups were delivered is dropped
    (ETI consumers check FCT continuity), not emitted ~N frames late."""
    from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
    a = af_packet(b"A" * 300, 0)
    b = af_packet(b"B" * 300, 1)
    fa = pft_fragments(a, seq=10, mtu=120)
    fb = pft_fragments(b, seq=11, mtu=120)
    r = PftReassembler()
    got = []
    for f in fa[:-1]:                    # group 10 missing its tail
        got += r.feed(f)
    for f in fb:                         # group 11 completes and emits
        got += r.feed(f)
    assert got == [b]
    got += r.feed(fa[-1])                # 10's tail arrives too late
    assert got == [b]
    assert r.late_dropped >= 1


def test_pft_stale_fragment_does_not_evict_newer_groups():
    """A stale (older-pseq) fragment arriving while newer groups are
    filling must evict the STALE group, not cascade-evict the newer ones
    (wraparound-signed age, not unsigned distance)."""
    from dabtools_tpu.eti.edi import PftReassembler, pft_fragments
    packets = {k: af_packet(bytes([65 + k]) * 300, k) for k in (5, 6, 7)}
    frags = {k: pft_fragments(packets[k], seq=k, mtu=200) for k in packets}
    assert all(len(f) == 2 for f in frags.values())
    r = PftReassembler(max_pending=2)
    got = []
    for k in (5, 6, 7):              # first fragments, in order
        got += r.feed(frags[k][0])
    for k in (5, 6, 7):              # completing fragments, in order
        got += r.feed(frags[k][1])
    # group 5 was evicted by the pending cap; 6 and 7 must both survive
    # the stale re-arrival of 5's second fragment
    assert got == [packets[6], packets[7]]


def test_edi_reader_recomputes_sads_for_gapped_muxes():
    """Third-party EDI may carry SAD values with gaps; the rebuilt ETI
    must address streams where they are actually placed."""
    from dabtools_tpu.eti.edi import EdiFrame
    from dabtools_tpu.eti.parse import EtiParser
    r = EdiReader()
    fic = bytes(96)
    frame = EdiFrame(fct=0, fp=0, mid=1, err=0xFF, fic=fic,
                     streams=[(3, 40, 0x23, b"B" * 32),   # gap before SAD 40
                              (1, 12, 0x23, b"A" * 64)],
                     tist=None)
    eti = r.to_eti_bytes(frame)
    (parsed,) = EtiParser().feed(eti)
    assert parsed.header_crc_ok and parsed.mst_crc_ok
    assert parsed.subchannel_data(1) == b"A" * 64
    assert parsed.subchannel_data(3) == b"B" * 32
    # contiguous placement after the FIC, in original SAD order
    assert parsed.streams[1].sad_words == 96 // 8
    assert parsed.streams[3].sad_words == 96 // 8 + 64 // 8


def test_edi_reader_rejects_oversized_frame():
    from dabtools_tpu.eti.edi import EdiFrame
    r = EdiReader()
    frame = EdiFrame(fct=0, fp=0, mid=1, err=0xFF, fic=bytes(96),
                     streams=[(1, 12, 0x23, b"X" * 8000)], tist=None)
    with pytest.raises(ValueError, match="overflow"):
        r.to_eti_bytes(frame)


def test_eti_parser_quarantines_corrupt_header():
    """A frame whose FC is corrupted (header CRC fails) must surface as
    data-less, not as garbage stream slices."""
    from dabtools_tpu.fic.config import Ensemble, Subchannel
    ens = Ensemble(eid=1, label="X",
                   subchannels=(Subchannel.eep(1, 0, 3, "A", 64),))
    asm = EtiAssembler(ens)
    fib = b"\xff" + bytes(29)
    from dabtools_tpu.utils.crc import crc16_ccitt
    fib += crc16_ccitt(fib).to_bytes(2, "big")
    good = asm.frame([fib] * 3, {1: bytes(192)})
    bad = bytearray(good)
    bad[5] ^= 0x55                       # corrupt FICF/NST field
    from dabtools_tpu.eti.parse import EtiParser
    frames = list(EtiParser().feed(bytes(bad) + good))
    assert len(frames) == 2
    assert not frames[0].header_crc_ok and frames[0].streams == {}
    assert frames[1].header_crc_ok and 1 in frames[1].streams


@pytest.mark.parametrize("pft", [False, True])
def test_eti2audio_accepts_edi_input(tmp_path, pft):
    """eti2audio auto-detects EDI input (AF or PFT framing) and extracts
    the same audio bytes as from the equivalent ETI file."""
    import json
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "EDIIN", "eid": "0x4326",
        "services": [{"sid": "0x7005", "label": "AUD", "type": "mp2",
                      "subch": {"id": 1, "start_cu": 0,
                                "protection": "EEP-3A", "bitrate": 64}}],
        "frames": 10,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    edi = tmp_path / "mux.edi"
    cmd = [sys.executable, "-m", "dabtools_tpu.cli.eti2edi", str(eti),
           "-o", str(edi)]
    if pft:
        cmd[4:4] = ["--pft-mtu", "600"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    def extract(path, out):
        r = subprocess.run(
            [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
             str(path), "-o", str(out)],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        return r.stderr

    extract(eti, tmp_path / "ref.mp2")
    err = extract(edi, tmp_path / "edi.mp2")
    assert "EDI input detected" in err
    ref = (tmp_path / "ref.mp2").read_bytes()
    assert ref and (tmp_path / "edi.mp2").read_bytes() == ref


def test_sniff_rejects_eti_tapped_midframe():
    """A live ETI pipe tapped mid-frame whose first two bytes happen to
    be 'AF' or 'PF' must NOT be routed through the EDI transcoder
    (ADVICE r3): the validated-header sniff falls back to the raw path
    and the ETI parser resyncs normally."""
    import io

    from dabtools_tpu.eti.edi import _sniff_edi, iter_eti_chunks
    from dabtools_tpu.eti.parse import EtiParser

    raw = _eti_stream(4)
    # find a frame byte position where inserting a fake prefix yields
    # 'AF'/'PF' leading bytes: just prepend them to a mid-frame tap
    for prefix in (b"AF", b"PF"):
        tapped = prefix + raw[100:]      # mid-frame tap, bogus sync bytes
        assert not _sniff_edi(tapped[: 1 << 20])
        chunks = list(iter_eti_chunks(io.BytesIO(tapped)))
        assert b"".join(chunks) == tapped          # passed through raw
        frames = list(EtiParser().feed(b"".join(chunks)))
        assert len(frames) == 3                     # parser resynced

    # and a REAL EDI stream still sniffs as EDI
    edi = b"".join(EdiWriter().from_eti_bytes(raw))
    assert _sniff_edi(edi[: 1 << 20])
    out = b"".join(iter_eti_chunks(io.BytesIO(edi)))
    assert len(out) % 6144 == 0 and out            # transcoded back to ETI


def test_sniff_survives_corrupted_first_packet():
    """A 1-byte corruption in the FIRST AF packet must not misroute the
    whole EDI stream down the raw path (review r4: the de-framers resync
    past a bad packet and recover the rest; the raw path loses all of
    it).  The sniff scans for any other CRC-valid packet."""
    import io

    from dabtools_tpu.eti.edi import _sniff_edi, iter_eti_chunks
    from dabtools_tpu.eti.parse import EtiParser

    raw = _eti_stream(4)
    edi = bytearray(b"".join(EdiWriter().from_eti_bytes(raw)))
    edi[40] ^= 0xFF                      # corrupt first packet's payload
    assert _sniff_edi(bytes(edi)[: 1 << 20])
    out = b"".join(iter_eti_chunks(io.BytesIO(bytes(edi))))
    frames = list(EtiParser().feed(out))
    assert len(frames) >= 3              # later packets recovered

    # PFT framing: corrupt the first fragment's header CRC
    from dabtools_tpu.eti.edi import pft_fragments
    afs = EdiWriter().from_eti_bytes(raw)
    frags = [b for i, af in enumerate(afs)
             for b in pft_fragments(af, seq=i, mtu=600)]
    edi_pft = bytearray(b"".join(frags))
    edi_pft[12] ^= 0xFF
    assert _sniff_edi(bytes(edi_pft)[: 1 << 20])
