"""MP2 header parsing + stream-health verification (eti/mp2.py,
eti2audio --verify)."""

import json
import subprocess
import sys

import numpy as np

from dabtools_tpu.eti.mp2 import (
    Mp2HealthChecker,
    build_mp2_header,
    parse_mp2_header,
)


def test_header_roundtrip_all_dab_rates():
    for kbps in (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                 320, 384):
        h = parse_mp2_header(build_mp2_header(kbps))
        assert h is not None
        assert (h.version, h.bitrate_kbps, h.sample_rate) == (1, kbps,
                                                              48000)
        assert h.frame_bytes == 3 * kbps      # 24 ms at 48 kHz, no padding
    # MPEG-2 LSF half-rate DAB variant
    h = parse_mp2_header(build_mp2_header(64, sample_rate=24000))
    assert h is not None and h.version == 2 and h.sample_rate == 24000
    # no Layer II index for this rate
    assert build_mp2_header(72) is None


def test_parse_rejects_non_layer2():
    assert parse_mp2_header(b"\x00\x00\x00\x00") is None
    assert parse_mp2_header(b"\xff\xfb\x90\x00") is None    # Layer III
    assert parse_mp2_header(b"\xff\xfd\x00\x00") is None    # free bitrate


def test_health_checker_clean_and_corrupt():
    hdr = build_mp2_header(64)
    frame = bytearray(hdr) + bytes(3 * 64 - 4)
    chk = Mp2HealthChecker()
    for _ in range(20):       # arbitrary chunking must not matter
        chk.feed(bytes(frame[:100]))
        chk.feed(bytes(frame[100:]))
    s = chk.stats
    assert s["frames"] == 20 and s["resyncs"] == 0
    assert s["bitrate_kbps"] == 64 and s["dab_legal"]
    assert "[healthy]" in chk.summary()

    # shred one frame's header: the checker resyncs and keeps counting
    chk2 = Mp2HealthChecker()
    stream = bytes(frame) * 8
    stream = stream[: 3 * 64 * 3] + b"\x00" * 4 + stream[3 * 64 * 3 + 4:]
    chk2.feed(stream)
    assert chk2.stats["frames"] >= 6
    assert chk2.stats["resyncs"] >= 1
    assert "resyncs" in chk2.summary()

    # garbage-only input: no frames, no crash
    chk3 = Mp2HealthChecker()
    chk3.feed(np.random.default_rng(0).integers(
        0, 256, 10_000, dtype=np.uint8).tobytes())
    assert "no MP2 frames" in chk3.summary()


def test_eti2audio_verify_on_dabmux_chain(tmp_path):
    """dabmux filler audio now carries real Layer II framing; --verify
    reports a healthy CBR stream end to end."""
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "VERIFY", "eid": "0x4321",
        "services": [{"sid": "0x7001", "label": "AUD", "type": "mp2",
                      "subch": {"id": 1, "start_cu": 0,
                                "protection": "EEP-3A", "bitrate": 96}}],
        "frames": 20,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sj = tmp_path / "stats.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", str(eti),
         "--verify", "--stats-json", str(sj),
         "-o", str(tmp_path / "out.mp2")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "MP2 health:" in r.stderr and "[healthy]" in r.stderr
    rec = json.loads(sj.read_text())
    # every logical frame is one 3*96-byte MP2 frame; all must parse
    assert rec["mp2_health"]["frames"] == rec["mp2_bytes"] // (3 * 96) > 0
    assert rec["mp2_health"]["bitrate_kbps"] == 96
    assert rec["mp2_health"]["resyncs"] == 0
    assert rec["mp2_health"]["dab_legal"] is True


def test_etiinfo_sniffs_payload_codecs(tmp_path):
    """etiinfo detects MP2 vs DAB+ from the payload itself and flags a
    bitrate mismatch against the FIC-signalled capacity."""
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "SNIFF", "eid": "0x4323",
        "services": [
            {"sid": "0x7001", "label": "AUD", "type": "mp2",
             "subch": {"id": 1, "start_cu": 0,
                       "protection": "EEP-3A", "bitrate": 96}},
            {"sid": "0x7002", "label": "PLUS", "type": "dab+",
             "subch": {"id": 2, "start_cu": 80,
                       "protection": "EEP-3A", "bitrate": 88}},
        ],
        "frames": 16,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sub1 = next(l for l in r.stdout.splitlines() if l.strip()
                .startswith("subch  1"))
    sub2 = next(l for l in r.stdout.splitlines() if l.strip()
                .startswith("subch  2"))
    assert "payload: MP2 96 kbit/s 48 kHz" in sub1 and "MISMATCH" not in sub1
    assert "payload: DAB+ superframes" in sub2

    # signalled-vs-carried mismatch: re-mux subch 1's bytes behind a FIC
    # claiming 96k while the frames carry 64k MP2 headers
    from dabtools_tpu.eti.mp2 import build_mp2_header
    from dabtools_tpu.eti.assemble import EtiAssembler
    from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
    from dabtools_tpu.fic.fig import build_fibs_for_ensemble
    ens = Ensemble(eid=0x4324, label="LIAR",
                   subchannels=(Subchannel.eep(1, 0, 3, "A", 96),),
                   services=(Service(sid=0x7003, label="X", components=(
                       ServiceComponent(tmid=0, subchid=1),)),))
    frame96 = bytearray(np.zeros(3 * 96, np.uint8))
    frame96[:4] = build_mp2_header(64)   # wrong rate for a 96k slot...
    # ...but pad to a full bogus "64k" cadence inside the 96k frame so
    # headers repeat at 192-byte spacing: etiinfo sees valid 64k headers
    frame96[3 * 64: 3 * 64 + 4] = build_mp2_header(64)
    asm = EtiAssembler(ens)
    eti2 = b"".join(
        asm.frame([f.tobytes() for f in build_fibs_for_ensemble(ens, k // 4)
                   [3 * (k % 4): 3 * (k % 4) + 3]],
                  {1: bytes(frame96)})
        for k in range(16))
    (tmp_path / "liar.eti").write_bytes(eti2)
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo",
         str(tmp_path / "liar.eti")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sub1 = next(l for l in r.stdout.splitlines() if l.strip()
                .startswith("subch  1"))
    assert "MISMATCH vs signalled 96" in sub1


def test_health_checker_chunk_boundaries():
    """Byte-dribble feeding (headers straddling chunk boundaries) must
    not fabricate resyncs or drop frames (review r3 finding)."""
    hdr = build_mp2_header(64)
    stream = (bytes(hdr) + bytes(3 * 64 - 4)) * 5
    for step in (1, 2, 3, 5, 7):
        chk = Mp2HealthChecker()
        for i in range(0, len(stream), step):
            chk.feed(stream[i:i + step])
        assert chk.stats["frames"] == 5, (step, chk.stats)
        assert chk.stats["resyncs"] == 0, (step, chk.stats)


def test_etiinfo_sniffs_lsf_half_rate(tmp_path):
    """24 kHz MPEG-2 LSF MP2 spans two logical frames; the sniffer must
    still detect it (review r3 finding)."""
    from dabtools_tpu.eti.assemble import EtiAssembler
    from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
    from dabtools_tpu.fic.fig import build_fibs_for_ensemble
    ens = Ensemble(eid=0x4325, label="LSF",
                   subchannels=(Subchannel.eep(1, 0, 3, "A", 64),),
                   services=(Service(sid=0x7004, label="HALF", components=(
                       ServiceComponent(tmid=0, subchid=1),)),))
    mp2 = bytearray(build_mp2_header(64, sample_rate=24000))
    mp2 += bytes(6 * 64 - 4)          # one 48 ms LSF frame = 2 logical rows
    asm = EtiAssembler(ens)
    eti = b"".join(
        asm.frame([f.tobytes() for f in build_fibs_for_ensemble(ens, k // 4)
                   [3 * (k % 4): 3 * (k % 4) + 3]],
                  {1: bytes(mp2[(k % 2) * 192:(k % 2) * 192 + 192])})
        for k in range(16))
    (tmp_path / "lsf.eti").write_bytes(eti)
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo",
         str(tmp_path / "lsf.eti")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sub1 = next(l for l in r.stdout.splitlines() if l.strip()
                .startswith("subch  1"))
    assert "payload: MP2 64 kbit/s 24 kHz" in sub1 and "LSF" in sub1
    assert "MISMATCH" not in sub1


def test_dabmux_lsf_half_rate_chain(tmp_path):
    """dabmux 'sample_rate': 24000 generates MPEG-2 LSF framing (one
    header per 48 ms frame pair); --verify and the etiinfo sniffer both
    recognize it."""
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "LSFMUX", "eid": "0x4327",
        "services": [{"sid": "0x7006", "label": "HALF", "type": "mp2",
                      "sample_rate": 24000,
                      "subch": {"id": 1, "start_cu": 0,
                                "protection": "EEP-3A", "bitrate": 64}}],
        "frames": 16,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sj = tmp_path / "stats.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", str(eti),
         "--verify", "--stats-json", str(sj),
         "-o", str(tmp_path / "out.mp2")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    rec = json.loads(sj.read_text())
    assert rec["mp2_health"]["sample_rate"] == 24000
    assert rec["mp2_health"]["resyncs"] == 0
    assert rec["mp2_health"]["dab_legal"] is True
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", str(eti)],
        capture_output=True, text=True, timeout=300)
    sub1 = next(l for l in r.stdout.splitlines() if l.strip()
                .startswith("subch  1"))
    assert "24 kHz" in sub1 and "LSF" in sub1 and "MISMATCH" not in sub1


def test_verify_in_all_mode(tmp_path):
    """--all --verify attaches a per-service MP2 health record."""
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "ALLVER", "eid": "0x4328",
        "services": [
            {"sid": "0x7007", "label": "A", "type": "mp2",
             "subch": {"id": 1, "start_cu": 0,
                       "protection": "EEP-3A", "bitrate": 64}},
            {"sid": "0x7008", "label": "B", "type": "mp2",
             "subch": {"id": 2, "start_cu": 48,
                       "protection": "EEP-3A", "bitrate": 96}},
        ],
        "frames": 16,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    sj = tmp_path / "stats.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", str(eti),
         "--all", str(tmp_path / "out"), "--verify",
         "--stats-json", str(sj)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    rec = json.loads(sj.read_text())
    assert rec["services"]["0x7007"]["mp2_health"]["bitrate_kbps"] == 64
    assert rec["services"]["0x7008"]["mp2_health"]["bitrate_kbps"] == 96
    assert all(s["mp2_health"]["resyncs"] == 0
               for s in rec["services"].values())
    assert r.stderr.count("MP2 health:") == 2


def test_etiinfo_json(tmp_path):
    """etiinfo --json: one machine-readable object with transport health,
    full ensemble config, and the payload sniff."""
    cfg = tmp_path / "mux.json"
    cfg.write_text(json.dumps({
        "label": "JSONI", "eid": "0x4329",
        "services": [{"sid": "0x7009", "label": "AUD", "type": "mp2",
                      "subch": {"id": 1, "start_cu": 0,
                                "protection": "EEP-3A", "bitrate": 64}}],
        "frames": 10,
    }))
    eti = tmp_path / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg),
         "-o", str(eti)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", "--json",
         str(eti)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout)
    assert rep["frames"] > 0 and rep["bad_fibs"] == 0
    assert rep["err_bytes"] == {"0xFF": rep["frames"]}
    assert rep["ensemble"]["eid"] == "0x4329"
    assert rep["ensemble"]["label"] == "JSONI"
    assert rep["ensemble"]["subchannels"][0]["bitrate_kbps"] == 64
    assert "MP2 64 kbit/s" in rep["payload_sniff"]["1"]
    # garbage input: clean JSON error object
    (tmp_path / "junk.eti").write_bytes(b"\x00" * 10000)
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", "--json",
         str(tmp_path / "junk.eti")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    assert json.loads(r.stdout)["error"] == "no ETI frames found"
