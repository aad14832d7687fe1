"""The everything-mux: one ensemble exercising the whole feature matrix
at once, through the impaired RF chain.

dabmux (MP2 + DLS + DL Plus, DAB+, FEC packet MOT, language/PTy,
linkage, frequency info, OE services, time) -> eti2iq with AWGN + CFO
-> DabReceiver -> eti2audio / etiinfo.  A feature that works alone but
breaks in combination (FIB budget pressure, FIG rotation, multiple
decoders per frame) shows up here and nowhere else.
"""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def everything(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("everything")
    obj = tmp / "epg.bin"
    obj.write_bytes(np.random.default_rng(42).integers(
        0, 256, 700, dtype=np.uint8).tobytes())
    cfg = {
        "eid": "0xE7E7", "label": "EVERYTHING", "time": True,
        "frequency_info": [
            {"id": "0xE7E7", "frequencies_hz": [225648000]}],
        "linkage": [{"lsn": "0x0AA", "ids": ["0x1111"], "idlq": 0}],
        "services": [
            {"sid": "0x1111", "label": "POPPLUS", "type": "mp2",
             "subch": {"id": 1, "start_cu": 0, "protection": "EEP-3A",
                       "bitrate": 64},
             "source": "prbs", "dls": "Blur - Song 2",
             "dlplus": {"artist": "Blur", "title": "Song 2"},
             "language": 9, "pty": 10,
             "also_in_ensembles": ["0xBEEF"]},
            {"sid": "0x2222", "label": "NEWSAAC", "type": "dab+",
             "subch": {"id": 2, "start_cu": 48, "protection": "EEP-3A",
                       "bitrate": 72}, "source": "prbs"},
            {"sid": "0xE1C00077", "label": "EPGDATA", "type": "packet",
             "subch": {"id": 3, "start_cu": 102, "protection": "EEP-3A",
                       "bitrate": 32},
             "scid": 5, "address": 17, "objects": [str(obj)],
             "fec": True, "language": 8},
        ],
    }
    cfg_path = tmp / "mux.json"
    cfg_path.write_text(json.dumps(cfg))
    eti = tmp / "mux.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg_path),
         "--cifs", "100", "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    # RF chain inside the fixture so every test (under -k selection or
    # xdist distribution alike) gets the off-air artifacts.
    from dabtools_tpu.mod.impairments import awgn, carrier_offset
    from dabtools_tpu.models.receiver import DabReceiver

    iq = tmp / "mux.cf32"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(eti),
         "-o", str(iq)], capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    x = np.fromfile(iq, dtype=np.complex64)
    rng = np.random.default_rng(3)
    x = carrier_offset(awgn(x, 16.0, rng), 420.0)
    rx = DabReceiver(n_frames=4)
    eti2 = rx.feed(x)
    offair = tmp / "offair.eti"
    offair.write_bytes(b"".join(eti2))
    return {"tmp": tmp, "eti": eti, "obj": obj.read_bytes(), "rx": rx,
            "offair": offair}


def test_everything_over_impaired_rf(everything):
    """Full chain with AWGN + CFO: every payload bit-exact off air."""
    from dabtools_tpu.eti.parse import EtiParser

    rx = everything["rx"]
    assert rx.ensemble is not None and rx.ensemble.eid == 0xE7E7
    assert rx.ensemble.fec_scheme(3) == 1          # FIG 0/14 came through
    src = list(EtiParser().feed(everything["eti"].read_bytes()))
    got = list(EtiParser().feed(everything["offair"].read_bytes()))
    assert len(got) >= 60, len(got)
    a = rx._activation_cif
    for k, f in enumerate(got):
        assert f.header_crc_ok and f.mst_crc_ok
        for sc in (1, 2, 3):
            assert f.subchannel_data(sc) == src[a + k].subchannel_data(sc), \
                f"subch {sc} frame {k}"


def test_everything_cli_extraction(everything):
    """eti2audio --all on the OFF-AIR ETI: audio files + the FEC-protected
    MOT object; DL Plus tags decode from the MP2 service."""
    offair = everything["offair"]
    outdir = everything["tmp"] / "all"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--all",
         str(outdir), str(offair)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    files = {p.name: p for p in outdir.rglob("*") if p.is_file()}
    assert any(n.endswith(".mp2") for n in files), files.keys()
    assert any(n.endswith(".aac") for n in files), files.keys()
    assert files["epg.bin"].read_bytes() == everything["obj"]

    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", "--labels", str(offair),
         "-o", str(everything["tmp"] / "pop.mp2")],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "dynamic label: 'Blur - Song 2'" in r.stderr
    assert "ITEM.ARTIST='Blur'" in r.stderr


def test_everything_metadata_display(everything):
    """etiinfo on the off-air ETI shows the full metadata set."""
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo",
         str(everything["offair"])],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "PTy Pop Music" in out and "English" in out and "German" in out
    assert "linkage set 0x0AA" in out
    assert "DAB ensemble 0xE7E7 -> 225.648 MHz" in out
    assert "service 0x1111 also in ensemble(s): 0xBEEF" in out
    assert "FEC RS(204,188)" in out
    assert "time 2026-01-01" in out
