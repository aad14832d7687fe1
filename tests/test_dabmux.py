"""dabmux (config -> ETI): service encoders wired end-to-end, plus the
full lab chain dabmux -> eti2iq -> DabReceiver -> eti2audio."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mux(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dabmux")
    logo = tmp / "logo.png"
    logo.write_bytes(np.random.default_rng(3).integers(
        0, 256, 300, dtype=np.uint8).tobytes())
    cfg = {
        "eid": "0x4D58", "label": "MUX TEST", "time": True,
        "frequency_info": [
            {"id": "0x4D58", "frequencies_hz": [225648000]}],
        "linkage": [
            {"lsn": "0x042", "ids": ["0x1111"], "idlq": 0}],
        "services": [
            {"sid": "0x1111", "label": "POP", "type": "mp2",
             "subch": {"id": 1, "start_cu": 0, "protection": "EEP-3A",
                       "bitrate": 64},
             "source": "prbs", "dls": "dabmux demo",
             "dlplus": {"artist": "dabmux", "title": "demo"},
             "language": 9, "pty": 10,
             "component_label": "POP STEREO", "xpad_label": "POP DLS"},
            {"sid": "0x2222", "label": "NEWSPLUS", "type": "dab+",
             "subch": {"id": 2, "start_cu": 48, "protection": "EEP-3A",
                       "bitrate": 72}, "source": "prbs",
             "dls": "DAB+ news now", "also_in_ensembles": ["0xC0FE"]},
            {"sid": "0xE1C00042", "label": "EPG", "type": "packet",
             "subch": {"id": 3, "start_cu": 102, "protection": "EEP-3A",
                       "bitrate": 32},
             "scid": 7, "address": 33, "objects": [str(logo)]},
        ],
    }
    cfg_path = tmp / "mux.json"
    cfg_path.write_text(json.dumps(cfg))
    eti = tmp / "out.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg_path),
         "--cifs", "60", "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    return {"tmp": tmp, "eti": eti, "logo": logo.read_bytes()}


def test_dabmux_list_and_info(mux):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--list",
         str(mux["eti"])], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "ensemble 0x4D58 'MUX TEST'" in r.stdout
    assert "POP" in r.stdout and "MP2" in r.stdout
    assert "NEWSPLUS" in r.stdout and "DAB+" in r.stdout
    assert "EPG" in r.stdout and "packet +EPG" in r.stdout
    assert "ensemble time 2026-01-01" in r.stdout
    assert "[English]" in r.stdout and "[Pop Music]" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo",
         str(mux["eti"])], capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "PTy Pop Music" in r.stdout and "English" in r.stdout
    assert "linkage set 0x042" in r.stdout and "0x1111" in r.stdout
    assert "service 0x2222 also in ensemble(s): 0xC0FE" in r.stdout
    assert ("frequency info (region 0): DAB ensemble 0x4D58 -> "
            "225.648 MHz") in r.stdout


def test_dabmux_dls_and_dabplus(mux):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", "--labels", str(mux["eti"]),
         "-o", str(mux["tmp"] / "pop.mp2")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "dynamic label: 'dabmux demo'" in r.stderr
    assert "ITEM.ARTIST='dabmux'" in r.stderr      # TS 102 980 DL Plus
    assert "ITEM.TITLE='demo'" in r.stderr
    stats_path = mux["tmp"] / "news_stats.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x2222", "--labels", "--stats-json", str(stats_path),
         str(mux["eti"]), "-o", str(mux["tmp"] / "news.aac")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (mux["tmp"] / "news.aac").stat().st_size > 0
    # DLS rides the DAB+ AU-leading PAD DSE (TS 102 563 s5.4.3)
    assert "dynamic label: 'DAB+ news now'" in r.stderr
    stats = json.loads(stats_path.read_text())
    assert stats["aus"] > 0 and stats["aus_bad"] == 0
    assert stats["dls"]["labels"] > 0
    assert stats["dabplus"]["2"]["rs_failures"] == 0


def test_dabmux_packet_objects(mux):
    outdir = mux["tmp"] / "objs"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0xE1C00042", "--objects", str(outdir), str(mux["eti"]),
         "-o", str(mux["tmp"] / "dg.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (outdir / "logo.png").read_bytes() == mux["logo"]


def test_full_lab_chain(mux):
    """dabmux -> eti2iq -> DabReceiver -> byte-compare against the
    original ETI's sub-channel payloads."""
    from dabtools_tpu.eti.parse import EtiParser
    from dabtools_tpu.models.receiver import DabReceiver

    iq = mux["tmp"] / "chain.cf32"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(mux["eti"]),
         "-o", str(iq)], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    src = list(EtiParser().feed(mux["eti"].read_bytes()))
    rx = DabReceiver(n_frames=4)
    eti2 = rx.feed(np.fromfile(iq, dtype=np.complex64))
    assert rx.ensemble is not None and rx.ensemble.eid == 0x4D58
    got = list(EtiParser().feed(b"".join(eti2)))
    assert len(got) >= 16
    a = rx._activation_cif
    for k, f in enumerate(got):
        for sc in (1, 2, 3):
            assert f.subchannel_data(sc) == src[a + k].subchannel_data(sc), \
                f"subch {sc} CIF {a + k}"


def test_dabmux_mode_ii(tmp_path):
    """--mode II: FIC geometry (1 CIF/frame, 3 FIBs) and ETI framing."""
    cfg = {"eid": "0x4D59", "label": "MODE2", "services": [
        {"sid": "0x1111", "label": "SVC", "type": "mp2",
         "subch": {"id": 1, "start_cu": 0, "protection": "EEP-3A",
                   "bitrate": 64}, "source": "prbs"}]}
    cfg_path = tmp_path / "m2.json"
    cfg_path.write_text(json.dumps(cfg))
    eti = tmp_path / "m2.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dabmux", str(cfg_path),
         "--mode", "II", "--cifs", "12", "-o", str(eti)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--list",
         "--mode", "II", str(eti)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "ensemble 0x4D59 'MODE2'" in r.stdout


def test_dabmux_component_and_xpad_labels(mux):
    """FIG 1/4 + 1/6 flow from the config keys through the ETI FIC to
    etiinfo's display."""
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", str(mux["eti"])],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "'POP STEREO'" in r.stdout                     # FIG 1/4
    assert "AppTy 2: 'POP DLS'" in r.stdout               # FIG 1/6
