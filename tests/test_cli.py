"""End-to-end CLI tests: IQ capture file -> dab2eti -> eti2audio, driven
through the real command-line surface (subprocess)."""

import subprocess
import sys

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.dabplus import SuperframeBuilder
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.fic.fig import build_fibs_for_ensemble
from dabtools_tpu.mod.modulator import Modulator, SubchannelSource


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Modulate an ensemble with one MP2 and one DAB+ service."""
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    ens = Ensemble(
        eid=0xC0DE,
        label="CLI TEST",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),      # MP2, 48 CUs
                     Subchannel.eep(2, 48, 3, "B", 64)),    # DAB+, 18 CUs
        services=(
            Service(sid=0x1111, label="MP2 SVC", components=(
                ServiceComponent(tmid=0, subchid=1, ascty=0),)),
            Service(sid=0x2222, label="AAC SVC", components=(
                ServiceComponent(tmid=0, subchid=2, ascty=63),)),
        ),
    )
    n_frames = 14
    n_cifs = n_frames * 4

    from dabtools_tpu.eti.pad import (APP_DLS_START, attach_pad_mp2,
                                      build_xpad, dls_data_groups,
                                      wrap_pad_dse)

    # MP2 rows: random audio bytes + a DLS group in each frame's X-PAD.
    mp2_groups = dls_data_groups("Now Playing: CLI TEST", toggle=0)
    mp2 = rng.integers(0, 256, size=(n_cifs, 192), dtype=np.uint8)
    for i in range(n_cifs):
        row = bytearray(mp2[i].tobytes())
        xpad, fpad = build_xpad(
            [(APP_DLS_START, mp2_groups[i % len(mp2_groups)])])
        attach_pad_mp2(row, xpad, fpad)
        mp2[i] = np.frombuffer(bytes(row), dtype=np.uint8)

    # DAB+ AUs: first AU of each superframe starts with a PAD DSE.
    aac_groups = dls_data_groups("DAB+ LABEL", toggle=1)
    sb = SuperframeBuilder(64)
    sf_aus, dabplus_frames = [], []
    for k in range(n_cifs // 5 + 1):
        sizes = sb.au_sizes()
        xpad, fpad = build_xpad(
            [(APP_DLS_START, aac_groups[k % len(aac_groups)])])
        dse = wrap_pad_dse(xpad, fpad)
        aus = [dse + rng.integers(
                   0, 256, size=sizes[0] - len(dse), dtype=np.uint8).tobytes()]
        aus += [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
                for n in sizes[1:]]
        sf_aus.append(aus)
        dabplus_frames.extend(sb.build(aus))
    dabplus = np.stack(dabplus_frames[:n_cifs])

    subs = [SubchannelSource(0, ens.subchannels[0].profile),
            SubchannelSource(48, ens.subchannels[1].profile)]
    mod = Modulator(subs)

    def payload(f, i):
        rows = mp2 if i == 0 else dabplus
        return np.unpackbits(rows[f * 4:(f + 1) * 4], axis=-1)

    x = mod.frames(n_frames, lambda f: build_fibs_for_ensemble(ens, f),
                   payload)
    cap = tmp / "capture.cf32"
    x.astype(np.complex64).tofile(cap)
    return {"path": cap, "tmp": tmp, "mp2": mp2, "sf_aus": sf_aus,
            "ens": ens}


@pytest.fixture(scope="module")
def eti_file(capture):
    out = capture["tmp"] / "out.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", "cf32", str(capture["path"]), "-o", str(out),
         "--frames-per-block", "4", "--stats"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "ensemble 0xC0DE" in r.stderr
    assert out.stat().st_size % C.ETI_FRAME_BYTES == 0
    return out


def test_dab2eti_produces_eti(eti_file, capture):
    from dabtools_tpu.eti.parse import EtiParser
    frames = list(EtiParser().feed(eti_file.read_bytes()))
    # 14 modulated frames = 56 CIFs; acquisition consumes 16, priming 15,
    # and the last partial block is retained -> 17 emitted is nominal.
    assert len(frames) >= 16
    assert all(f.header_crc_ok and f.mst_crc_ok for f in frames)
    # both sub-channels present
    assert set(frames[0].streams) == {1, 2}


def test_eti2audio_mp2(eti_file, capture):
    out = capture["tmp"] / "audio.mp2"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", str(eti_file), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "sub-channel 1 (DAB/MP2)" in r.stderr
    got = out.read_bytes()
    # the output is a contiguous slice of the transmitted MP2 stream
    full = capture["mp2"].reshape(-1).tobytes()
    assert len(got) >= 16 * 192
    assert got in full


def test_eti2audio_dabplus(eti_file, capture):
    out = capture["tmp"] / "audio.aac"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x2222", str(eti_file), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "(DAB+)" in r.stderr
    got = out.read_bytes()
    all_aus = b"".join(b"".join(aus) for aus in capture["sf_aus"])
    assert len(got) > 0
    assert got in all_aus


def test_eti2audio_adts(eti_file, capture):
    out = capture["tmp"] / "audio.adts"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x2222", "--adts", str(eti_file), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    got = out.read_bytes()
    assert got[:2] == b"\xff\xf1"     # ADTS syncword


def test_eti2audio_mp2_labels(eti_file, capture):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", "--labels", str(eti_file),
         "-o", str(capture["tmp"] / "lbl.mp2")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "dynamic label: 'Now Playing: CLI TEST'" in r.stderr


def test_eti2audio_dabplus_labels(eti_file, capture):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x2222", "--labels", str(eti_file),
         "-o", str(capture["tmp"] / "lbl.aac")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "dynamic label: 'DAB+ LABEL'" in r.stderr


def test_eti2audio_unknown_service(eti_file):
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x9999", str(eti_file)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "not found" in r.stderr


def test_eti2audio_list(eti_file, tmp_path):
    stats = tmp_path / "list.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--list",
         "--stats-json", str(stats), str(eti_file)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "ensemble 0xC0DE 'CLI TEST'" in r.stdout
    assert "0x1111" in r.stdout and "MP2" in r.stdout
    assert "0x2222" in r.stdout and "DAB+" in r.stdout
    import json
    rec = json.loads(stats.read_text())     # --stats-json works in --list
    assert rec["ensemble"] == "0xC0DE" and rec["frames"] >= 16
    assert set(rec["services"]) == {"0x1111", "0x2222"}


def test_eti2audio_all_services(eti_file, capture, tmp_path):
    """--all extracts every service in one pass: MP2 bytes and AAC AUs
    land in per-service files."""
    outdir = tmp_path / "mux"
    stats = tmp_path / "all.json"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--all", str(outdir), "--stats-json", str(stats), str(eti_file)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    mp2 = (outdir / "0x1111_MP2_SVC.mp2").read_bytes()
    assert len(mp2) >= 16 * 192
    assert mp2 in capture["mp2"].reshape(-1).tobytes()
    aac = (outdir / "0x2222_AAC_SVC.aac").read_bytes()
    all_aus = b"".join(b"".join(aus) for aus in capture["sf_aus"])
    assert len(aac) > 0 and aac in all_aus
    import json
    rec = json.loads(stats.read_text())      # --stats-json works in --all
    assert rec["services"]["0x1111"] == {"kind": "mp2", "count": len(mp2)}
    assert rec["services"]["0x2222"]["kind"] == "dab+"


def test_decode_iq_tolerates_truncated_captures():
    """A trailing partial sample (interrupted SDR recording) is dropped,
    not a crash, for every wire format."""
    from dabtools_tpu.cli.dab2eti import _FORMATS, decode_iq
    for fmt, itemsize in _FORMATS.items():
        raw = bytes(range(3 * itemsize))
        whole = decode_iq(raw, fmt)
        for cut in range(1, itemsize):
            got = decode_iq(raw[:-cut], fmt)
            assert len(got) == len(whole) - (1 if fmt != "u8" else 2)
            np.testing.assert_array_equal(got, whole[:len(got)])


def test_eti2audio_subch_sniffs_dabplus(eti_file, capture):
    """--subch on a DAB+ sub-channel without --dabplus: the audio type is
    sniffed from FIG 0/2 (was: resolved as MP2 before services arrived
    and the stream written as raw superframe bytes)."""
    out = capture["tmp"] / "sniff.aac"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--subch", "2", str(eti_file), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    got = out.read_bytes()
    all_aus = b"".join(b"".join(aus) for aus in capture["sf_aus"])
    assert len(got) > 0 and got in all_aus


def test_eti2audio_subch_without_mci_emits_everything(tmp_path):
    """--subch on a stream with no parseable MCI: resolution defaults to
    MP2 after a bounded wait and the WHOLE stream is emitted."""
    from dabtools_tpu.eti.assemble import EtiAssembler
    from dabtools_tpu.fic.config import Ensemble as Ens, Subchannel as Sub

    ens = Ens(eid=1, subchannels=(Sub.eep(1, 0, 3, "A", 64),))
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, (80, 192), dtype=np.uint8)
    asm = EtiAssembler(ens)
    empty_fib = b"\xff" + b"\x00" * 29          # end marker, no FIGs
    from dabtools_tpu.utils.crc import crc16_ccitt
    empty_fib += crc16_ccitt(empty_fib).to_bytes(2, "big")
    eti = b"".join(asm.frame([empty_fib] * 3, {1: data[n].tobytes()})
                   for n in range(80))
    src = tmp_path / "nomci.eti"
    src.write_bytes(eti)
    out = tmp_path / "all.mp2"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--subch", "1", str(src), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data.reshape(-1).tobytes()


@pytest.mark.parametrize("fmt", ["s16", "s8"])
def test_dab2eti_sdr_integer_formats(fmt, capture):
    """s16 (Airspy/SDRplay) and s8 (HackRF) interleaved captures decode
    like cf32 through the CLI."""
    x = np.fromfile(capture["path"], dtype=np.complex64)
    x = x / (np.abs(x).max() * 1.05)       # headroom before quantizing
    inter = np.empty(2 * x.size, dtype=np.float32)
    inter[0::2], inter[1::2] = x.real, x.imag
    if fmt == "s16":
        raw = np.round(inter * 32768).clip(-32768, 32767).astype("<i2")
    else:
        raw = np.round(inter * 128).clip(-128, 127).astype(np.int8)
    cap = capture["tmp"] / f"capture.{fmt}"
    raw.tofile(cap)
    out = capture["tmp"] / f"out_{fmt}.eti"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.dab2eti", "--cpu",
         "--format", fmt, str(cap), "-o", str(out),
         "--frames-per-block", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "ensemble 0xC0DE" in r.stderr
    from dabtools_tpu.eti.parse import EtiParser
    frames = list(EtiParser().feed(out.read_bytes()))
    # s8 quantization is ~48 dB SNR: the convolutional code wipes it out
    assert len(frames) >= 16
    assert all(f.header_crc_ok and f.mst_crc_ok for f in frames)
