"""eti2iq (ETI -> modulated IQ): the transmit direction closes the loop —
receiving eti2iq's output reproduces the original ETI's payload bytes."""

import subprocess
import sys

import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.eti.assemble import EtiAssembler
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.fic.fig import build_fibs_for_ensemble
from dabtools_tpu.models.receiver import DabReceiver


def _mux(tmp_path, n_cifs=48):
    ens = Ensemble(
        eid=0x7E57, label="ETI2IQ",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                     Subchannel.eep(5, 48, 2, "B", 64)),
        services=(Service(sid=0x71, label="S1", components=(
                      ServiceComponent(tmid=0, subchid=1),)),
                  Service(sid=0x72, label="S2", components=(
                      ServiceComponent(tmid=0, subchid=5),))),
    )
    rng = np.random.default_rng(12)
    data = {s.subchid: rng.integers(0, 256, (n_cifs, s.data_bytes),
                                    dtype=np.uint8)
            for s in ens.subchannels}
    asm = EtiAssembler(ens)
    eti = bytearray()
    for n in range(n_cifs):
        fibs = [f.tobytes() for f in build_fibs_for_ensemble(ens, n // 4)[
            3 * (n % 4): 3 * (n % 4) + 3]]
        eti += asm.frame(fibs, {sc: data[sc][n].tobytes()
                                for sc in data})
    src = tmp_path / "src.eti"
    src.write_bytes(bytes(eti))
    return ens, data, src


def test_eti2iq_closed_loop(tmp_path):
    ens, data, src = _mux(tmp_path)
    iq = tmp_path / "out.cf32"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(src),
         "-o", str(iq)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "modulating Mode I, 2 sub-channels" in r.stderr
    assert "from 12 transmission frames" in r.stderr

    x = np.fromfile(iq, dtype=np.complex64)
    assert x.size == 12 * C.MODE_I.frame_size

    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None and rx.ensemble.eid == ens.eid
    # 12 tx frames: 2 receiver blocks of 4 (plus buffered slack) = 32
    # CIFs, minus 15 deinterleaver-priming CIFs -> 17 ETI frames.
    frames = list(EtiParser().feed(b"".join(eti)))
    assert len(frames) >= 16
    a = rx._activation_cif
    for k, f in enumerate(frames):
        for sc in (1, 5):
            assert f.subchannel_data(sc) == data[sc][a + k].tobytes(), \
                f"subch {sc} CIF {a + k}"


def test_eti2iq_u8_and_impairments(tmp_path):
    ens, data, src = _mux(tmp_path, n_cifs=40)
    iq = tmp_path / "out.u8"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(src),
         "--format", "u8", "--snr", "20", "--cfo-hz", "250",
         "--timing-offset", "999", "-o", str(iq)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    u8 = np.fromfile(iq, dtype=np.uint8)
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(u8)
    assert rx.ensemble is not None
    assert len(eti) > 0
    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    for k, f in enumerate(frames):
        assert f.subchannel_data(1) == data[1][a + k].tobytes(), k


def test_eti2iq_multipath_sfn(tmp_path):
    """TU6 urban multipath with 8 Hz fading PLUS an SFN echo at 120 us
    (inside the Mode I guard) via the CLI: payload still bit-exact."""
    ens, data, src = _mux(tmp_path, n_cifs=40)
    iq = tmp_path / "out.cf32"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(src),
         "--multipath", "tu6", "--doppler-hz", "8",
         "--echo-us", "120", "--echo-db", "-4", "--snr", "26",
         "-o", str(iq)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "channel: 7 taps, 8 Hz Doppler" in r.stderr
    x = np.fromfile(iq, dtype=np.complex64)
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    frames = list(EtiParser().feed(b"".join(eti)))
    assert len(frames) >= 16
    a = rx._activation_cif
    for k, f in enumerate(frames):
        for sc in (1, 5):
            assert f.subchannel_data(sc) == data[sc][a + k].tobytes(), \
                f"subch {sc} CIF {a + k}"


def test_eti2iq_rejects_bad_channel_args(tmp_path):
    """CLI usage errors instead of tracebacks / silent no-ops (ADVICE r2):
    malformed --multipath taps, negative delays, and fading qualifiers
    without any channel all exit with argparse's code 2."""
    ens, data, src = _mux(tmp_path, n_cifs=4)

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "dabtools_tpu.cli.eti2iq", str(src),
             "-o", str(tmp_path / "x.cf32"), *extra],
            capture_output=True, text=True, timeout=120)

    for argv, hint in [
        (["--multipath", "1.0"], "--multipath"),          # no colon
        (["--multipath", "a:b"], "--multipath"),          # non-numeric
        (["--multipath=-2:0"], "negative"),               # negative delay
        (["--doppler-hz", "10"], "--doppler-hz"),         # no channel
        (["--echo-db", "-6"], "--echo-db"),               # no --echo-us
        (["--echo-us", "-5"], "--echo-us"),               # negative echo
    ]:
        r = run(*argv)
        assert r.returncode == 2, (argv, r.returncode, r.stderr)
        assert hint in r.stderr, (argv, r.stderr)
