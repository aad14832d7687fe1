"""etiremux: re-multiplex an ETI stream to a sub-channel subset.

Round-trip property: the kept sub-channels' bytes are verbatim, the
regenerated FIC signals exactly the filtered configuration, and the
output decodes in eti2audio/etiinfo like any first-class mux.
"""

import subprocess
import sys

import numpy as np

from dabtools_tpu import constants as C
from dabtools_tpu.cli.etiremux import filter_ensemble
from dabtools_tpu.eti.assemble import EtiAssembler
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import (
    Ensemble,
    PacketComponent,
    Service,
    ServiceComponent,
    Subchannel,
)
from dabtools_tpu.fic.fig import FigParser, build_fibs_for_ensemble


def _mux(tmp_path, n_cifs=24):
    ens = Ensemble(
        eid=0x8ABC, label="REMUX SRC",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                     Subchannel.eep(5, 48, 2, "B", 64),
                     Subchannel.eep(9, 96, 3, "A", 32)),
        services=(Service(sid=0x71, label="KEEP ME", components=(
                      ServiceComponent(tmid=0, subchid=1),)),
                  Service(sid=0x72, label="ALSO ME", components=(
                      ServiceComponent(tmid=0, subchid=5, ascty=63),)),
                  Service(sid=0x4FFF0073, label="DATA SVC", components=(
                      ServiceComponent(tmid=3, subchid=-1, scid=12),)),),
        packet_components=(PacketComponent(scid=12, subchid=9,
                                           address=3),),
        fec_schemes=((9, 1),),
    )
    rng = np.random.default_rng(31)
    data = {s.subchid: rng.integers(0, 256, (n_cifs, s.data_bytes),
                                    dtype=np.uint8)
            for s in ens.subchannels}
    asm = EtiAssembler(ens)
    eti = bytearray()
    for n in range(n_cifs):
        fibs = [f.tobytes() for f in build_fibs_for_ensemble(ens, n // 4)[
            3 * (n % 4): 3 * (n % 4) + 3]]
        eti += asm.frame(fibs, {sc: data[sc][n].tobytes() for sc in data},
                         error_level=1 if n == 3 else 0)
    src = tmp_path / "src.eti"
    src.write_bytes(bytes(eti))
    return ens, data, src


def _run(src, out, *extra):
    return subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiremux", str(src),
         "-o", str(out), *extra],
        capture_output=True, text=True, timeout=300)


def test_filter_ensemble_projects_services_and_packets():
    src = Ensemble(
        eid=1,
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                     Subchannel.eep(9, 48, 3, "A", 32)),
        services=(Service(sid=0x71, components=(
                      ServiceComponent(tmid=0, subchid=1),)),
                  Service(sid=0x4FFF0073, components=(
                      ServiceComponent(tmid=3, subchid=-1, scid=12),))),
        packet_components=(PacketComponent(scid=12, subchid=9, address=3),),
        fec_schemes=((9, 1),))
    kept = filter_ensemble(src, {1})
    assert [s.subchid for s in kept.subchannels] == [1]
    assert [s.sid for s in kept.services] == [0x71]
    assert not kept.packet_components and not kept.fec_schemes
    kept = filter_ensemble(src, {9})
    assert [s.sid for s in kept.services] == [0x4FFF0073]
    assert kept.packet_components and kept.fec_schemes == ((9, 1),)
    import pytest
    with pytest.raises(ValueError):
        filter_ensemble(src, {1, 42})


def test_etiremux_keep_subset(tmp_path):
    ens, data, src = _mux(tmp_path)
    out = tmp_path / "out.eti"
    r = _run(src, out, "--keep", "1,9")
    assert r.returncode == 0, r.stderr
    assert "keeping 2/3 sub-channels" in r.stderr

    frames = list(EtiParser().feed(out.read_bytes()))
    assert len(frames) == 24
    fig = FigParser()
    for k, f in enumerate(frames):
        # kept bytes verbatim, dropped stream gone
        assert f.subchannel_data(1) == data[1][k].tobytes()
        assert f.subchannel_data(9) == data[9][k].tobytes()
        assert 5 not in f.streams
        # input frame 3's degraded ERR propagates
        assert f.err == (0x7F if k == 3 else 0xFF)
        for i in range(0, len(f.fic), 32):
            fig.feed_fib(f.fic[i:i + 32])
    got = fig.ensemble()
    assert got is not None and got.eid == 0x8ABC
    assert sorted(s.subchid for s in got.subchannels) == [1, 9]
    assert sorted(s.sid for s in got.services) == [0x71, 0x4FFF0073]
    labels = {s.sid: s.label for s in got.services}
    assert labels[0x71].strip() == "KEEP ME"
    # packet transport + FEC signalling carried over for the data service
    assert got.packet_components[0].subchid == 9
    assert got.fec_scheme(9) == 1


def test_etiremux_drop_and_errors(tmp_path):
    ens, data, src = _mux(tmp_path)
    out = tmp_path / "out.eti"
    r = _run(src, out, "--drop", "5,9")
    assert r.returncode == 0, r.stderr
    frames = list(EtiParser().feed(out.read_bytes()))
    assert frames and set(frames[0].streams) == {1}

    # dropping everything is a usage error
    r = _run(src, tmp_path / "x.eti", "--drop", "1,5,9")
    assert r.returncode == 2
    assert "no sub-channels left" in r.stderr
    # keeping an id the mux doesn't have fails loudly
    r = _run(src, tmp_path / "x.eti", "--keep", "1,42")
    assert r.returncode != 0
    assert "42" in r.stderr
