"""Announcement support/switching (EN 300 401 s8.1.6, FIG 0/18 + 0/19):
parser state machine and eti2audio --follow-announcements switching."""

import subprocess
import sys

import numpy as np

from dabtools_tpu.eti.assemble import EtiAssembler
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.fic.fig import (
    FigParser,
    build_fibs_for_ensemble,
    fig_0_18,
    fig_0_19,
)


def _ens():
    return Ensemble(
        eid=0x4A4A, label="ANN TEST",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                     Subchannel.eep(3, 48, 3, "A", 64)),
        services=(
            Service(sid=0x1111, label="MAIN", components=(
                ServiceComponent(tmid=0, subchid=1),)),
            Service(sid=0x3333, label="TRAFFIC", components=(
                ServiceComponent(tmid=0, subchid=3),)),
        ),
    )


def test_fig_announcement_state_machine():
    ens = _ens()
    p = FigParser()
    sup = fig_0_18(0x1111, asu_flags=0x0002, clusters=(5, 9))
    for f in range(2):
        for fib in build_fibs_for_ensemble(ens, f, extra_figs=(sup,)):
            p.feed_fib(fib.tobytes())
    assert p.figs_malformed == 0
    assert p.announce_support[0x1111] == (0x0002, (5, 9))
    assert p.announcement_for(0x1111) is None

    # switching ON: cluster 5, traffic flag, to sub-channel 3
    for fib in build_fibs_for_ensemble(
            ens, 2, extra_figs=(sup, fig_0_19(5, 0x0002, 3))):
        p.feed_fib(fib.tobytes())
    assert p.announcement_for(0x1111) == (0x0002, 3)
    # a non-matching flag type does not trigger a switch
    assert p.announcement_for(0x3333) is None

    # flags that the service does not support are ignored
    for fib in build_fibs_for_ensemble(
            ens, 3, extra_figs=(sup, fig_0_19(9, 0x0010, 3))):
        p.feed_fib(fib.tobytes())
    assert p.announcement_for(0x1111) == (0x0002, 3)   # still cluster 5

    # switching OFF: ASw = 0 clears the cluster
    for fib in build_fibs_for_ensemble(
            ens, 4, extra_figs=(sup, fig_0_19(5, 0, 3),
                                fig_0_19(9, 0, 3))):
        p.feed_fib(fib.tobytes())
    assert p.announcement_for(0x1111) is None


def test_eti2audio_follows_announcements(tmp_path):
    """During CIFs 16..31 cluster 5 signals a traffic announcement on
    sub-channel 3: the output must carry subch 3 bytes there and subch 1
    bytes elsewhere."""
    ens = _ens()
    rng = np.random.default_rng(6)
    n_cifs = 48
    data = {sc: rng.integers(0, 256, (n_cifs, 192), dtype=np.uint8)
            for sc in (1, 3)}
    sup = fig_0_18(0x1111, asu_flags=0x0002, clusters=(5,))
    asm = EtiAssembler(ens)
    eti = bytearray()
    for n in range(n_cifs):
        extra = [sup]
        if 16 <= n < 32:
            extra.append(fig_0_19(5, 0x0002, 3))
        elif n >= 32:
            extra.append(fig_0_19(5, 0, 3))
        fibs = [f.tobytes() for f in build_fibs_for_ensemble(
            ens, n // 4, extra_figs=tuple(extra))[3 * (n % 4): 3 * (n % 4) + 3]]
        eti += asm.frame(fibs, {sc: data[sc][n].tobytes() for sc in (1, 3)})
    src = tmp_path / "ann.eti"
    src.write_bytes(bytes(eti))

    out = tmp_path / "out.mp2"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", "--follow-announcements", str(src),
         "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "announcement active: switching to sub-channel 3" in r.stderr
    assert "announcement ended: back to sub-channel 1" in r.stderr

    got = out.read_bytes()
    expect = b"".join(
        data[3 if 16 <= n < 32 else 1][n].tobytes() for n in range(n_cifs))
    assert got == expect

    # without the flag: pure subch 1 stream
    out2 = tmp_path / "plain.mp2"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio",
         "--sid", "0x1111", str(src), "-o", str(out2)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert out2.read_bytes() == b"".join(
        data[1][n].tobytes() for n in range(n_cifs))


def test_fig_0_7_configuration_info(tmp_path):
    """FIG 0/7 round trip + etiinfo display."""
    ens = _ens()
    p = FigParser()
    for fib in build_fibs_for_ensemble(ens, 0, config_count=5):
        p.feed_fib(fib.tobytes())
    assert p.figs_malformed == 0
    assert (p.n_services_signalled, p.config_count) == (2, 5)

    asm = EtiAssembler(ens)
    rng = np.random.default_rng(1)
    eti = b"".join(asm.frame(
        [f.tobytes() for f in build_fibs_for_ensemble(
            ens, n // 4, config_count=5)[3 * (n % 4): 3 * (n % 4) + 3]],
        {sc: rng.integers(0, 256, 192, dtype=np.uint8).tobytes()
         for sc in (1, 3)}) for n in range(8))
    src = tmp_path / "c.eti"
    src.write_bytes(eti)
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.etiinfo", str(src)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "configuration 5, 2 services" in r.stdout
