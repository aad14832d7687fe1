"""Full-capacity Mode I mux closed loop: the flagship 9x128 kbit/s
ensemble (864/864 CUs occupied) decodes bit-exact end to end — the maximal
single-ensemble configuration and exactly what bench.py measures."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.models.receiver import DabReceiver

from tests.test_closed_loop import modulate


def test_flagship_full_mux_closed_loop():
    from __graft_entry__ import _flagship_ensemble
    ens = _flagship_ensemble()
    assert sum(s.size_cus for s in ens.subchannels) == 864  # CIF full
    n_frames = 12
    x, payload_bytes = modulate(ens, n_frames, seed=123)

    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    assert rx.ensemble.subchannels == ens.subchannels
    assert len(rx.ensemble.services) == 9
    assert len(eti) >= 8

    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    for k, f in enumerate(frames):
        assert f.header_crc_ok and f.mst_crc_ok
        assert set(f.streams) == set(range(9))
        for sc in range(9):
            assert f.subchannel_data(sc) == \
                payload_bytes[sc][a + k].tobytes(), (k, sc)
