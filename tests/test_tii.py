"""TII closed-loop tests: modulator null-symbol insertion <-> detector.

The reference has no TII handling; positions are a reconstruction
(docs/INTEROP.md row 17), but the pattern codec and the detector
mechanics are position-agnostic.
"""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.fic.fig import build_fibs_for_ensemble
from dabtools_tpu.mod.modulator import Modulator, SubchannelSource
from dabtools_tpu.models.receiver import DabReceiver
from dabtools_tpu.ops.tii import (
    N_PATTERNS, detect_tii_block, groups_pattern, pattern_groups,
    tii_carrier_pairs, tii_null_symbol)


def test_pattern_codec_roundtrip():
    seen = set()
    for p in range(N_PATTERNS):
        g = pattern_groups(p)
        assert len(g) == 4 and len(set(g)) == 4
        assert groups_pattern(g) == p
        seen.add(g)
    assert len(seen) == N_PATTERNS


def test_carrier_pairs_disjoint_and_in_band():
    k = tii_carrier_pairs()
    half = C.MODE_I.n_carriers // 2
    assert k.min() >= -half and k.max() + 1 <= half
    flat = np.concatenate([k.reshape(-1), k.reshape(-1) + 1])
    assert 0 not in flat                       # DC never used
    assert len(set(flat.tolist())) == flat.size


def _ensemble():
    return Ensemble(
        eid=0x7111, label="TII TEST",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),),
        services=(Service(sid=1, components=(
            ServiceComponent(tmid=0, subchid=1),)),))


def _modulate(ens, n_frames, tii, seed=0, tii_amp=0.5):
    rng = np.random.default_rng(seed)
    sub = ens.subchannels[0]
    mod = Modulator([SubchannelSource(0, sub.profile)], tii=tii,
                    tii_amp=tii_amp)
    payload = np.unpackbits(
        rng.integers(0, 256, size=(n_frames * 4, sub.data_bytes),
                     dtype=np.uint8), axis=-1)
    return mod.frames(n_frames, lambda f: build_fibs_for_ensemble(ens, f),
                      lambda f, i: payload[f * 4:(f + 1) * 4])


@pytest.mark.parametrize("c,p", [(0, 0), (23, 69), (7, 31)])
def test_detect_clean(c, p):
    x = _modulate(_ensemble(), 3, tii=(c, p))
    det = detect_tii_block(x[: 3 * C.MODE_I.frame_size], n_frames=2)
    assert det is not None
    assert (det.sub_id, det.main_id) == (c, p)
    assert det.snr > 10


def test_detect_noisy():
    from dabtools_tpu.mod.impairments import awgn
    x = _modulate(_ensemble(), 5, tii=(11, 42))
    x = awgn(x, snr_db=8.0, rng=np.random.default_rng(1))
    det = detect_tii_block(x[: 5 * C.MODE_I.frame_size], n_frames=4)
    assert det is not None and (det.sub_id, det.main_id) == (11, 42)


def test_no_tii_rejected():
    x = _modulate(_ensemble(), 3, tii=None)
    det = detect_tii_block(x[: 3 * C.MODE_I.frame_size], n_frames=2)
    assert det is None


def test_receiver_integration_and_fic_unharmed():
    """TII in the null symbol must not break sync/FIC; DabReceiver(tii=True)
    accumulates across blocks and reports the transmitter."""
    ens = _ensemble()
    x = _modulate(ens, 10, tii=(5, 17))
    rx = DabReceiver(n_frames=4, tii=True)
    eti = rx.feed(x)
    assert rx.ensemble is not None and rx.ensemble.eid == 0x7111
    assert len(eti) > 0
    det = rx.tii()
    assert det is not None
    assert (det.sub_id, det.main_id) == (5, 17)


def test_receiver_tii_disabled_returns_none():
    rx = DabReceiver(n_frames=4)
    assert rx.tii() is None
