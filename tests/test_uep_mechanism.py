"""UEP protection: bundled EN 300 401 Table 33 rows + the 4-region
mechanism (registration, puncturing with padding, modulator, FIG 0/1
short form, receiver decode, graceful skip of unavailable rows).

63 of the 64 Table 33 rows are bundled (see tables/puncturing.py for the
offline-reconstruction provenance and validation); the one non-bundled
row (192 kbit/s P2) must degrade gracefully, never crash the stream.
"""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.models.receiver import DabReceiver
from dabtools_tpu.tables import puncturing as P


def test_bundled_table33_rows_consistent():
    """Every bundled row satisfies both standard-derived hard constraints."""
    t31 = {(kb, lv): size for size, lv, kb in P.UEP_TABLE_31}
    assert len(P.UEP_PROFILES) == 63
    for (kb, lv), prof in P.UEP_PROFILES.items():
        assert prof.data_bits == kb * 24, (kb, lv)
        assert prof.tx_bits == t31[(kb, lv)] * 64, (kb, lv)
        # The keep-mask itself must match the declared tx bits.
        assert int(prof.mask().sum()) + prof.padding_bits == prof.tx_bits
    # Exactly one Table 31 row has no profile: 192 kbit/s P2.
    missing = set(t31) - set(P.UEP_PROFILES)
    assert missing == {(192, 2)}
    with pytest.raises(NotImplementedError):
        P.uep_profile(192, 2)


@pytest.fixture
def synthetic_uep_profile():
    # Override the bundled 32 kbit/s P3 row with a synthetic one to prove
    # user registration replaces table data end-to-end; restore after.
    saved = P.UEP_PROFILES.get((32, 3))
    regions = ((3, 8), (6, 6), (12, 4), (3, 2))
    prof = P.PuncturingProfile("probe", regions=regions)
    pad = 24 * C.CU_BITS - prof.tx_bits
    assert pad >= 0
    prof = P.register_uep_profile(32, 3, regions, padding_bits=pad)
    yield prof
    if saved is None:
        del P.UEP_PROFILES[(32, 3)]
    else:
        P.UEP_PROFILES[(32, 3)] = saved


def test_register_validates(synthetic_uep_profile):
    assert synthetic_uep_profile.tx_bits == 24 * C.CU_BITS
    with pytest.raises(ValueError):
        P.register_uep_profile(32, 3, ((24, 24),), padding_bits=0)
    with pytest.raises(ValueError):   # wrong data bits
        P.register_uep_profile(32, 3, ((10, 16),))


def test_uep_subchannel_closed_loop(synthetic_uep_profile):
    from tests.test_closed_loop import modulate

    ens = Ensemble(
        eid=0x0EBB, label="UEP TEST",
        subchannels=(Subchannel.uep(7, 0, table_index=2),))  # 32k P3, idx 2
    assert ens.subchannels[0].size_cus == 24
    x, payload_bytes = modulate(ens, 14, seed=42)
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    got_sub = rx.ensemble.subchannels[0]
    assert got_sub.protection_type == "UEP"
    assert got_sub.uep_table_index == 2
    assert len(eti) > 0
    frames = list(EtiParser().feed(b"".join(eti)))
    a = rx._activation_cif
    for k, f in enumerate(frames):
        assert f.subchannel_data(7) == payload_bytes[7][a + k].tobytes(), k


def test_bundled_uep_row_closed_loop():
    """Real Table 33 data end-to-end: 128 kbit/s P3 (a common radio mux)."""
    from tests.test_closed_loop import modulate

    # UEP_TABLE_31 index 35 = (96 CUs, P3, 128 kbit/s).
    assert P.UEP_TABLE_31[35] == (96, 3, 128)
    ens = Ensemble(
        eid=0x0EBC, label="UEP128",
        subchannels=(Subchannel.uep(3, 0, table_index=35),))
    x, payload_bytes = modulate(ens, 14, seed=5, payload_subchids=(3,))
    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    assert len(eti) > 0
    a = rx._activation_cif
    for k, f in enumerate(EtiParser().feed(b"".join(eti))):
        assert f.subchannel_data(3) == payload_bytes[3][a + k].tobytes(), k


def test_unavailable_uep_subchannel_skipped():
    """A mux signalling the non-bundled 192k P2 row must not crash: the
    EEP sub-channel decodes and the UEP one is dropped from the ETI STC
    (ADVICE r1 medium)."""
    from dabtools_tpu.fic.fig import build_fibs_for_ensemble
    from dabtools_tpu.mod.modulator import Modulator, SubchannelSource

    assert P.UEP_TABLE_31[46] == (168, 2, 192)
    eep = Subchannel.eep(1, 0, 3, "A", 64)
    uep = Subchannel.uep(9, 48, table_index=46)   # 192k P2: unavailable
    assert not uep.decodable and eep.decodable
    ens = Ensemble(
        eid=0x0EBD, label="MIXED",
        subchannels=(eep, uep),
        services=(Service(sid=0x77, components=(
            ServiceComponent(tmid=0, subchid=1),)),))

    # Transmit only the EEP sub-channel's CUs (the UEP region stays
    # empty carriers) but signal BOTH in the FIC, as a real mux would.
    n_frames = 14
    rng = np.random.default_rng(11)
    n_cifs = n_frames * C.MODE_I.n_cifs
    payload = np.unpackbits(rng.integers(0, 256, (n_cifs, eep.data_bytes),
                                         dtype=np.uint8), axis=-1)
    mod = Modulator([SubchannelSource(eep.start_cu, eep.profile)])
    x = mod.frames(n_frames, lambda f: build_fibs_for_ensemble(ens, f),
                   lambda f, i: payload[f * 4:(f + 1) * 4])

    rx = DabReceiver(n_frames=4)
    eti = rx.feed(x)
    assert rx.ensemble is not None
    assert {s.subchid for s in rx.ensemble.subchannels} == {1, 9}
    assert {s.subchid for s in rx._decode.subchannels} == {1}
    assert len(eti) > 0
    payload_bytes = np.packbits(payload, axis=-1)
    a = rx._activation_cif
    for k, f in enumerate(EtiParser().feed(b"".join(eti))):
        assert set(f.streams) == {1}          # UEP subch absent from STC
        assert f.subchannel_data(1) == payload_bytes[a + k].tobytes(), k
