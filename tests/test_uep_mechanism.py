"""UEP mechanism end-to-end with a registered synthetic profile.

The real EN 300 401 Table 33 rows are not bundled (offline build); this
proves the whole path — registration, 4-region puncturing with padding,
modulator, FIG 0/1 short form, receiver decode — works once a user
registers the standard's data.
"""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Subchannel
from dabtools_tpu.models.receiver import DabReceiver
from dabtools_tpu.tables import puncturing as P


@pytest.fixture
def synthetic_uep_profile():
    # 32 kbit/s P3 -> Table 31 says 24 CUs = 1536 tx bits.  A plausible
    # 4-region profile: 24 blocks = 768 data bits; kept =
    # 4*(3*16 + 6*14 + 12*12 + 3*10) + 12 = 1236, padded to 1536.
    regions = ((3, 8), (6, 6), (12, 4), (3, 2))
    prof = P.PuncturingProfile("probe", regions=regions)
    pad = 24 * C.CU_BITS - prof.tx_bits
    assert pad >= 0
    prof = P.register_uep_profile(32, 3, regions, padding_bits=pad)
    yield prof
    del P.UEP_PROFILES[(32, 3)]


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
