import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.tables import puncturing as P
from dabtools_tpu.tables.freq_interleave import (
    carrier_bins_in_order,
    freq_interleave_map,
)
from dabtools_tpu.tables.prs import prs_carriers, prs_spectrum, prs_time
from dabtools_tpu.tables.time_interleave import DELAYS, RX_DELAYS


class TestPuncturing:
    def test_pi_vector_weights(self):
        for pi in range(1, 25):
            v = P.pi_vector(pi)
            assert v.size == 32
            assert v.sum() == 8 + pi
            # g1 output of every input bit always kept
            assert (v[0::4] == 1).all()

    def test_pi_vectors_nested(self):
        # PI_{i+1} keeps a superset of PI_i's bits.
        for pi in range(1, 24):
            lo, hi = P.pi_vector(pi), P.pi_vector(pi + 1)
            assert ((hi - lo) >= 0).all()

    def test_fic_profile(self):
        prof = P.FIC_PROFILE
        assert prof.data_bits == 768
        assert prof.mother_bits == 3096
        assert prof.tx_bits == 2304
        mask = P.fic_puncture_mask()
        assert mask.size == 3096 and mask.sum() == 2304

    @pytest.mark.parametrize("level,option,rate", [
        (1, "A", 1 / 4), (2, "A", 3 / 8), (3, "A", 1 / 2), (4, "A", 3 / 4),
        (1, "B", 4 / 9), (2, "B", 4 / 7), (3, "B", 4 / 6), (4, "B", 4 / 5),
    ])
    def test_eep_rates(self, level, option, rate):
        unit = P.EEP_KBPS_PER_N[option]
        for n in (1, 2, 3, 8):
            kbps = unit * n
            if option == "A" and level == 2 and n == 1:
                pass  # the standard's exception case, still must hold rate
            prof = P.eep_profile(level, option, kbps)
            assert prof.data_bits == kbps * 24
            # tx bits == CU-aligned size from the standard's CU tables
            cus = P.eep_subchannel_cus(level, option, kbps)
            assert prof.tx_bits == cus * C.CU_BITS
            # exact identity: tx_bits * rate == data_bits (tail puncturing
            # is arranged by the standard to make this come out exact)
            assert abs(prof.tx_bits * rate - prof.data_bits) < 1e-6

    def test_eep_mask_matches_counts(self):
        prof = P.eep_profile(3, "A", 64)
        mask = prof.mask()
        assert mask.sum() == prof.tx_bits
        assert mask.size == prof.mother_bits

    def test_uep_table31_shape(self):
        assert len(P.UEP_TABLE_31) == 64
        for size, level, kbps in P.UEP_TABLE_31:
            assert 1 <= level <= 5
            assert 16 <= size <= 416
            assert kbps in (32, 48, 56, 64, 80, 96, 112, 128,
                            160, 192, 224, 256, 320, 384)

    def test_uep_profile_gap_is_loud(self):
        # The one Table 33 row that failed offline reconstruction
        # validation; everything else is bundled (test_uep_mechanism).
        with pytest.raises(NotImplementedError):
            P.uep_profile(192, 2)
        assert P.uep_profile(128, 3) is not None

    def test_synthetic_four_region_profile(self):
        # UEP mechanism: 4 regions with distinct PIs.
        prof = P.PuncturingProfile(
            "synthetic", regions=((4, 24), (10, 14), (4, 8), (2, 3)))
        mask = prof.mask()
        assert mask.size == prof.mother_bits
        assert mask.sum() == prof.tx_bits - prof.padding_bits


class TestFreqInterleave:
    def test_mode1_permutation(self):
        m = freq_interleave_map(C.MODE_I)
        assert m.shape == (1536,)
        assert len(set(m.tolist())) == 1536
        # all bins inside [256, 1792] excluding DC bin 1024 -> as FFT bins,
        # k=R-1024 in [-768,768]\{0}, bin = k mod 2048
        k = ((m.astype(int) + 1024) % 2048) - 1024
        assert k.min() == -768 and k.max() == 768
        assert 0 not in k.tolist()

    def test_matches_carrier_set(self):
        m = set(freq_interleave_map(C.MODE_I).tolist())
        natural = set(carrier_bins_in_order(C.MODE_I).tolist())
        assert m == natural


class TestPRS:
    def test_unit_magnitude_qpsk_phases(self):
        z = prs_carriers(C.MODE_I)
        assert z.shape == (1536,)
        np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-6)
        phases = np.angle(z) / (np.pi / 2)
        np.testing.assert_allclose(phases, np.round(phases), atol=1e-5)

    def test_spectrum_occupancy(self):
        spec = prs_spectrum(C.MODE_I)
        assert (spec[0] == 0) and (spec[1024] == 0)
        assert np.count_nonzero(spec) == 1536

    def test_time_domain_power(self):
        t = prs_time(C.MODE_I)
        assert t.shape == (2048,)
        # Parseval: sum |T|^2 = sum |F|^2 / N
        np.testing.assert_allclose(
            np.sum(np.abs(t) ** 2), 1536 / 2048, rtol=1e-5)

    @pytest.mark.parametrize(
        "mode", [C.MODE_I, C.MODE_II, C.MODE_III, C.MODE_IV],
        ids=["I", "II", "III", "IV"])
    def test_group_table_structure(self, mode):
        """EN 300 401 Tables 44-47 structural invariants shared by all
        four modes: 32-carrier groups tile [-K/2,-1] and [1,K/2]; the i
        column cycles 0,1,2,3 ascending over negative k and descends
        3,2,1,0 (mod 4) over positive k; n in 0..3."""
        from dabtools_tpu.tables.prs import _mode_groups
        groups = _mode_groups(mode)
        half = mode.n_carriers // 2
        neg = [g for g in groups if g[0] < 0]
        pos = [g for g in groups if g[0] > 0]
        assert [g[0] for g in neg] == list(range(-half, 0, 32))
        assert [g[0] for g in pos] == list(range(1, half, 32))
        assert [g[1] for g in neg] == [j % 4 for j in range(len(neg))]
        i0 = pos[0][1]
        assert [g[1] for g in pos] == [(i0 - j) % 4 for j in range(len(pos))]
        assert all(0 <= g[2] <= 3 for g in groups)

    @pytest.mark.parametrize(
        "mode", [C.MODE_II, C.MODE_III, C.MODE_IV], ids=["II", "III", "IV"])
    def test_modes_234_full_occupancy(self, mode):
        z = prs_carriers(mode)
        assert z.shape == (mode.n_carriers,)
        np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-6)
        phases = np.angle(z) / (np.pi / 2)
        np.testing.assert_allclose(phases, np.round(phases), atol=1e-5)


class TestTimeInterleave:
    def test_delays_are_bitrev(self):
        assert DELAYS.tolist() == [0, 8, 4, 12, 2, 10, 6, 14,
                                   1, 9, 5, 13, 3, 11, 7, 15]
        assert (DELAYS + RX_DELAYS == 15).all()
        assert sorted(DELAYS.tolist()) == list(range(16))


class TestFreqInterleaveOtherModes:
    @pytest.mark.parametrize("mode", [C.MODE_II, C.MODE_III, C.MODE_IV])
    def test_generalized_rule_yields_carrier_count(self, mode):
        """R(i) = (13 R + T_u/4 - 1) mod T_u keeping [T_u/8, 7T_u/8]\\{DC}
        must yield exactly K carriers for every transmission mode."""
        m = freq_interleave_map(mode)
        assert m.shape == (mode.n_carriers,)
        assert len(set(m.tolist())) == mode.n_carriers
        k = ((m.astype(int) + mode.fft_size // 2) % mode.fft_size
             - mode.fft_size // 2)
        assert k.min() == -mode.n_carriers // 2
        assert k.max() == mode.n_carriers // 2
        assert 0 not in k.tolist()
