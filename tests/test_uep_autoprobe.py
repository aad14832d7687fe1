"""Signal-driven identification of missing UEP Table 33 rows (N7 gap).

One Table 33 row — (192 kbit/s, P2) — is not bundled (failed offline
reconstruction, tables/puncturing.py).  `enumerate_uep_candidates`
lists every constraint-satisfying row for such a pair and
`ops.uep_probe.identify_uep_profile` picks the one the broadcast was
actually punctured with, from the signal alone; `DabReceiver` wires
this up end-to-end (`uep_autoprobe`): the sub-channel's PI-independent
half (CU slice + time deinterleave) runs on device while skipped, and
once the row is identified the receiver registers it and
re-specializes.

Reference counterpart: none — upstream hard-codes its tables
(SURVEY.md s2a R14); these tests prove the recovery path instead.
"""

import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Subchannel
from dabtools_tpu.mod.convcode import conv_encode
from dabtools_tpu.models.receiver import DabReceiver
from dabtools_tpu.ops.fec import puncture_mask_for_profile
from dabtools_tpu.ops.uep_probe import identify_uep_profile
from dabtools_tpu.tables import puncturing as P


def _planted_rows(profile, n_rows, rng, noise=0.0):
    """Aligned soft rows (tx_bits incl. padding) punctured with *profile*."""
    mask = puncture_mask_for_profile(profile).astype(bool)
    rows = []
    for _ in range(n_rows):
        bits = rng.integers(0, 2, size=profile.data_bits).astype(np.uint8)
        tx = conv_encode(bits)[mask]
        soft = 1.0 - 2.0 * tx.astype(np.float32)
        if noise:
            soft = soft + rng.normal(0, noise, soft.shape).astype(np.float32)
        rows.append(np.concatenate(
            [soft, np.zeros(profile.padding_bits, np.float32)]))
    return np.stack(rows)


@pytest.fixture
def debundled_32_3():
    """Temporarily remove the bundled (32 kbit/s, P3) row so the probe
    machinery can be exercised at a size that runs fast on CPU."""
    saved = P.UEP_PROFILES.pop((32, 3))
    P.enumerate_uep_candidates.cache_clear()
    yield saved
    P.UEP_PROFILES[(32, 3)] = saved
    P.enumerate_uep_candidates.cache_clear()


class TestEnumerate:
    def test_192_2_candidate_set(self):
        cands = P.enumerate_uep_candidates(192, 2)
        assert 500 < len(cands) < 5000        # tractable, non-trivial
        size = next(sz for sz, lv, kb in P.UEP_TABLE_31
                    if lv == 2 and kb == 192)
        seen = set()
        for c in cands:
            # Hard constraints every real Table 33 row satisfies.
            assert c.data_bits == 192 * 24
            assert c.tx_bits == size * 64
            assert c.padding_bits in (0, 4, 8)
            pis = [pi for _n, pi in c.regions]
            assert pis[0] > pis[1] > pis[2] < pis[3] <= 24
            key = (c.regions, c.padding_bits)
            assert key not in seen
            seen.add(key)

    def test_bundled_pair_rejected(self):
        with pytest.raises(ValueError):
            P.enumerate_uep_candidates(192, 3)

    def test_unknown_pair_rejected(self):
        with pytest.raises(ValueError):
            P.enumerate_uep_candidates(999, 2)

    @staticmethod
    def _conforms(row):
        l1, l2, l3, l4, p1, p2, p3, p4, pad = row
        return (l4 == 3 and p1 > p2 > p3 < p4 <= min(24, p1)
                and pad in (0, 4, 8))

    def test_leave_one_out_calibration(self):
        """De-bundle EVERY template-conforming Table 33 row in turn: the
        enumeration must always contain it.  This is the calibration the
        (192 kbit/s, P2) in-set claim rests on — its 16 family/level
        neighbors all conform to the template."""
        conforming = [k for k, r in P._UEP_TABLE_33.items()
                      if self._conforms(r)]
        assert len(conforming) == 59          # 63 bundled - 4 P4/P5 rows
        assert all(self._conforms(P._UEP_TABLE_33[(192, lv)])
                   for lv in (1, 3, 4, 5))
        missed = []
        for kb, lv in conforming:
            saved = P.UEP_PROFILES.pop((kb, lv))
            P.enumerate_uep_candidates.cache_clear()
            try:
                if not any(c.regions == saved.regions
                           and c.padding_bits == saved.padding_bits
                           for c in P.enumerate_uep_candidates(kb, lv)):
                    missed.append((kb, lv))
            finally:
                P.UEP_PROFILES[(kb, lv)] = saved
                P.enumerate_uep_candidates.cache_clear()
        assert not missed

    def test_all_candidates_constructible(self):
        """Every enumerated profile must build a valid puncture mask
        consistent with its declared tx/data bits."""
        cands = P.enumerate_uep_candidates(192, 2)
        for c in cands[:: max(1, len(cands) // 64)]:
            assert int(c.mask().sum()) + c.padding_bits == c.tx_bits


class TestIdentify:
    def test_identifies_planted_row(self, debundled_32_3):
        cands = P.enumerate_uep_candidates(32, 3)
        truth = next(i for i, c in enumerate(cands)
                     if c.regions == debundled_32_3.regions
                     and c.padding_bits == debundled_32_3.padding_bits)
        rng = np.random.default_rng(1)
        rows = _planted_rows(cands[truth], 4, rng, noise=0.4)
        idx, diag = identify_uep_profile(rows, cands)
        assert idx == truth
        assert diag["per_row_win"] and diag["best_metric"] > 0.9

    def test_rejects_pure_noise(self, debundled_32_3):
        cands = P.enumerate_uep_candidates(32, 3)
        rng = np.random.default_rng(2)
        rows = rng.normal(0, 1.0, (4, cands[0].tx_bits)).astype(np.float32)
        idx, diag = identify_uep_profile(rows, cands)
        assert idx is None
        # NB the max over ~2.8k random alignments of a free Viterbi path
        # correlation is HIGH (~0.85) — the rejection comes from the
        # per-row-win + margin criteria, not the absolute floor.
        assert diag["best_metric"] < 0.92

    def test_rejects_wrong_family_signal(self, debundled_32_3):
        """Rows punctured with a DIFFERENT candidate than the scored set's
        best must not be claimed with high confidence for the wrong one:
        whichever wins must be the one that generated the signal."""
        cands = P.enumerate_uep_candidates(32, 3)
        rng = np.random.default_rng(3)
        rows = _planted_rows(cands[7], 3, rng, noise=0.3)
        idx, _diag = identify_uep_profile(rows, cands)
        assert idx in (7, None)


class TestReceiverAutoprobe:
    def test_e2e_identify_and_decode(self, debundled_32_3):
        """Full loop: modulate with the (de-bundled) true row, feed a
        receiver that does not know it; the autoprobe must identify the
        row from the signal, re-specialize, and decode bit-exactly."""
        from tests.test_closed_loop import modulate

        ens = Ensemble(
            eid=0x4EA7, label="AUTOPROBE",
            subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                         Subchannel.uep(9, 48, table_index=2)))  # 32k P3
        sub = ens.subchannel(9)
        assert sub.protection_type == "UEP" and not sub.decodable

        # Modulation needs the true profile registered; the receiver
        # must then start WITHOUT it.
        P.UEP_PROFILES[(32, 3)] = debundled_32_3
        x, payload = modulate(ens, 22, seed=5)
        del P.UEP_PROFILES[(32, 3)]

        rx = DabReceiver(n_frames=4)
        eti = rx.feed(x)

        # The row was identified from the signal and re-registered.
        assert (32, 3) in P.UEP_PROFILES
        got = P.UEP_PROFILES[(32, 3)]
        assert got.regions == debundled_32_3.regions
        assert got.padding_bits == debundled_32_3.padding_bits

        # Re-specialization must preserve FULL stream continuity: no FCT
        # restart, no CIF gap, the EEP sub-channel bit-exact throughout.
        # Frames emitted BEFORE the identification (streaming: already
        # handed out) carry only the EEP sub; from the moment the UEP
        # sub appears it is bit-exact IMMEDIATELY — the probe ring
        # carried its deinterleave history since activation.
        frames = list(EtiParser().feed(b"".join(eti)))
        assert len(frames) >= 60
        a = rx._activation_cif
        assert frames[0].fct == a % 250
        k0 = next(k for k, f in enumerate(frames) if 9 in f.streams)
        assert k0 <= 2 * 4 * rx.n_frames       # identified within ~2 blocks
        for k, f in enumerate(frames):
            assert f.fct == (a + k) % 250, k       # contiguous, no restart
            assert f.subchannel_data(1) == payload[1][a + k].tobytes(), k
            if k >= k0:
                assert f.subchannel_data(9) == \
                    payload[9][a + k].tobytes(), k


class TestCheckpointPersistence:
    def test_extra_uep_row_survives_checkpoint(self, tmp_path,
                                               debundled_32_3):
        """An autoprobe-identified (or user-registered) UEP row lives in
        process-global state; a checkpoint resumed in a FRESH process
        must carry it, or the sub-channel silently re-probes/skips."""
        from tests.test_closed_loop import modulate

        # The fixture removed (32,3) from UEP_PROFILES; also remove its
        # _UEP_TABLE_33 entry so the row counts as EXTRA (the save path
        # persists only rows the bundled table cannot re-derive).
        saved33 = P._UEP_TABLE_33.pop((32, 3))
        try:
            self._run(tmp_path, debundled_32_3, modulate)
        finally:
            P._UEP_TABLE_33[(32, 3)] = saved33

    @staticmethod
    def _run(tmp_path, debundled_32_3, modulate):
        P.register_uep_profile(32, 3, debundled_32_3.regions,
                               debundled_32_3.padding_bits)
        ens = Ensemble(
            eid=0x4EA8, label="CKPT UEP",
            subchannels=(Subchannel.eep(1, 0, 3, "A", 64),
                         Subchannel.uep(9, 48, table_index=2)))  # 32k P3
        x, payload = modulate(ens, 16, seed=11)
        rx1 = DabReceiver(n_frames=4)
        half = 9 * C.MODE_I.frame_size + 77
        eti = rx1.feed(x[:half])
        path = str(tmp_path / "uep.ckpt.npz")
        rx1.save_checkpoint(path)
        leftover = rx1.pending_samples()

        # Fresh process: the extra (non-bundled) row is gone.
        del P.UEP_PROFILES[(32, 3)]
        rx2 = DabReceiver.load_checkpoint(path, n_frames=4)
        assert (32, 3) in P.UEP_PROFILES     # re-registered from the ckpt
        got = P.UEP_PROFILES[(32, 3)]
        assert got.regions == debundled_32_3.regions
        assert got.padding_bits == debundled_32_3.padding_bits

        eti += rx2.feed(np.concatenate([leftover, x[half:]]))
        frames = list(EtiParser().feed(b"".join(eti)))
        assert len(frames) >= 10
        a = rx1._activation_cif
        for k, f in enumerate(frames):
            assert f.fct == (a + k) % 250, k
            assert f.subchannel_data(1) == payload[1][a + k].tobytes(), k
            assert f.subchannel_data(9) == payload[9][a + k].tobytes(), k
