"""Pallas Viterbi kernel vs the XLA reference (interpret mode; hermetic).

The compiled-TPU path is exercised by bench.py on the real chip; these
tests pin the kernel's semantics (bit-identical decisions and metrics).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dabtools_tpu.mod.convcode import conv_encode
from dabtools_tpu.ops.viterbi import viterbi_decode
from dabtools_tpu.ops.viterbi_pallas import TC, viterbi_decode_pallas
from dabtools_tpu.tables.puncturing import FIC_PROFILE
from dabtools_tpu.ops.fec import depuncture


def _noisy_batch(rng, batch, n, scale=0.6):
    msgs = rng.integers(0, 2, size=(batch, n), dtype=np.uint8)
    soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
    soft = soft.astype(np.float32)
    soft += rng.normal(scale=scale, size=soft.shape).astype(np.float32)
    return msgs, soft


@pytest.mark.parametrize("batch,n", [(3, 768), (5, 1536), (1, 250)])
def test_matches_xla_reference(batch, n):
    rng = np.random.default_rng(batch * 1000 + n)
    msgs, soft = _noisy_batch(rng, batch, n)
    rb, rm = viterbi_decode(jnp.asarray(soft))
    pb, pm = viterbi_decode_pallas(jnp.asarray(soft), interpret=True)
    assert (np.asarray(rb) == np.asarray(pb)).all()
    np.testing.assert_allclose(np.asarray(rm), np.asarray(pm), rtol=1e-5)
    assert (np.asarray(pb) == msgs).all()


def test_t_not_multiple_of_chunk():
    # T = n + 6 deliberately not a multiple of the kernel's TC
    n = 4 * TC + 7 - 6
    rng = np.random.default_rng(1)
    msgs, soft = _noisy_batch(rng, 2, n)
    pb, _ = viterbi_decode_pallas(jnp.asarray(soft), interpret=True)
    assert (np.asarray(pb) == msgs).all()


def test_fic_punctured_codewords():
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, size=(4, 768), dtype=np.uint8)
    mask = FIC_PROFILE.mask().astype(bool)
    tx = np.stack([(1.0 - 2.0 * conv_encode(m))[mask] for m in msgs])
    tx = tx.astype(np.float32)
    tx += rng.normal(scale=0.4, size=tx.shape).astype(np.float32)
    soft = depuncture(jnp.asarray(tx), FIC_PROFILE)
    rb, _ = viterbi_decode(soft)
    pb, _ = viterbi_decode_pallas(soft, interpret=True)
    assert (np.asarray(rb) == np.asarray(pb)).all()
    assert (np.asarray(pb) == msgs).all()


class TestRadix4:
    @pytest.mark.parametrize("batch,n", [(3, 768), (2, 3072)])
    def test_matches_xla_reference(self, batch, n):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(batch * 77 + n)
        msgs, soft = _noisy_batch(rng, batch, n)
        rb, rm = viterbi_decode(jnp.asarray(soft))
        pb, pm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True)
        assert (np.asarray(rb) == np.asarray(pb)).all()
        np.testing.assert_allclose(np.asarray(rm), np.asarray(pm),
                                   rtol=1e-5)
        assert (np.asarray(pb) == msgs).all()

    def test_odd_length_rejected(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 9)), interpret=True)

    def test_select_variants_bit_identical(self):
        """The ACS predecessor-selection realizations (MXU matmul, VPU
        shuffle — shuffle is the production default since the 2026-08-20
        on-chip timing datum) are interchangeable: noisy codewords
        decode bit-identically with matching metrics."""
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(99)
        msgs, soft = _noisy_batch(rng, 3, 1536)
        rb, rm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        select="matmul")
        vb, vm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        select="shuffle")
        assert (np.asarray(rb) == np.asarray(vb)).all()
        np.testing.assert_allclose(np.asarray(rm), np.asarray(vm),
                                   rtol=1e-5)
        assert (np.asarray(vb) == msgs).all()

    def test_select_env_rejects_unknown(self, monkeypatch):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        monkeypatch.setenv("DABTOOLS_VITERBI4_SELECT", "bogus")
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 10)), interpret=True)

    def test_dispatch_prefers_radix4(self):
        rng = np.random.default_rng(3)
        msgs, soft = _noisy_batch(rng, 2, 768)
        bits, _ = viterbi_decode(jnp.asarray(soft), impl="pallas")
        assert (np.asarray(bits) == msgs).all()


class TestProductionDefault:
    def test_resolved_impl_priority(self, monkeypatch):
        from dabtools_tpu.ops import viterbi as V
        monkeypatch.delenv("DABTOOLS_VITERBI", raising=False)
        assert V.resolved_impl() == "xla"          # CPU backend in tests
        monkeypatch.setenv("DABTOOLS_VITERBI", "pallas")
        assert V.resolved_impl() == "pallas"
        V.force_impl("xla")
        try:
            assert V.resolved_impl() == "xla"      # force wins over env
        finally:
            V.force_impl(None)

    def test_receiver_falls_back_to_xla_on_kernel_failure(self, monkeypatch):
        """A persistently-failing Pallas kernel must not kill the stream:
        the receiver re-traces with the XLA implementation (VERDICT r1)."""
        from dabtools_tpu.models.receiver import DabReceiver, process_block
        from dabtools_tpu.ops import viterbi as V
        from dabtools_tpu.ops import viterbi_pallas, viterbi_pallas4
        from tests.test_closed_loop import build_ensemble, modulate

        def boom(*a, **k):
            raise RuntimeError("synthetic Mosaic lowering failure")

        monkeypatch.setattr(viterbi_pallas, "viterbi_decode_pallas", boom)
        monkeypatch.setattr(viterbi_pallas4, "viterbi_decode_pallas4", boom)
        V.force_impl("pallas")
        try:
            process_block.clear_cache()
            ens = build_ensemble()
            x, payload_bytes = modulate(ens, 14, seed=21)
            rx = DabReceiver(n_frames=4)
            eti = rx.feed(x)
            assert V.resolved_impl() == "xla"       # fallback engaged
            assert len(eti) > 0
            from dabtools_tpu.eti.parse import EtiParser
            a = rx._activation_cif
            for k, f in enumerate(EtiParser().feed(b"".join(eti))):
                assert f.subchannel_data(1) == payload_bytes[1][a + k].tobytes()
        finally:
            V.force_impl(None)
            process_block.clear_cache()

    def test_batch_chunking_matches_unchunked(self, monkeypatch):
        """Batches beyond the VMEM ceiling decode in B_CHUNK chunks;
        results must equal the single-call decode row for row."""
        from dabtools_tpu.ops import viterbi_pallas4 as vp4
        rng = np.random.default_rng(5)
        msgs, soft = _noisy_batch(rng, 7, 192)
        ref, refm = vp4.viterbi_decode_pallas4(jnp.asarray(soft),
                                               interpret=True)
        monkeypatch.setattr(vp4, "B_CHUNK", 3)
        vp4._decode4_vmappable.cache_clear()
        try:
            pb, pm = vp4.viterbi_decode_pallas4(jnp.asarray(soft),
                                                interpret=True)
        finally:
            vp4._decode4_vmappable.cache_clear()
        assert (np.asarray(pb) == np.asarray(ref)).all()
        np.testing.assert_allclose(np.asarray(pm), np.asarray(refm),
                                   rtol=1e-5)
        assert (np.asarray(pb) == msgs).all()

    def test_vmap_collapses_into_lane_batch(self):
        """vmap over the kernel must produce the same bits as decoding
        each slice separately (the custom_vmap rule reshapes the mapped
        axis into the lane batch instead of a serial grid loop)."""
        import jax

        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(6)
        msgs, soft = _noisy_batch(rng, 6, 192)
        s3 = jnp.asarray(soft).reshape(3, 2, -1)
        bits, metric = jax.vmap(
            lambda a: viterbi_decode_pallas4(a, interpret=True))(s3)
        assert bits.shape[:2] == (3, 2)
        flat = np.asarray(bits).reshape(6, -1)
        assert (flat == msgs).all()
        ref, refm = viterbi_decode_pallas4(jnp.asarray(soft),
                                           interpret=True)
        assert (flat == np.asarray(ref)).all()
        np.testing.assert_allclose(np.asarray(metric).reshape(6),
                                   np.asarray(refm), rtol=1e-5)


class TestRagged:
    """Per-lane-length (ragged) decode: FIC + MSC profile groups share
    ONE kernel dispatch (ops.viterbi.viterbi_decode_ragged)."""

    def test_mixed_lengths_match_per_batch(self):
        from dabtools_tpu.ops.viterbi import viterbi_decode_ragged
        rng = np.random.default_rng(7)
        batches = []
        for batch, n in [(3, 768), (2, 1536), (4, 250 * 2)]:
            msgs, soft = _noisy_batch(rng, batch, n)
            batches.append((msgs, soft))
        import dabtools_tpu.ops.viterbi as V
        V.force_impl("pallas")
        try:
            outs = viterbi_decode_ragged([jnp.asarray(s)
                                          for _, s in batches])
        finally:
            V.force_impl(None)
        assert len(outs) == 3
        for (msgs, soft), (bits, metric) in zip(batches, outs):
            rb, rm = viterbi_decode(jnp.asarray(soft), impl="xla")
            assert bits.shape == rb.shape
            assert (np.asarray(bits) == np.asarray(rb)).all()
            np.testing.assert_allclose(np.asarray(metric), np.asarray(rm),
                                       rtol=1e-5)
            assert (np.asarray(bits) == msgs).all()

    def test_fic_plus_msc_shapes(self):
        """The production pairing: FIC codewords (T=774) alongside a
        128 kbit/s EEP-3A MSC group (T=3078) — depunctured for real."""
        from dabtools_tpu.ops.viterbi import viterbi_decode_ragged
        from dabtools_tpu.tables.puncturing import eep_profile
        rng = np.random.default_rng(11)
        prof = eep_profile(3, "A", 128)
        fic_msgs, fic_soft = _noisy_batch(rng, 2, 768, scale=0.3)
        msc_msgs, msc_soft = _noisy_batch(rng, 1, prof.data_bits,
                                          scale=0.3)
        import dabtools_tpu.ops.viterbi as V
        V.force_impl("pallas")
        try:
            outs = viterbi_decode_ragged(
                [jnp.asarray(fic_soft), jnp.asarray(msc_soft)])
        finally:
            V.force_impl(None)
        (fb, _), (mb, _) = outs
        assert (np.asarray(fb) == fic_msgs).all()
        assert (np.asarray(mb) == msc_msgs).all()

    def test_single_batch_passthrough(self):
        from dabtools_tpu.ops.viterbi import viterbi_decode_ragged
        rng = np.random.default_rng(3)
        msgs, soft = _noisy_batch(rng, 2, 768)
        (bits, _), = viterbi_decode_ragged([jnp.asarray(soft)])
        assert (np.asarray(bits) == msgs).all()

    def test_bad_lengths_rejected(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((2, 4 * 10)), interpret=True,
                                   lengths=np.array([10, 7]))  # odd
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((2, 4 * 10)), interpret=True,
                                   lengths=np.array([10, 12]))  # > T
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((2, 4 * 10)), interpret=True,
                                   lengths=np.array([10]))  # wrong shape

    def test_receiver_merged_dispatch_bit_exact(self):
        """End-to-end: the receiver's single ragged dispatch (FIC +
        MSC in one kernel call, Pallas interpret) yields byte-identical
        ETI to the XLA per-group path."""
        from dabtools_tpu.models.receiver import DabReceiver, process_block
        from dabtools_tpu.ops import viterbi as V
        from tests.test_closed_loop import build_ensemble, modulate

        ens = build_ensemble()
        x, payload_bytes = modulate(ens, 10, seed=13)
        rx_ref = DabReceiver(n_frames=4, ensemble=ens)
        eti_ref = rx_ref.feed(x)

        V.force_impl("pallas")
        try:
            process_block.clear_cache()
            rx = DabReceiver(n_frames=4, ensemble=ens)
            eti = rx.feed(x)
            assert V.resolved_impl() == "pallas"   # no silent fallback
        finally:
            V.force_impl(None)
            process_block.clear_cache()
        assert eti and eti == eti_ref


class TestTracebackRealizations:
    def test_variants_bit_identical(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(42)
        msgs, soft = _noisy_batch(rng, 3, 1536)
        fb, fm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        traceback="factored")
        ob, om = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        traceback="onehot64")
        assert (np.asarray(fb) == np.asarray(ob)).all()
        np.testing.assert_allclose(np.asarray(fm), np.asarray(om),
                                   rtol=1e-5)
        assert (np.asarray(fb) == msgs).all()

    def test_ragged_with_onehot64(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(43)
        m1, s1 = _noisy_batch(rng, 2, 768)
        m2, s2 = _noisy_batch(rng, 1, 1536)
        soft = np.zeros((3, s2.shape[-1]), np.float32)
        soft[:2, : s1.shape[-1]] = s1
        soft[2] = s2
        bits, _ = viterbi_decode_pallas4(
            jnp.asarray(soft), interpret=True, traceback="onehot64",
            lengths=np.array([768 + 6, 768 + 6, 1536 + 6]))
        assert (np.asarray(bits[:2, :768]) == m1).all()
        assert (np.asarray(bits[2, :1536]) == m2[0]).all()

    def test_env_rejects_unknown(self, monkeypatch):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        monkeypatch.setenv("DABTOOLS_VITERBI4_TRACEBACK", "nope")
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 10)), interpret=True)


class TestPackRealizations:
    """Decision-word packing realizations (shift4 default / mxu8
    experimental — one MXU pass per step; see _acs4_kernel)."""

    def test_variants_bit_identical(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(77)
        msgs, soft = _noisy_batch(rng, 3, 1536)
        sb, sm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        pack="shift4")
        mb, mm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        pack="mxu8")
        assert (np.asarray(sb) == np.asarray(mb)).all()
        np.testing.assert_allclose(np.asarray(sm), np.asarray(mm),
                                   rtol=1e-5)
        assert (np.asarray(mb) == msgs).all()

    def test_mxu8_ragged_and_selects(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(78)
        m1, s1 = _noisy_batch(rng, 2, 768)
        m2, s2 = _noisy_batch(rng, 1, 1536)
        soft = np.zeros((3, s2.shape[-1]), np.float32)
        soft[:2, : s1.shape[-1]] = s1
        soft[2] = s2
        for select in ("matmul", "shuffle"):
            bits, _ = viterbi_decode_pallas4(
                jnp.asarray(soft), interpret=True, pack="mxu8",
                select=select, lengths=np.array([774, 774, 1542]))
            assert (np.asarray(bits[:2, :768]) == m1).all()
            assert (np.asarray(bits[2, :1536]) == m2[0]).all()

    def test_mxu8_requires_factored_traceback(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 10)), interpret=True,
                                   pack="mxu8", traceback="onehot64")

    def test_env_rejects_unknown(self, monkeypatch):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        monkeypatch.setenv("DABTOOLS_VITERBI4_PACK", "nah")
        with pytest.raises(ValueError):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 10)), interpret=True)


class TestBf16BranchMetrics:
    """bm='bf16' realization (DABTOOLS_VITERBI4_BM): bf16-STORED branch
    metrics with f32 MXU accumulation.  On bf16-exact soft inputs the
    rounding is a no-op, so the kernel must be BIT-IDENTICAL to the f32
    build; on noisy inputs it must still decode the true message at
    clean-channel SNR."""

    def test_bm_bf16_exact_inputs_bit_identical(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(21)
        msgs = rng.integers(0, 2, size=(4, 120), dtype=np.uint8)
        soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
        # perturb with bf16-exact steps (multiples of 0.25): bm sums of
        # 8 such values are exactly representable in bf16
        soft += 0.25 * rng.integers(-2, 3, size=soft.shape)
        soft = soft.astype(np.float32)
        fb, fm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        bm="f32")
        gb, gm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        bm="bf16")
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(gb))
        np.testing.assert_allclose(np.asarray(fm), np.asarray(gm))

    def test_bm_bf16_noisy_decodes_ground_truth(self):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        rng = np.random.default_rng(22)
        msgs = rng.integers(0, 2, size=(3, 250), dtype=np.uint8)
        soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs])
        soft = (soft + rng.normal(scale=0.35, size=soft.shape)
                ).astype(np.float32)
        gb, _ = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                       bm="bf16")
        np.testing.assert_array_equal(np.asarray(gb), msgs)

    def test_bm_env_rejects_unknown(self, monkeypatch):
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        monkeypatch.setenv("DABTOOLS_VITERBI4_BM", "f16")
        with pytest.raises(ValueError, match="bm must be one of"):
            viterbi_decode_pallas4(jnp.zeros((1, 4 * 10)), interpret=True)

    def test_bm_bf16_chunking_matches_unchunked(self, monkeypatch):
        import dabtools_tpu.ops.viterbi_pallas4 as vp4
        from dabtools_tpu.ops.viterbi_pallas4 import viterbi_decode_pallas4
        monkeypatch.setattr(vp4, "B_CHUNK_BF16", 3)
        vp4._decode4_vmappable.cache_clear()
        rng = np.random.default_rng(23)
        msgs = rng.integers(0, 2, size=(7, 60), dtype=np.uint8)
        soft = np.stack([1.0 - 2.0 * conv_encode(m) for m in msgs]
                        ).astype(np.float32)
        cb, cm = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        bm="bf16")
        vp4._decode4_vmappable.cache_clear()
        monkeypatch.undo()
        vp4._decode4_vmappable.cache_clear()
        ub, um = viterbi_decode_pallas4(jnp.asarray(soft), interpret=True,
                                        bm="bf16")
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(ub))
        np.testing.assert_allclose(np.asarray(cm), np.asarray(um))
        vp4._decode4_vmappable.cache_clear()
