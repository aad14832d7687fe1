import numpy as np
import pytest

from dabtools_tpu import constants as C
from dabtools_tpu.eti.assemble import EtiAssembler, tpl_for_subchannel
from dabtools_tpu.eti.parse import EtiParser
from dabtools_tpu.fic.config import Ensemble, Service, ServiceComponent, Subchannel
from dabtools_tpu.fic.fig import FigParser, build_fibs_for_ensemble
from dabtools_tpu.utils.crc import crc16_ok


def example_ensemble():
    return Ensemble(
        eid=0x4FFF,
        label="TPU DAB",
        subchannels=(
            Subchannel.eep(1, 0, 3, "A", 64),      # 48 CUs
            Subchannel.eep(5, 48, 1, "B", 96),     # 81 CUs
        ),
        services=(
            Service(sid=0x1234, label="SVC ONE", components=(
                ServiceComponent(tmid=0, subchid=1, ascty=0),)),
            Service(sid=0x5678, label="SVC TWO", components=(
                ServiceComponent(tmid=0, subchid=5, ascty=63),)),
        ),
    )


class TestFigRoundtrip:
    def test_fibs_have_valid_crcs(self):
        fibs = build_fibs_for_ensemble(example_ensemble(), 0)
        assert fibs.shape == (12, 32)
        for i in range(12):
            assert crc16_ok(fibs[i].tobytes())

    def test_parse_recovers_config(self):
        ens = example_ensemble()
        fibs = build_fibs_for_ensemble(ens, frame_idx=7)
        parser = FigParser()
        for i in range(12):
            parser.feed_fib(fibs[i].tobytes())
        got = parser.ensemble()
        assert got is not None
        assert got.eid == ens.eid
        assert got.label == ens.label
        assert got.subchannels == ens.subchannels
        assert {s.sid for s in got.services} == {0x1234, 0x5678}
        svc = {s.sid: s for s in got.services}
        assert svc[0x1234].label == "SVC ONE"
        assert svc[0x5678].components[0].is_dabplus
        assert parser.cif_count == 7 * 4

    def test_bad_crc_fib_rejected(self):
        fibs = build_fibs_for_ensemble(example_ensemble(), 0)
        parser = FigParser()
        bad = fibs[0].copy()
        bad[5] ^= 0xFF
        parser.feed_fib(bad.tobytes())
        assert parser.fibs_bad == 1 and parser.fibs_ok == 0
        assert parser.ensemble() is None

    def test_uep_subchannel_roundtrip(self):
        ens = Ensemble(eid=1, subchannels=(Subchannel.uep(3, 100, 35),))
        fibs = build_fibs_for_ensemble(ens, 0)
        parser = FigParser()
        for i in range(12):
            parser.feed_fib(fibs[i].tobytes())
        got = parser.ensemble().subchannels[0]
        assert got.protection_type == "UEP"
        assert got.uep_table_index == 35
        assert got.bitrate_kbps == 128
        assert got.size_cus == 96


class TestEtiRoundtrip:
    def _roundtrip(self, n_frames=3):
        ens = example_ensemble()
        asm = EtiAssembler(ens)
        rng = np.random.default_rng(0)
        sent = []
        raw = b""
        for n in range(n_frames):
            fibs = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
                    for _ in range(3)]
            data = {s.subchid: rng.integers(0, 256, s.data_bytes,
                                            dtype=np.uint8).tobytes()
                    for s in ens.subchannels}
            sent.append((fibs, data))
            raw += asm.frame(fibs, data)
        return ens, sent, raw

    def test_frame_size_and_parse(self):
        ens, sent, raw = self._roundtrip()
        assert len(raw) == 3 * C.ETI_FRAME_BYTES
        frames = list(EtiParser().feed(raw))
        assert len(frames) == 3
        for n, (f, (fibs, data)) in enumerate(zip(frames, sent)):
            assert f.header_crc_ok and f.mst_crc_ok
            assert f.err == 0xFF
            assert f.fct == n
            assert f.mid == 1
            assert f.fic == b"".join(fibs)
            for s in ens.subchannels:
                assert f.subchannel_data(s.subchid) == data[s.subchid]

    def test_resync_after_garbage(self):
        _, sent, raw = self._roundtrip()
        parser = EtiParser()
        garbled = b"\xde\xad\xbe\xef" * 300 + raw
        frames = list(parser.feed(garbled))
        assert len(frames) == 3
        assert parser.resyncs >= 1
        assert frames[0].fic == b"".join(sent[0][0])

    def test_streaming_feed_in_chunks(self):
        _, _, raw = self._roundtrip()
        parser = EtiParser()
        frames = []
        for i in range(0, len(raw), 1000):
            frames.extend(parser.feed(raw[i:i + 1000]))
        assert len(frames) == 3

    def test_tpl_encoding(self):
        assert tpl_for_subchannel(Subchannel.eep(0, 0, 3, "A", 64)) == 0x42
        assert tpl_for_subchannel(Subchannel.eep(0, 0, 1, "B", 32)) == 0x50
        assert tpl_for_subchannel(Subchannel.uep(0, 0, 35)) == 35

    def test_wrong_subch_size_rejected(self):
        ens = example_ensemble()
        asm = EtiAssembler(ens)
        fibs = [b"\x00" * 32] * 3
        with pytest.raises(ValueError):
            asm.frame(fibs, {1: b"\x00" * 10, 5: b"\x00" * 288})
