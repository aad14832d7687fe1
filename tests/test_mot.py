"""MOT slideshow closed-loop tests (EN 301 234 / TS 101 499)."""

import numpy as np

from dabtools_tpu.eti.mot import (
    DG_TYPE_MOT_BODY, MotDecoder, MotEncoder, SUBTYPE_PNG,
    build_data_group, mot_header_core, parse_data_group, parse_header_core)
from dabtools_tpu.eti.pad import PadDecoder, attach_pad_mp2, build_xpad


def test_data_group_roundtrip():
    dg = build_data_group(DG_TYPE_MOT_BODY, continuity=5, segment=3,
                          last=True, transport_id=0xBEEF, payload=b"seg!")
    got = parse_data_group(dg)
    assert got is not None
    assert (got.dg_type, got.continuity, got.segment, got.last,
            got.transport_id, got.payload) == (
        DG_TYPE_MOT_BODY, 5, 3, True, 0xBEEF, b"seg!")


def test_data_group_crc_reject():
    dg = bytearray(build_data_group(DG_TYPE_MOT_BODY, 0, 0, True, 1, b"x"))
    dg[-3] ^= 0xFF
    assert parse_data_group(bytes(dg)) is None


def test_header_core_roundtrip():
    h = mot_header_core(123456, 42, 2, 1)
    assert parse_header_core(h) == (123456, 42, 2, 1)


def test_object_roundtrip_via_subfields():
    body = bytes(np.random.default_rng(0).integers(0, 256, 300,
                                                   dtype=np.uint8))
    enc = MotEncoder(seg_size=48, subfield_size=24)
    dec = MotDecoder()
    objs = []
    for apptype, data in enc.object_subfields(body, name="pic.png",
                                              subtype=SUBTYPE_PNG):
        objs += dec.feed(apptype, data)
    objs += dec.flush()
    assert len(objs) == 1
    o = objs[0]
    assert o.body == body and o.name == "pic.png"
    assert (o.content_type, o.subtype) == (2, SUBTYPE_PNG)
    assert dec.stats["crc_failures"] == 0


def test_two_objects_sequential():
    enc, dec = MotEncoder(), MotDecoder()
    bodies = [b"A" * 100, b"B" * 77]
    got = []
    for b in bodies:
        for apptype, data in enc.object_subfields(b):
            got += dec.feed(apptype, data)
    got += dec.flush()
    assert [o.body for o in got] == bodies
    assert got[0].transport_id != got[1].transport_id


def test_slideshow_over_mp2_frames():
    """Full PAD path: MOT subfields + DLS share X-PAD across MP2 frames."""
    from dabtools_tpu.eti.pad import APP_DLS_START, dls_data_groups
    body = bytes(np.random.default_rng(1).integers(0, 256, 200,
                                                   dtype=np.uint8))
    subfields = MotEncoder(subfield_size=24).object_subfields(body)
    (dls_group,) = dls_data_groups("with slides", toggle=0)
    dec = PadDecoder(mot=True)
    labels = []
    queue = list(subfields)
    first = True
    while queue:
        frame = bytearray(384)
        subs = [(APP_DLS_START, dls_group)] if first else []
        first = False
        while queue and len(subs) < 2:
            subs.append(queue.pop(0))
        xpad, fpad = build_xpad(subs)
        attach_pad_mp2(frame, xpad, fpad)
        labels += dec.feed_mp2_frame(bytes(frame))
    dec.flush()
    assert [lab.text for lab in labels] == ["with slides"]
    assert len(dec.objects) == 1 and dec.objects[0].body == body


def test_lost_subfield_discards_object_only():
    from dabtools_tpu.eti.mot import APP_MOT_CONT
    enc, dec = MotEncoder(subfield_size=24), MotDecoder()
    subs = enc.object_subfields(b"X" * 150)
    # Drop one continuation subfield: its data group fails CRC.
    drop = next(i for i, (a, _) in enumerate(subs) if a == APP_MOT_CONT)
    dropped = subs[:drop] + subs[drop + 1:]
    got = []
    for apptype, data in dropped:
        got += dec.feed(apptype, data)
    got += dec.flush()
    assert dec.stats["crc_failures"] >= 1
    # A following object still decodes.
    for apptype, data in enc.object_subfields(b"Y" * 60):
        got += dec.feed(apptype, data)
    got += dec.flush()
    assert [o.body for o in got] == [b"Y" * 60]


def test_cli_slides(tmp_path):
    """eti2audio --slides extracts an image from an ETI file."""
    import subprocess
    import sys
    from dabtools_tpu.eti.assemble import EtiAssembler
    from dabtools_tpu.fic.config import (Ensemble, Service, ServiceComponent,
                                         Subchannel)
    from dabtools_tpu.fic.fig import build_fibs_for_ensemble

    ens = Ensemble(
        eid=0x51DE, label="SLIDES",
        subchannels=(Subchannel.eep(1, 0, 3, "A", 64),),
        services=(Service(sid=0x10, label="PIC SVC", components=(
            ServiceComponent(tmid=0, subchid=1, ascty=0),)),))
    png = b"\x89PNG\r\n\x1a\n" + bytes(np.random.default_rng(2).integers(
        0, 256, 150, dtype=np.uint8))
    queue = MotEncoder(subfield_size=24).object_subfields(
        png, name="logo.png", subtype=SUBTYPE_PNG)
    asm = EtiAssembler(ens)
    raw = b""
    n = 0
    while queue or n < 4:
        frame = bytearray(np.random.default_rng(100 + n).integers(
            0, 256, 192, dtype=np.uint8).tobytes())
        subs = []
        while queue and len(subs) < 3:
            subs.append(queue.pop(0))
        xpad, fpad = build_xpad(subs)
        attach_pad_mp2(frame, xpad, fpad)
        fibs = [build_fibs_for_ensemble(ens, n)[i].tobytes()
                for i in range(3)]
        raw += asm.frame(fibs, {1: bytes(frame)})
        n += 1
    eti = tmp_path / "slides.eti"
    eti.write_bytes(raw)
    outdir = tmp_path / "imgs"
    r = subprocess.run(
        [sys.executable, "-m", "dabtools_tpu.cli.eti2audio", "--sid", "0x10",
         "--slides", str(outdir), str(eti), "-o", str(tmp_path / "a.mp2")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "MOT object" in r.stderr
    files = list(outdir.iterdir())
    assert len(files) == 1 and files[0].name.endswith("logo.png")
    assert files[0].read_bytes() == png


def test_safe_mot_filename():
    from dabtools_tpu.cli.eti2audio import safe_mot_filename

    assert safe_mot_filename("logo.png", 1) == "logo.png"
    assert safe_mot_filename("../../etc/passwd", 1) == "passwd"
    assert safe_mot_filename("..\\..\\evil.exe", 2) == "evil.exe"
    assert safe_mot_filename("dir/sub/img.jpg", 3) == "img.jpg"
    assert safe_mot_filename(".hidden", 4) == "hidden"
    assert safe_mot_filename("", 5) == "slide_5"
    assert safe_mot_filename(None, 6) == "slide_6"
    assert safe_mot_filename("..", 7) == "slide_7"


# ------------------------------------------- directory mode (EN 301 234 s6)
def test_directory_roundtrip():
    from dabtools_tpu.eti.mot import build_mot_directory, parse_mot_directory
    h1 = mot_header_core(100, 7, 2, 1)
    h2 = mot_header_core(200, 7, 2, 3)
    d = build_mot_directory([(10, h1), (20, h2)], carousel_period_ms=5000)
    got = parse_mot_directory(d)
    assert got == {10: h1, 20: h2}
    assert parse_mot_directory(d[:8]) is None


def test_directory_mode_carousel():
    """Directory-mode carousel: objects complete from the TOC + bodies;
    repetitions are absorbed by the caching model; a changed object
    re-emits."""
    rng = np.random.default_rng(1)
    objects = [("a.jpg", bytes(rng.integers(0, 256, 200, dtype=np.uint8))),
               ("b.png", bytes(rng.integers(0, 256, 333, dtype=np.uint8)))]
    enc, dec = MotEncoder(seg_size=40, subfield_size=24), MotDecoder()
    got = []
    sfs = enc.carousel_subfields(objects, carousel_period_ms=1000)
    for apptype, data in sfs:
        got += dec.feed(apptype, data)
    got += dec.flush()
    assert sorted((o.name, o.body) for o in got) == sorted(objects)
    assert {o.subtype for o in got} == {1, 3}   # JFIF from .jpg, PNG from .png
    assert dec.stats["directories"] == 1

    # Second carousel cycle with the SAME tids/headers: nothing re-emitted.
    again = []
    for apptype, data in sfs:
        again += dec.feed(apptype, data)
    again += dec.flush()
    assert again == []
    assert not dec._bodies        # repetitions must not grow memory

    # New cycle where one object changed: only that object re-emits.
    objects2 = [objects[0], ("b.png", b"NEW" * 50)]
    got2 = []
    for apptype, data in enc.carousel_subfields(objects2):
        got2 += dec.feed(apptype, data)
    got2 += dec.flush()
    assert sorted((o.name, o.body) for o in got2) == sorted(objects2)


def test_directory_mode_body_before_directory():
    """Bodies arriving before the directory complete once the TOC lands."""
    enc, dec = MotEncoder(seg_size=64), MotDecoder()
    sfs = enc.carousel_subfields([("x.jpg", b"Z" * 150)])
    # encoder emits directory groups first; find the split and reverse it
    from dabtools_tpu.eti.mot import APP_DGLI
    groups, cur = [], []
    for item in sfs:
        if item[0] == APP_DGLI and cur:
            groups.append(cur)
            cur = []
        cur.append(item)
    groups.append(cur)
    reordered = [x for g in groups[1:] for x in g] + groups[0]
    got = []
    for apptype, data in reordered:
        got += dec.feed(apptype, data)
    got += dec.flush()
    assert [(o.name, o.body) for o in got] == [("x.jpg", b"Z" * 150)]


def test_compressed_directory_roundtrip():
    """Type-7 entity: gzip'd TOC parses back; junk/unknown-compression -> None."""
    from dabtools_tpu.eti.mot import (build_mot_directory_compressed,
                                      parse_mot_directory_compressed)
    h1 = mot_header_core(100, 7, 2, 1)
    h2 = mot_header_core(200, 7, 2, 3)
    d = build_mot_directory_compressed([(10, h1), (20, h2)],
                                       carousel_period_ms=5000)
    assert parse_mot_directory_compressed(d) == {10: h1, 20: h2}
    assert parse_mot_directory_compressed(d[:3]) is None
    assert parse_mot_directory_compressed(
        d[:4] + bytes([99]) + d[5:]) is None          # unknown CompressionId
    assert parse_mot_directory_compressed(
        d[:5] + b"\x00" * (len(d) - 5)) is None       # corrupt gzip stream


def test_compressed_directory_carousel():
    """compress=True carousel decodes end-to-end and caches repetitions."""
    rng = np.random.default_rng(3)
    objects = [("c.jpg", bytes(rng.integers(0, 256, 180, dtype=np.uint8))),
               ("d.png", bytes(rng.integers(0, 256, 257, dtype=np.uint8)))]
    enc, dec = MotEncoder(seg_size=40, subfield_size=24), MotDecoder()
    sfs = enc.carousel_subfields(objects, compress=True)
    got = []
    for apptype, data in sfs:
        got += dec.feed(apptype, data)
    got += dec.flush()
    assert sorted((o.name, o.body) for o in got) == sorted(objects)
    assert dec.stats["directories"] == 1
    # repetition: caching model absorbs it
    again = []
    for apptype, data in sfs:
        again += dec.feed(apptype, data)
    again += dec.flush()
    assert again == []


def test_parse_data_group_truncated_returns_none():
    """Corrupt/short groups must return None, never raise (the decoder
    survives corruption by design)."""
    # ext=1, crc=0, seg=1, user=1: header fields run past the end
    assert parse_data_group(bytes([0b10110100, 0, 0, 0, 0])) is None
    # user-access byte missing entirely
    assert parse_data_group(bytes([0b00010011, 0])) is None
    # transport id flagged but truncated
    assert parse_data_group(bytes([0b00010011, 0, 0x12, 0x00])) is None
    # user-access length runs past the end
    assert parse_data_group(bytes([0b00010011, 0, 0x1F, 0, 0])) is None


def test_compressed_directory_corrupt_gzip_returns_none():
    from dabtools_tpu.eti.mot import (build_mot_directory_compressed,
                                      parse_mot_directory_compressed)
    good = build_mot_directory_compressed(
        [(1, mot_header_core(0, 7, 2, 1))])
    assert parse_mot_directory_compressed(good) is not None
    truncated = good[:4] + good[4:5] + good[5:-6]  # cut the gzip stream
    truncated = (len(truncated) & 0x3FFFFFFF).to_bytes(4, "big") + truncated[4:]
    assert parse_mot_directory_compressed(truncated) is None
    corrupt = bytearray(good)
    corrupt[18] ^= 0xFF      # inside deflate data (gzip header is 5+10 B)
    assert parse_mot_directory_compressed(bytes(corrupt)) is None


def test_crcless_garbage_not_accepted_by_fallback():
    """The guess-the-end fallback only trusts groups that carry a CRC:
    crc-flag-0 garbage from corrupt X-PAD bytes must not become
    segments."""
    dec = MotDecoder()
    garbage = bytes([0b00110100]) + bytes(40)      # crc=0, seg+user flags
    dec.feed(12, garbage)                          # APP_MOT_START
    dec.feed(12, b"\x00" * 8)                      # next start closes it
    assert dec.stats["objects"] == 0
    assert dec._headers == {} and dec._bodies == {}


def test_pending_transfer_eviction_bounds_memory():
    from dabtools_tpu.eti.mot import MAX_PENDING_TRANSFERS, build_data_group
    dec = MotDecoder()
    for tid in range(MAX_PENDING_TRANSFERS + 20):
        # header segment 0, never the last: transfer can never complete
        g = build_data_group(3, tid & 0x0F, 0, False, tid, b"\x00\x05hello")
        dec.feed_data_group(g)
    assert len(dec._headers) <= MAX_PENDING_TRANSFERS
    # the most recent transfers are the ones kept
    assert (MAX_PENDING_TRANSFERS + 19) in dec._headers
