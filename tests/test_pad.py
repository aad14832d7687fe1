"""PAD / dynamic-label (DLS) closed-loop tests (EN 300 401 s7.4).

Encoder and decoder are both ours (the reference has no PAD handling),
so these are self-consistency loops; interop caveats are tracked in
docs/INTEROP.md.
"""

import numpy as np
import pytest

from dabtools_tpu.eti.pad import (
    APP_DLS_CONT, APP_DLS_START, DlsDecoder, PadDecoder, attach_pad_mp2,
    build_xpad, dls_clear_command, dls_data_groups, extract_pad_mp2,
    parse_xpad, unwrap_pad_dse, wrap_pad_dse)


def test_xpad_roundtrip():
    subs = [(APP_DLS_START, b"hello"), (APP_DLS_CONT, b"abc")]
    xpad, fpad = build_xpad(subs)
    got = parse_xpad(xpad, fpad)
    assert [(a, d[: len(o)]) for (a, d), (_, o) in zip(got, subs)] == subs


def test_xpad_four_subfields_no_end_marker():
    subs = [(APP_DLS_START, b"x" * 4)] * 4
    xpad, fpad = build_xpad(subs)
    got = parse_xpad(xpad, fpad)
    assert len(got) == 4 and all(a == APP_DLS_START for a, _ in got)


def test_dls_single_segment():
    dec = DlsDecoder()
    (group,) = dls_data_groups("Now: News", toggle=0)
    labels = dec.feed(group, start=True)
    assert [lab.text for lab in labels] == ["Now: News"]


def test_dls_multi_segment_and_toggle():
    dec = DlsDecoder()
    long = "A" * 16 + "B" * 16 + "CC"        # 3 segments
    for g in dls_data_groups(long, toggle=1):
        labels = dec.feed(g, start=True)
    assert [lab.text for lab in labels] == [long]
    # Toggle flips -> previous partial state must not leak.
    groups = dls_data_groups("short", toggle=0)
    labels = dec.feed(groups[0], start=True)
    assert labels[0].text == "short" and labels[0].toggle == 0


def test_dls_group_split_across_subfields():
    dec = DlsDecoder()
    (group,) = dls_data_groups("split subfields", toggle=0)
    assert dec.feed(group[:7], start=True) == []
    labels = dec.feed(group[7:], start=False)
    assert labels[0].text == "split subfields"


def test_dls_crc_failure_rejected():
    dec = DlsDecoder()
    (group,) = dls_data_groups("ok", toggle=0)
    bad = bytearray(group)
    bad[2] ^= 0xFF
    assert dec.feed(bytes(bad), start=True) == []
    assert dec.stats["crc_failures"] == 1


def test_dls_clear_command():
    dec = DlsDecoder()
    groups = dls_data_groups("A" * 20, toggle=0)
    dec.feed(groups[0], start=True)          # partial label pending
    dec.feed(dls_clear_command(0), start=True)
    assert dec.stats["commands"] == 1
    # The pending segment was discarded: same-toggle completion now needs
    # the full set again.
    assert dec.feed(groups[1], start=True) == []


def test_mp2_frame_tail_roundtrip():
    frame = bytearray(np.random.default_rng(0).integers(
        0, 256, 384, dtype=np.uint8).tobytes())      # 128 kbit/s frame
    (group,) = dls_data_groups("MP2 label", toggle=0)
    xpad, fpad = build_xpad([(APP_DLS_START, group)])
    attach_pad_mp2(frame, xpad, fpad)
    got_x, got_f = extract_pad_mp2(bytes(frame))
    assert got_f == fpad and got_x[: len(xpad)] == xpad
    labels = PadDecoder().feed_mp2_frame(bytes(frame))
    assert labels[0].text == "MP2 label"


def test_mp2_no_xpad():
    frame = bytes(384)
    xpad, fpad = extract_pad_mp2(frame)
    assert xpad == b"" and parse_xpad(xpad, fpad) == []


def test_dse_roundtrip():
    (group,) = dls_data_groups("AAC label", toggle=1)
    xpad, fpad = build_xpad([(APP_DLS_START, group)])
    au = wrap_pad_dse(xpad, fpad) + b"\xDE\xAD\xBE\xEF"
    got = unwrap_pad_dse(au)
    assert got is not None and got[1] == fpad and got[0][: len(xpad)] == xpad
    labels = PadDecoder().feed_dabplus_au(au)
    assert labels[0].text == "AAC label"


def test_dse_large_payload():
    xpad, fpad = build_xpad([(APP_DLS_START, b"z" * 48),
                             (APP_DLS_CONT, b"z" * 48),
                             (APP_DLS_CONT, b"z" * 48),
                             (APP_DLS_CONT, b"z" * 48)])
    au = wrap_pad_dse(xpad, fpad)
    got_x, got_f = unwrap_pad_dse(au)
    assert got_x == xpad and got_f == fpad


def test_dse_escape_count():
    got = unwrap_pad_dse(wrap_pad_dse(b"q" * 300, b"\x20\x02"))
    assert got == (b"q" * 300, b"\x20\x02")


def test_non_pad_au_ignored():
    assert unwrap_pad_dse(b"\x21\x00\x00\x00") is None
    assert PadDecoder().feed_dabplus_au(b"\x00" * 16) == []


def test_label_streamed_over_frames():
    """DLS trickled one group per MP2 frame, as a real mux would."""
    dec = PadDecoder()
    texts = []
    for toggle, text in enumerate(["First label", "Second " + "y" * 20]):
        for g in dls_data_groups(text, toggle=toggle & 1):
            frame = bytearray(384)
            xpad, fpad = build_xpad([(APP_DLS_START, g)])
            attach_pad_mp2(frame, xpad, fpad)
            texts += [lab.text for lab in dec.feed_mp2_frame(bytes(frame))]
    assert texts == ["First label", "Second " + "y" * 20]


# ------------------------------------------------------------- DL Plus
def test_dlplus_tags_roundtrip():
    from dabtools_tpu.eti.pad import dlplus_command
    dec = DlsDecoder()
    label = "Blur - Song 2"
    (group,) = dls_data_groups(label, toggle=0)
    dec.feed(group, start=True)
    cmd = dlplus_command([(4, 0, 4), (1, 7, 6)], toggle=0,
                         item_running=True)
    dec.feed(cmd, start=True)
    assert dec.stats["dlplus_commands"] == 1
    (info,) = dec.dlplus
    assert info.item_running and not info.item_toggle
    assert [(t.content_type, t.text) for t in info.tags] == [
        (4, "Blur"), (1, "Song 2")]


def test_dlplus_before_any_label_is_orphaned():
    from dabtools_tpu.eti.pad import dlplus_command
    dec = DlsDecoder()
    dec.feed(dlplus_command([(1, 0, 5)], toggle=0), start=True)
    assert dec.dlplus == []
    assert dec.stats["dlplus_orphans"] == 1


def test_dlplus_stale_start_beyond_label_dropped():
    from dabtools_tpu.eti.pad import dlplus_command
    dec = DlsDecoder()
    (group,) = dls_data_groups("hi", toggle=0)
    dec.feed(group, start=True)
    dec.feed(dlplus_command([(1, 10, 3), (4, 0, 2)], toggle=0), start=True)
    (info,) = dec.dlplus
    assert [(t.content_type, t.text) for t in info.tags] == [(4, "hi")]


def test_dlplus_through_pad_decoder_mp2():
    from dabtools_tpu.eti.pad import dlplus_command
    pad = PadDecoder()
    label = "ArtistX - TitleY"                # 16 chars: one segment
    (group,) = dls_data_groups(label, toggle=0)
    cmd = dlplus_command([(4, 0, 7), (1, 10, 6)], toggle=0)
    frames = []
    for g in (group, cmd):
        frame = bytearray(np.random.default_rng(1).integers(
            0, 256, 384, dtype=np.uint8).tobytes())
        xpad, fpad = build_xpad([(APP_DLS_START, g)])
        attach_pad_mp2(frame, xpad, fpad)
        frames.append(bytes(frame))
    labels = [lab for f in frames for lab in pad.feed_mp2_frame(f)]
    assert [lab.text for lab in labels] == [label]
    (info,) = pad.take_dlplus()
    assert [(t.content_type, t.text) for t in info.tags] == [
        (4, "ArtistX"), (1, "TitleY")]
    assert pad.take_dlplus() == []          # drained


def test_empty_dls_label_rejected():
    import pytest
    with pytest.raises(ValueError, match="empty"):
        dls_data_groups("", toggle=0)
