"""``eti2audio``: ETI(NI) in, audio elementary stream out.

Superset of the reference's `eti2mpa` (`upstream:eti2mpa.c`): parses the
FIC carried inside the ETI to find the requested service/sub-channel and
its audio type, then emits either the MP2 elementary stream (DAB) or the
AAC access units (DAB+, raw or ADTS-wrapped, via the RS(120,110)
superframe decoder).

Usage:
  python -m dabtools_tpu.cli.eti2audio --sid 0x1234 in.eti > audio.mp2
  python -m dabtools_tpu.cli.eti2audio --subch 2 --adts in.eti > out.aac
"""

from __future__ import annotations

import argparse
import logging
import sys

log = logging.getLogger("dabtools_tpu.eti2audio")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="eti2audio", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("input", help="ETI(NI) file, or '-' for stdin")
    sel = p.add_mutually_exclusive_group()
    sel.add_argument("--sid", type=lambda s: int(s, 0),
                     help="service id (hex ok); default: first audio service")
    sel.add_argument("--subch", type=int, help="sub-channel id")
    p.add_argument("--list", action="store_true",
                   help="list the ensemble's services and exit")
    p.add_argument("--adts", action="store_true",
                   help="wrap DAB+ AAC AUs in ADTS headers")
    p.add_argument("--dabplus", action="store_true",
                   help="force DAB+ decoding even without FIG 0/2 info")
    p.add_argument("--labels", action="store_true",
                   help="decode PAD dynamic labels (DLS) to stderr")
    p.add_argument("--slides", metavar="DIR", default=None,
                   help="decode MOT slideshow images from PAD into DIR")
    p.add_argument("--mode", choices=("I", "II", "III", "IV"), default="I",
                   help="DAB transmission mode of the ETI source")
    p.add_argument("--output", "-o", default="-")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(name)s: %(message)s")

    from dabtools_tpu.eti.parse import EtiParser
    from dabtools_tpu.fic.fig import FigParser

    f = sys.stdin.buffer if args.input == "-" else open(args.input, "rb")
    out = sys.stdout.buffer if args.output == "-" else open(args.output, "wb")

    from dabtools_tpu import constants as C
    parser = EtiParser(mode=C.MODES[args.mode])
    fig = FigParser()
    frames = []
    while True:
        chunk = f.read(1 << 20)
        if not chunk:
            break
        for frame in parser.feed(chunk):
            frames.append(frame)
            for i in range(0, len(frame.fic), 32):
                fig.feed_fib(frame.fic[i:i + 32])
    if args.input != "-":
        f.close()
    if not frames:
        log.error("no ETI frames found")
        return 1
    ens = fig.ensemble()

    if args.list:
        if ens is None:
            print("no MCI decoded")
            return 1
        print(f"ensemble 0x{ens.eid:04X} {ens.label!r}")
        for svc in ens.services:
            for c in svc.components:
                try:
                    rate = f"{ens.subchannel(c.subchid).bitrate_kbps:3d} kbit/s"
                except KeyError:
                    rate = "(unsignalled)"   # e.g. packet-data component
                apps = "".join(
                    f" +{n}" for n in
                    ("SLS" if a == 2 else f"uapp{a}" for a in c.user_apps))
                print(f"  0x{svc.sid:04X} {svc.label or '':16s} subch "
                      f"{c.subchid:2d}  {rate}  "
                      f"{'DAB+' if c.is_dabplus else 'MP2'}{apps}")
        return 0

    # Resolve target sub-channel + audio type.
    subchid, is_dabplus = args.subch, args.dabplus
    if subchid is None:
        if ens is None:
            log.error("no MCI in the ETI FIC; use --subch")
            return 1
        services = [s for s in ens.services
                    if any(c.tmid == 0 for c in s.components)] or ens.services
        if args.sid is not None:
            matches = [s for s in services if s.sid == args.sid]
            if not matches:
                log.error("service 0x%04X not found; have %s", args.sid,
                          [hex(s.sid) for s in services])
                return 1
            svc = matches[0]
        elif services:
            svc = services[0]
        else:
            log.error("no services signalled; use --subch")
            return 1
        comp = next(c for c in svc.components if c.primary)
        subchid = comp.subchid
        is_dabplus = is_dabplus or comp.is_dabplus
        log.info("service 0x%04X %r -> sub-channel %d (%s)", svc.sid,
                 svc.label, subchid, "DAB+" if is_dabplus else "DAB/MP2")
    elif ens is not None and not is_dabplus:
        for svc in ens.services:
            for c in svc.components:
                if c.subchid == subchid and c.is_dabplus:
                    is_dabplus = True

    data = [fr.subchannel_data(subchid) for fr in frames
            if subchid in fr.streams]
    if not data:
        log.error("sub-channel %d not present in ETI", subchid)
        return 1

    pad = None
    if args.labels or args.slides:
        from dabtools_tpu.eti.pad import PadDecoder
        pad = PadDecoder(mot=args.slides is not None)

    def show(labels):
        for lab in labels:
            log.info("dynamic label: %r (charset %d)", lab.text, lab.charset)

    if not is_dabplus:
        for d in data:                       # the eti2mpa path
            out.write(d)
            if pad is not None:
                show(pad.feed_mp2_frame(d))
        log.info("wrote %d bytes MP2 from %d frames",
                 sum(len(d) for d in data), len(data))
    else:
        from dabtools_tpu.eti.dabplus import SuperframeDecoder, adts_wrap
        bitrate = len(data[0]) // 3
        dec = SuperframeDecoder(bitrate)
        n_aus = n_bad = 0
        for d in data:
            for au in dec.feed(d):
                if not au.crc_ok:
                    n_bad += 1
                    continue
                n_aus += 1
                if pad is not None:
                    show(pad.feed_dabplus_au(au.data))
                out.write(adts_wrap(au.data, dec.config)
                          if args.adts else au.data)
        log.info("wrote %d AAC AUs (%d failed CRC); stats=%s",
                 n_aus, n_bad, dec.stats)
    if pad is not None:
        pad.flush()
        if args.labels:
            log.info("DLS stats: %s", pad.dls.stats)
        if args.slides is not None:
            import pathlib
            outdir = pathlib.Path(args.slides)
            outdir.mkdir(parents=True, exist_ok=True)
            for i, obj in enumerate(pad.objects):
                name = obj.name or f"slide_{obj.transport_id}"
                path = outdir / f"{i:03d}_{name}"
                path.write_bytes(obj.body)
                log.info("MOT object: %s (%d bytes, type %d/%d)",
                         path, len(obj.body), obj.content_type, obj.subtype)
            log.info("MOT stats: %s", pad.mot.stats)
    out.flush()
    if args.output != "-":
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
