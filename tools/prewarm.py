"""Prewarm the persistent compilation cache with GOOD executables.

The TPU relay on this machine serves differently-optimized executables
per fresh compile (measured 2-16x sustained-perf spread) and fails all
fresh compiles during bad windows.  [[utils/jitcache.py]] pins whatever
executable compiled first; this tool makes sure what gets pinned is a
good one:

1. Headline lottery: repeatedly wipe the headline program's cache entry,
   recompile in a fresh process, measure, and keep the fastest candidate.
2. Section sweep: run every bench section once so all their programs are
   cached (a later run — e.g. the driver's round-end bench — then needs
   no fresh compiles at all).

Usage: python tools/prewarm.py [--rounds N] [--target RT] [--skip-sections]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
CACHE = REPO / ".jax_cache"
# the headline measurement runs BOTH the per-block program and the
# device-chained scan wrapper; the lottery must re-roll both
HEADLINE_GLOB = ("jit_process_block-*", "jit_step_scan-*")


def measure_headline(timeout: int = 600, n_frames: int = 16) -> float | None:
    """One fresh-process headline measurement (compiles if not cached)."""
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), str(n_frames),
             "--quick", "--once"],
            capture_output=True, text=True, timeout=timeout, cwd=REPO)
        line = r.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["value"])
    except Exception as e:  # noqa: BLE001
        print(f"  measurement failed: {str(e)[:100]}", flush=True)
        return None


def headline_entries() -> list[pathlib.Path]:
    return [pathlib.Path(p) for pat in HEADLINE_GLOB
            for p in glob.glob(str(CACHE / pat))]


def lottery(rounds: int, target: float) -> bool:
    """Returns True iff at least one measurement succeeded (a good
    executable is pinned).

    Round 0 measures the INCUMBENT cached executable (no wipe): the
    entry pinned by a previous lottery may already be the best draw
    seen (r4's pinned program measured 524x), and wiping it before the
    first roll gambled a known-good program on fresh-compile luck."""
    best_rt, best_files = -1.0, {}
    stash = REPO / ".jax_cache" / ".best_headline"

    def stash_current(rt):
        nonlocal best_rt, best_files
        best_rt = rt
        shutil.rmtree(stash, ignore_errors=True)
        stash.mkdir(parents=True)
        best_files = {p.name: stash / p.name for p in headline_entries()}
        for p in headline_entries():
            shutil.copy2(p, stash / p.name)

    if headline_entries():
        rt = measure_headline()
        print(f"incumbent executable: {rt and round(rt)}x", flush=True)
        if rt is not None:
            stash_current(rt)
        if best_rt >= target:
            rounds = 0
    for i in range(rounds):
        for p in headline_entries():
            p.unlink()
        rt = measure_headline()
        print(f"round {i + 1}/{rounds}: {rt and round(rt)}x", flush=True)
        if rt is None:
            continue
        if rt > best_rt:
            stash_current(rt)
        if best_rt >= target:
            break
    # pin the best candidate
    if best_files:
        for p in headline_entries():
            p.unlink()
        for name, src in best_files.items():
            shutil.copy2(src, CACHE / name)
        print(f"pinned best executable: {best_rt:.0f}x", flush=True)
        return True
    print("no successful measurement; cache left as-is", flush=True)
    return False


def sweep_sections() -> None:
    # import bench's section list so prewarm can't drift from it
    sys.path.insert(0, str(REPO))
    from bench import SECTIONS, _probe_ok
    # The batched (8-stream vmapped receiver) and mixedmux (full
    # DabReceiver over the 6xEEP+UEP+DAB+ mix) programs are the biggest
    # compiles in the repo; both timed out at 600 s on their only r4
    # cold-cache attempts (2026-08-20 06:21 sweep) and so never reached
    # any artifact.  The sweep runs in background windows — give the
    # cold compile the time it needs; once cached, bench children fly.
    sweep_timeout = {"batched": 1500, "mixedmux": 1500, "channelizer": 900}
    for sec in SECTIONS:
        # Gate each section on weather (up to ~7 min of waiting): a
        # section timeout burned inside a bad window caches nothing,
        # and the sweep's whole job is populating the cache.
        for _ in range(3):
            if _probe_ok():
                break
            print(f"section {sec}: waiting out a bad window", flush=True)
            time.sleep(60)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, str(REPO / "bench.py"), "--section", sec],
                capture_output=True, text=True,
                timeout=sweep_timeout.get(sec, 600), cwd=REPO)
            if r.returncode == 0:
                ok = "ok"
            else:
                from bench import child_error_summary
                ok = child_error_summary(r.stderr, r.returncode)
        except subprocess.TimeoutExpired:
            ok = "timeout"
        print(f"section {sec}: {ok} ({time.time() - t0:.0f}s)", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--target", type=float, default=7000.0,
                    help="stop the lottery once this x-real-time is pinned")
    ap.add_argument("--skip-sections", action="store_true")
    args = ap.parse_args()
    os.makedirs(CACHE, exist_ok=True)
    pinned = lottery(args.rounds, args.target)
    # config 1b's big-block programs: the relay's compile helper rejects
    # them flat on bad days (7/7 in r01) — cache them while the sun shines.
    # 64 only: bench's queue runs 16- and 64-frame children; warming a
    # 32-frame program spent up to 1500 s of window on nothing.
    for nf in (64,):
        # big-block programs compile for minutes through the relay's
        # compile helper even in good windows; give them room
        rt = measure_headline(timeout=1500, n_frames=nf)
        print(f"{nf}-frame program: {rt and round(rt)}x", flush=True)
    if not args.skip_sections:
        sweep_sections()
    # A lottery with zero successful measurements did NOT do prewarm's
    # job (the driver/bench children would pay fresh-compile costs and
    # run whatever executable luck serves).  Exit nonzero so callers
    # that loop on stage success (tools/grind_round.sh) retry it.
    return 0 if pinned else 2


if __name__ == "__main__":
    sys.exit(main())
