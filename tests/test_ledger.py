"""Cross-run evidence ledger (bench.py; VERDICT r4 item 1).

Host-only: exercises key derivation, best-per-section selection, and
the recap's ledger replay, with the ledger/partial-log paths redirected
to a tmp dir.  No device involvement.
"""

import json

import bench


def test_ledger_key_result_lines():
    k = bench._ledger_key(
        "# [config 1] full-ensemble decode (16-frame): 2.93 ms/block "
        "(sustained), 1072 Msamples/s, 524x real-time [weather ...]")
    assert k == "config 1: full-ensemble decode (16-frame)"
    # 64-frame blocks land under a distinct key
    k64 = bench._ledger_key(
        "# [config 1] full-ensemble decode (64-frame): 14.02 ms/block ...")
    assert k64 != k
    # distinct kernel lines sharing the [kernel] tag get distinct keys
    ka = bench._ledger_key(
        "# [kernel] Viterbi[pallas-radix4] (576x3078) sustained: 2.70 ms")
    kb = bench._ledger_key(
        "# [kernel] Viterbi[pallas-radix4] ACS only (traceback DCEd): ...")
    kc = bench._ledger_key("# [kernel] batched FFT-2048 x1216: 185 us")
    assert len({ka, kb, kc}) == 3


def test_ledger_key_rejects_non_results():
    bad = [
        "# [mixedmux] SKIPPED (timeout)",
        "# [kernels] failed (rc=1: ...); re-queued (2 tries left)",
        "# [e2e] first-fetch warmup took 281s (relay stall)",
        "# relay in a bad window (probe failed x3); waiting",
        "# [closedloop-timing] INCONCLUSIVE (control 0.1 ms vs 0.1 ms)",
        "# [config 1] per-process spread (16-frame): [392, 382]",
        "# [mixedmux] TPU decode: MISMATCH (0/33 frames)",
        "# device: TPU v5 lite",
        "plain text",
    ]
    for msg in bad:
        assert bench._ledger_key(msg) is None, msg


def test_ledger_best_prefers_good_weather(tmp_path, monkeypatch):
    led = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "_LEDGER_PATH", str(led))
    rows = [
        {"ts": "2026-08-20T10:00:00", "key": "k",
         "line": "# [k] old good [weather fetch-ok]"},
        {"ts": "2026-08-20T11:00:00", "key": "k",
         "line": "# [k] newer but DEGRADED [weather DEGRADED]"},
        {"ts": "2026-08-20T09:00:00", "key": "j",
         "line": "# [j] only entry"},
    ]
    led.write_text("".join(json.dumps(r) + "\n" for r in rows))
    best = bench._ledger_best()
    # a DEGRADED line must not displace an earlier good capture
    assert "old good" in best["k"]["line"]
    assert "only entry" in best["j"]["line"]
    # ...but a newer good capture supersedes an older good one
    rows.append({"ts": "2026-08-20T12:00:00", "key": "k",
                 "line": "# [k] newest good [weather fetch-ok]"})
    led.write_text("".join(json.dumps(r) + "\n" for r in rows))
    assert "newest good" in bench._ledger_best()["k"]["line"]


def test_recap_replays_ledger_for_missing_sections(tmp_path, monkeypatch,
                                                   capsys):
    led = tmp_path / "ledger.jsonl"
    part = tmp_path / "partial.log"
    monkeypatch.setattr(bench, "_LEDGER_PATH", str(led))
    monkeypatch.setattr(bench, "_PARTIAL_PATH", str(part))
    live = ("# [config 1] full-ensemble decode (16-frame): 2.93 ms/block "
            "live-line 524x real-time")
    part.write_text(f"2026-08-20T14:00:00 {live}\n")
    cached_line = "# [mixedmux] TPU decode of 6xEEP + UEP + DAB+: BIT-EXACT"
    led.write_text(json.dumps({
        "ts": "2026-08-19T08:00:00",
        "key": bench._ledger_key(cached_line),
        "line": cached_line, "fingerprint": "acs=shuffle,tb=factored",
    }) + "\n" + json.dumps({
        "ts": "2026-08-19T09:00:00",
        "key": "config 1: full-ensemble decode (16-frame)",
        "line": "# [config 1] full-ensemble decode (16-frame): STALE",
    }) + "\n")
    bench._recap()
    err = capsys.readouterr().err
    # the live line prints verbatim; its stale ledger twin must NOT
    assert live in err
    assert "STALE" not in err
    # the missing section's capture replays WITH provenance label
    assert cached_line in err
    assert "cached capture from 2026-08-19T08:00:00" in err
    assert "acs=shuffle,tb=factored" in err


def test_ledger_append_and_log_hook(tmp_path, monkeypatch):
    led = tmp_path / "ledger.jsonl"
    part = tmp_path / "partial.log"
    monkeypatch.setattr(bench, "_LEDGER_PATH", str(led))
    monkeypatch.setattr(bench, "_PARTIAL_PATH", str(part))
    # CPU guard: bench CPU smoke runs always set JAX_PLATFORMS=cpu (the
    # same convention that redirects _PARTIAL_PATH to /tmp), and log()
    # must NOT ledger their result lines (not evidence)...
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.log("# [config 2] device RS(120,110): 123 codewords/s")
    assert not led.exists()
    # ...but the partial log still records them
    assert "config 2" in part.read_text()
    # with the CPU guard lifted, the same line IS ledgered
    monkeypatch.setenv("JAX_PLATFORMS", "")
    bench.log("# [config 2] device RS(120,110): 456 codewords/s")
    entry = json.loads(led.read_text())
    assert entry["key"].startswith("config 2")
    assert "456" in entry["line"]
    assert "acs=" in entry["fingerprint"]
