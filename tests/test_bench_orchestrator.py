"""Orchestrator behavior under permanent bad weather (VERDICT r4 item 1).

Four rounds of driver artifacts were config-1-only because a run whose
windows were all bad could report nothing.  These tests pin the r5
contract without touching any device: the headline replays from the
evidence ledger with an explicit provenance field, the previous
partial log is ROTATED (never truncated), and a truly empty ledger
still exits with the no-number code.
"""

import json
import os

import pytest

import bench


@pytest.fixture
def isolated_bench(tmp_path, monkeypatch):
    """Redirect every bench artifact path into tmp and neutralize the
    device/relay touchpoints (probe subprocesses, budgets)."""
    part = tmp_path / "BENCH_PARTIAL.log"
    led = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "_PARTIAL_PATH", str(part))
    monkeypatch.setattr(bench, "_LEDGER_PATH", str(led))
    # JAX_PLATFORMS unset => the TPU-run code paths (rotation, ledger
    # writes) are live; the probe/wait budgets are zeroed so nothing
    # ever probes the relay from inside the test suite.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("DABTOOLS_WEATHER_WAIT", "0")
    monkeypatch.setenv("DABTOOLS_HEADLINE_BUDGET", "0")
    monkeypatch.setattr(bench, "_probe_ok", lambda probe=None: False)
    return part, led


def _seed_headline(led):
    line = json.dumps({
        "metric": "realtime_multiple_full_ensemble_per_chip",
        "value": 523.53, "unit": "x_realtime_2.048Msps",
        "vs_baseline": 523.53,
        "weather": "[weather rtt=27ms chain-agree=98% fetch-ok]"})
    led.write_text(json.dumps({
        "ts": "2026-08-20T14:00:23", "key": "headline-16f",
        "line": line, "fingerprint": "acs=shuffle,tb=factored,ragged=on",
    }) + "\n")


def test_headline_replays_from_ledger_when_no_window(
        isolated_bench, monkeypatch, capsys):
    part, led = isolated_bench
    _seed_headline(led)
    monkeypatch.setattr("sys.argv", ["bench.py", "--quick"])
    bench.orchestrate()
    out = capsys.readouterr().out
    parsed = json.loads(out.strip().splitlines()[-1])
    assert parsed["value"] == 523.53
    assert parsed["metric"] == "realtime_multiple_full_ensemble_per_chip"
    # the replay is labeled, never passed off as a live measurement
    assert "cached capture 2026-08-20T14:00:23" in parsed["provenance"]
    assert "no good relay window" in parsed["provenance"]


def test_empty_ledger_still_exits_without_number(
        isolated_bench, monkeypatch, capsys):
    part, led = isolated_bench
    monkeypatch.setattr("sys.argv", ["bench.py", "--quick"])
    with pytest.raises(SystemExit) as e:
        bench.orchestrate()
    assert e.value.code == 2
    # nothing json-shaped reached stdout
    assert "{" not in capsys.readouterr().out


def test_partial_log_rotates_never_truncates(
        isolated_bench, monkeypatch, capsys):
    part, led = isolated_bench
    _seed_headline(led)
    part.write_text("2026-08-20T09:00:00 # [kernel] precious capture\n")
    monkeypatch.setattr("sys.argv", ["bench.py", "--quick"])
    bench.orchestrate()
    archived = list((part.parent / "logs").glob("bench-*.log"))
    assert len(archived) == 1
    assert "precious capture" in archived[0].read_text()
    # the fresh log holds only this run's header
    assert "precious capture" not in part.read_text()
    assert "bench run start" in part.read_text()


def test_startup_recap_replays_ledger_before_any_device_touch(
        isolated_bench, monkeypatch, capsys):
    part, led = isolated_bench
    _seed_headline(led)
    with open(led, "a") as f:
        f.write(json.dumps({
            "ts": "2026-08-20T11:56:10",
            "key": "kernel: batched FFT-2048 x1216",
            "line": "# [kernel] batched FFT-2048 x1216: 185 us",
            "fingerprint": "acs=shuffle,tb=factored,ragged=on"}) + "\n")
    monkeypatch.setattr("sys.argv", ["bench.py", "--quick"])
    bench.orchestrate()
    err = capsys.readouterr().err
    assert "cached captures from the ledger" in err
    assert "batched FFT-2048" in err
    assert "cached capture from 2026-08-20T11:56:10" in err
