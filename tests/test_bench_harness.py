"""Unit tests for bench.py's fault-tolerance harness (VERDICT r3 item
2: one relay hiccup must not erase the round's perf record)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import Watchdog, resolve_bw, run_section  # noqa: E402


def test_run_section_retries_transient_error():
    out = {}
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("FAILED_PRECONDITION: relay sneeze")
        return 42

    val = run_section(out, "flaky", flaky, watchdog=None, retries=2,
                      sleep_s=0.0)
    assert val == 42
    assert calls["n"] == 3
    assert len(out["errors"]) == 2


def test_run_section_exhausts_and_continues():
    out = {}

    def dead():
        raise RuntimeError("always down")

    val = run_section(out, "dead", dead, watchdog=None, retries=1,
                      sleep_s=0.0)
    assert val is None
    assert len(out["errors"]) == 2
    # the harness keeps going: a later section still runs
    assert run_section(out, "ok", lambda: 7, None) == 7


def test_watchdog_emits_on_hang():
    out = {"metric": "m", "value": None}
    emitted = []
    exited = []
    wd = Watchdog(out, emit=lambda o: emitted.append(json.dumps(o)),
                  exit_fn=lambda: exited.append(True))
    wd.arm("hang", 0.6)
    deadline = time.time() + 10
    while not exited and time.time() < deadline:
        time.sleep(0.1)
    wd.stop()
    assert exited, "watchdog never fired"
    parsed = json.loads(emitted[0])
    assert parsed["metric"] == "m"
    assert any("deadline" in e for e in parsed["errors"])


def test_watchdog_disarm_prevents_fire():
    out = {}
    exited = []
    wd = Watchdog(out, emit=lambda o: None,
                  exit_fn=lambda: exited.append(True))
    wd.arm("quick", 0.6)
    wd.disarm()
    time.sleep(1.5)
    wd.stop()
    assert not exited


def test_resolve_bw_measured_ok(tmp_path):
    out = {}
    cache = str(tmp_path / "bw.json")
    bw = resolve_bw(lambda: 370.0, 819.0, out, cache_path=cache)
    assert bw == 370.0
    assert out["bw_source"] == "measured"
    assert json.load(open(cache))["bw_gbps"] == 370.0


def test_resolve_bw_rejects_degraded_and_uses_cache(tmp_path):
    cache = str(tmp_path / "bw.json")
    json.dump({"bw_gbps": 365.0, "time": 0}, open(cache, "w"))
    out = {}
    # 77 GB/s = the observed relay-degradation value (NOTES_R3)
    bw = resolve_bw(lambda: 77.0, 819.0, out, cache_path=cache)
    assert bw == 365.0
    assert out["bw_source"] == "cached"
    assert out["bw_measured_rejected_gbps"] == 77.0


def test_resolve_bw_raise_falls_back_to_nominal_fraction(tmp_path):
    out = {}

    def boom():
        raise RuntimeError("FAILED_PRECONDITION")

    bw = resolve_bw(boom, 819.0, out,
                    cache_path=str(tmp_path / "none.json"))
    assert abs(bw - 0.45 * 819.0) < 1e-6
    assert out["bw_source"] == "nominal_fraction"
    assert out["errors"]
