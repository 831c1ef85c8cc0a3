"""Bench driver budget discipline: fair-share config scheduling.

The r4 run-4 record lost ALL six configs to budget skips because one
degraded-tunnel deskew child (plus its stall retry) consumed the whole
remaining budget. These tests drive ``bench.main`` with a faked clock
and a faked ``_run_child`` to pin the scheduler contract:

- healthy children -> all six configs populated, canonical order;
- two pathological configs that always time out -> every OTHER config
  still lands, and the run finishes inside the budget.
"""

from __future__ import annotations

import importlib.util
import json
import time
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", ROOT / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # No real persistent-cache config churn during the test.
    monkeypatch.setattr(mod, "_enable_cache", lambda: None)
    # Keep the last-good record out of the repo root during tests.
    monkeypatch.setattr(mod, "_LAST_GOOD", tmp_path / "BENCH_LAST_GOOD.json")
    return mod


class FakeClock:
    def __init__(self):
        self.now = 1000.0

    def monotonic(self):
        return self.now

    def sleep(self, s):
        self.now += s


def _fake_run_child(clock, config_cost, geom_cost=None):
    """config_cost: name -> seconds (float) or 'timeout'.

    ``geom_cost``: optional geometry-string -> 'timeout' for headline
    children (default: every geometry measures).
    """

    def run_child(args, timeout):
        if timeout <= 0:
            return None, False
        if args[0] == "--probe":
            clock.now += 2.0
            return {"alive": True, "platform": "cpu"}, False
        if args[0] == "--geom":
            if geom_cost and geom_cost.get(args[1]) == "timeout":
                clock.now += timeout
                return None, True
            clock.now += 50.0
            return {"vox_per_s": 8.39e8, "out_shape": [128, 2888, 1600]}, False
        if args[0] == "--geom-accel":
            clock.now += 50.0
            return {"vox_per_s": 1.1e9, "out_shape": [128, 2888, 1600]}, False
        if args[0] == "--parity":
            clock.now += 30.0
            return {"parity_err": 1.5e-07}, False
        assert args[0] == "--config"
        cost = config_cost[args[1]]
        if isinstance(cost, list):  # per-call schedule (pops front)
            cost = cost.pop(0) if len(cost) > 1 else cost[0]
        if cost == "timeout":
            clock.now += timeout
            return None, True
        if cost > timeout:
            clock.now += timeout
            return None, True
        clock.now += cost
        return {"name": args[1], "gvox_per_s": 1.0}, False

    return run_child


def _run_main(
    bench, monkeypatch, capsys, config_cost, budget=900.0, geom_cost=None
):
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    monkeypatch.setattr(
        bench, "_run_child", _fake_run_child(clock, config_cost, geom_cost)
    )
    monkeypatch.setenv("BENCH_BUDGET_S", str(budget))
    t0 = clock.now
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    return lines, clock.now - t0


CANONICAL = [
    "deskew", "rl20", "accel", "register", "plate", "replay", "nonsep",
    "nonsep_hybrid", "nonsep_hybrid_accel",
]


def test_healthy_run_populates_all_configs(bench, monkeypatch, capsys):
    lines, elapsed = _run_main(
        bench, monkeypatch, capsys, {name: 20.0 for name in CANONICAL}
    )
    final = lines[-1]
    assert final["value"] == pytest.approx(0.8394, abs=1e-3)
    assert final["parity_err"] == pytest.approx(1.5e-07)
    assert final["rl20_equivalent"]["gvox_per_s"] == pytest.approx(1.1)
    assert [c["name"] for c in final["configs"]] == CANONICAL
    assert all("gvox_per_s" in c for c in final["configs"])
    assert elapsed < 900.0


def test_child_flags_cover_every_child_main_branch(bench):
    """EVERY argv[0] branch of _child_main must be in CHILD_FLAGS: a
    flag handled there but missing from the __main__ dispatch makes
    the child recursively run the FULL driver (the r3 'tunnel down'
    null record, and again with --geom-accel in r4)."""
    import inspect
    import re

    src = inspect.getsource(bench._child_main)
    branches = set(re.findall(r'argv\[0\] == "(--[\w-]+)"', src))
    assert branches, "dispatch pattern changed; update this test"
    assert branches == set(bench.CHILD_FLAGS)


def test_degraded_children_cannot_starve_other_configs(
    bench, monkeypatch, capsys
):
    cost = {name: 20.0 for name in CANONICAL}
    cost["deskew"] = "timeout"  # both variants + retry all hang
    cost["nonsep"] = "timeout"
    lines, elapsed = _run_main(bench, monkeypatch, capsys, cost)
    final = lines[-1]
    assert [c["name"] for c in final["configs"]] == CANONICAL
    by_name = {c["name"]: c for c in final["configs"]}
    for name in ("rl20", "register", "plate", "replay"):
        assert "gvox_per_s" in by_name[name], by_name[name]
    for name in ("deskew", "nonsep"):
        assert "gvox_per_s" not in by_name[name]
    assert elapsed < 900.0
    # Insurance lines preceded the final record.
    assert len(lines) >= 3
    assert lines[0]["configs"] == []


def test_second_chance_pass_recovers_transient_failures(
    bench, monkeypatch, capsys
):
    """A config that times out during its fair share (transient tunnel
    degradation) must be retried with the leftover budget — r4 run-4
    lost deskew+register this way while 300+ s went unused."""
    cost = {name: 20.0 for name in CANONICAL}
    # register: its main-pass attempt burns the whole 90 s share
    # (so no in-share stall retry fires), then the tunnel recovers
    # for the second-chance pass.
    cost["register"] = ["timeout", 20.0]
    lines, elapsed = _run_main(bench, monkeypatch, capsys, cost)
    final = lines[-1]
    by_name = {c["name"]: c for c in final["configs"]}
    assert "gvox_per_s" in by_name["register"]
    assert elapsed < 900.0


def test_complete_run_persists_last_good_record(bench, monkeypatch, capsys):
    lines, _ = _run_main(
        bench, monkeypatch, capsys, {name: 20.0 for name in CANONICAL}
    )
    saved = json.loads(bench._LAST_GOOD.read_text())
    assert saved["value"] == lines[-1]["value"]
    assert [c["name"] for c in saved["configs"]] == CANONICAL
    assert "measured_at_utc" in saved
    assert "stale" not in saved


def test_degraded_run_does_not_clobber_complete_cache(
    bench, monkeypatch, capsys
):
    """r4 run 7: headline measured but every config child timed out.
    Such a run must NOT overwrite a complete cached record (it only
    survived in r4 because that run predated the cache code)."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.8387,
        "unit": "GVox/s",
        "vs_baseline": 0.8387,
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    lines, _ = _run_main(
        bench, monkeypatch, capsys,
        {name: "timeout" for name in CANONICAL},
    )
    final = lines[-1]
    # The live (degraded) record is still what this run reports...
    assert final["value"] == pytest.approx(0.8394, abs=1e-3)
    assert all("gvox_per_s" not in c for c in final["configs"])
    # ...but the complete cache survives for the next outage replay.
    saved = json.loads(bench._LAST_GOOD.read_text())
    assert saved["value"] == 0.8387
    assert all("gvox_per_s" in c for c in saved["configs"])


def test_equally_complete_run_refreshes_cache(bench, monkeypatch, capsys):
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.5,
        "unit": "GVox/s",
        "vs_baseline": 0.5,
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    lines, _ = _run_main(
        bench, monkeypatch, capsys, {name: 20.0 for name in CANONICAL}
    )
    saved = json.loads(bench._LAST_GOOD.read_text())
    assert saved["value"] == lines[-1]["value"] != 0.5


def test_fallback_geometry_run_does_not_clobber_production_cache(
    bench, monkeypatch, capsys
):
    """r4 run 10: the production-geometry headline child timed out and
    the headline fell back to (1201, 256, 800) — but the tunnel then
    recovered and every config measured. Such a run ties a complete
    production-geometry record on config count, and must still NOT
    overwrite it: the fallback headline is a degraded measurement, not
    a regression."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.8387,
        "unit": "GVox/s",
        "vs_baseline": 0.8387,
        "raw_shape": list(bench.GEOMETRIES[0]),
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    prod = ",".join(map(str, bench.GEOMETRIES[0]))
    # Budget roomy enough that every config still measures after the
    # two production-geometry timeouts — the completeness tie is the
    # point of the test.
    lines, _ = _run_main(
        bench, monkeypatch, capsys,
        {name: 20.0 for name in CANONICAL},
        budget=1800.0,
        geom_cost={prod: "timeout"},
    )
    final = lines[-1]
    # The live run reports its own (fallback-geometry) measurement...
    assert tuple(final["raw_shape"]) == bench.GEOMETRIES[1]
    assert len([c for c in final["configs"] if "gvox_per_s" in c]) == len(
        CANONICAL
    )
    # ...but the production-geometry cache survives.
    saved = json.loads(bench._LAST_GOOD.read_text())
    assert saved["value"] == 0.8387
    assert tuple(saved["raw_shape"]) == bench.GEOMETRIES[0]


def test_production_geometry_rerun_refreshes_fallback_cache(
    bench, monkeypatch, capsys
):
    """The mirror case: a production-geometry complete run must
    replace a cached fallback-geometry record of equal config count."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.7839,
        "unit": "GVox/s",
        "vs_baseline": 0.7839,
        "raw_shape": list(bench.GEOMETRIES[1]),
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    lines, _ = _run_main(
        bench, monkeypatch, capsys, {name: 20.0 for name in CANONICAL}
    )
    saved = json.loads(bench._LAST_GOOD.read_text())
    assert saved["value"] == lines[-1]["value"] != 0.7839
    assert tuple(saved["raw_shape"]) == bench.GEOMETRIES[0]


def test_dead_probe_replays_last_good_record(bench, monkeypatch, capsys):
    """A tunnel outage at driver time must not null the round's record
    when a complete measurement exists from earlier in the round."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.8394,
        "unit": "GVox/s",
        "vs_baseline": 0.8394,
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)

    def dead_child(args, timeout):
        clock.now += max(timeout, 0.0)
        return None, True

    monkeypatch.setattr(bench, "_run_child", dead_child)
    monkeypatch.setenv("BENCH_BUDGET_S", "900")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert final["stale"] is True
    assert final["value"] == pytest.approx(0.8394)
    assert "2026-08-19T12:00:00Z" in final["error"]
    assert [c["name"] for c in final["configs"]] == CANONICAL


def test_congested_tunnel_probes_fail_but_headline_measures(
    bench, monkeypatch, capsys
):
    """Probes timing out while real children succeed (measured
    2026-08-20: killed clients' compiles queue server-side ahead of new
    probes) must yield a FRESH record via the last-chance headline
    child, not a stale replay."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.5,
        "unit": "GVox/s",
        "vs_baseline": 0.5,
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    healthy = _fake_run_child(clock, {name: 20.0 for name in CANONICAL})

    def congested_child(args, timeout):
        if args[0] == "--probe":
            clock.now += max(timeout, 0.0)
            return None, True
        return healthy(args, timeout)

    monkeypatch.setattr(bench, "_run_child", congested_child)
    monkeypatch.setenv("BENCH_BUDGET_S", "1500")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert "stale" not in final
    assert final["value"] == pytest.approx(0.839)
    assert final["raw_shape"] == list(bench.GEOMETRIES[0])


def test_last_chance_headline_child_gets_the_stall_retry(
    bench, monkeypatch, capsys
):
    """A congested tunnel can also time out the FIRST last-chance
    headline child (its compile queues behind the killed probes'); with
    budget left, the same compile-queue-stall retry every other child
    path gets must run — a big-budget watcher run must not go stale
    with hundreds of seconds unused (r5 review finding)."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.5,
        "unit": "GVox/s",
        "vs_baseline": 0.5,
        "parity_err": 1.5e-07,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    healthy = _fake_run_child(clock, {name: 20.0 for name in CANONICAL})
    geom_calls = {"n": 0}

    def congested_child(args, timeout):
        if args[0] == "--probe":
            clock.now += max(timeout, 0.0)
            return None, True
        if args[0] == "--geom":
            geom_calls["n"] += 1
            if geom_calls["n"] == 1:  # stalls behind the probes' queue
                clock.now += timeout
                return None, True
        return healthy(args, timeout)

    monkeypatch.setattr(bench, "_run_child", congested_child)
    monkeypatch.setenv("BENCH_BUDGET_S", "2400")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert geom_calls["n"] == 2  # the retry ran
    assert "stale" not in final
    assert final["value"] == pytest.approx(0.839)


def test_rl20_equivalent_carried_forward_when_accel_child_fails(
    bench, monkeypatch, capsys
):
    """A fresh 9-ok-config record whose geom-accel child failed must
    not silently drop the cached rl20_equivalent figure: the save path
    carries it forward, marked with the run it came from, and the
    carried field ranks below a freshly measured one in completeness."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.8391,
        "unit": "GVox/s",
        "vs_baseline": 0.8391,
        "raw_shape": list(bench.GEOMETRIES[0]),
        "parity_err": 1.5e-07,
        "rl20_equivalent": {"gvox_per_s": 1.1092, "iterations": 10},
        "configs": [
            {"name": n, "gvox_per_s": 1.0} for n in CANONICAL[:7]
        ],
        "measured_at_utc": "2026-08-20T04:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    healthy = _fake_run_child(clock, {name: 20.0 for name in CANONICAL})

    def accel_fails(args, timeout):
        if args[0] == "--geom-accel":
            clock.now += max(timeout, 0.0)
            return None, True
        return healthy(args, timeout)

    monkeypatch.setattr(bench, "_run_child", accel_fails)
    monkeypatch.setenv("BENCH_BUDGET_S", "2400")
    bench.main()
    capsys.readouterr()
    saved = json.loads(bench._LAST_GOOD.read_text())
    ok = [
        c for c in saved["configs"]
        if "error" not in c and "skipped" not in c
    ]
    assert len(ok) == len(CANONICAL)  # the fresh record superseded
    eq = saved["rl20_equivalent"]
    assert eq["gvox_per_s"] == pytest.approx(1.1092)
    assert eq["carried_from"] == "2026-08-20T04:00:00Z"
    # A carried figure ranks below a freshly measured one.
    assert bench._completeness(saved)[-1] == 0
    assert bench._completeness(cached)[-1] == 1


def test_pacing_preserves_shares_across_a_degraded_stretch(
    bench, monkeypatch, capsys
):
    """Oscillating tunnel (r5, 2026-08-21): a ~20-min degraded stretch
    between healthy windows must not burn every config's fair share on
    timeouts — congestion pacing holds (sleep+probe) after two
    consecutive child timeouts, and the post-recovery window completes
    EVERY config plus the second-chance retries of the early burns."""
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    T0 = clock.now
    DEGRADE_FROM, RECOVER_AT = 140.0, 1400.0  # offsets from start

    def degraded(t):
        return DEGRADE_FROM <= (t - T0) < RECOVER_AT

    def oscillating_child(args, timeout):
        if timeout <= 0:
            return None, False
        if args[0] == "--probe":
            if degraded(clock.now):
                clock.now += timeout
                return None, True
            clock.now += 2.0
            return {"alive": True, "platform": "cpu"}, False
        if degraded(clock.now):
            clock.now += timeout
            return None, True
        if args[0] == "--geom":
            clock.now += 50.0
            return {"vox_per_s": 8.39e8, "out_shape": [128, 2888, 1600]}, False
        if args[0] == "--geom-accel":
            clock.now += 50.0
            return {"vox_per_s": 1.1e9, "out_shape": [128, 2888, 1600]}, False
        if args[0] == "--parity":
            clock.now += 30.0
            return {"parity_err": 1.5e-07}, False
        assert args[0] == "--config"
        clock.now += 20.0
        return {"name": args[1], "gvox_per_s": 1.0}, False

    monkeypatch.setattr(bench, "_run_child", oscillating_child)
    monkeypatch.setenv("BENCH_BUDGET_S", "2400")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    ok = [
        c for c in final["configs"]
        if "error" not in c and "skipped" not in c
    ]
    assert len(ok) == len(CANONICAL), final["configs"]
    assert final["value"] == pytest.approx(0.839)
    assert final["parity_err"] == pytest.approx(1.5e-07)


def test_dead_probe_without_cache_still_reports_null(
    bench, monkeypatch, capsys
):
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)
    monkeypatch.setattr(
        bench, "_run_child",
        lambda args, timeout: (clock.sleep(max(timeout, 0.0)), None, True)[1:],
    )
    monkeypatch.setenv("BENCH_BUDGET_S", "900")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert lines[-1]["value"] is None
    assert "tpu unreachable" in lines[-1]["error"]


def test_zero_headline_falls_back_to_last_good(bench, monkeypatch, capsys):
    """Probe alive but every geometry child fails (degraded tunnel):
    replay the cached complete record instead of a 0.0 headline."""
    cached = {
        "metric": "deskew+rl20 reconstruction throughput per chip",
        "value": 0.8394,
        "unit": "GVox/s",
        "vs_baseline": 0.8394,
        "configs": [{"name": n, "gvox_per_s": 1.0} for n in CANONICAL],
        "measured_at_utc": "2026-08-19T12:00:00Z",
    }
    bench._LAST_GOOD.write_text(json.dumps(cached))
    clock = FakeClock()
    monkeypatch.setattr(bench.time, "monotonic", clock.monotonic)
    monkeypatch.setattr(bench.time, "sleep", clock.sleep)

    def child(args, timeout):
        if timeout <= 0:
            return None, False
        if args[0] == "--probe":
            clock.now += 2.0
            return {"alive": True, "platform": "cpu"}, False
        clock.now += max(timeout, 0.0)
        return None, True

    monkeypatch.setattr(bench, "_run_child", child)
    monkeypatch.setenv("BENCH_BUDGET_S", "900")
    bench.main()
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    final = lines[-1]
    assert final["stale"] is True
    assert final["value"] == pytest.approx(0.8394)
    # The cache was not overwritten by the failed run.
    assert json.loads(bench._LAST_GOOD.read_text())["value"] == 0.8394


def test_tiny_budget_still_prints_a_record(bench, monkeypatch, capsys):
    lines, _ = _run_main(
        bench, monkeypatch, capsys,
        {name: 20.0 for name in CANONICAL}, budget=70.0,
    )
    final = lines[-1]
    # Probe fits, headline child gets the sub-70s remainder and
    # succeeds; configs are all budget-skipped but present.
    assert [c["name"] for c in final["configs"]] == CANONICAL
    assert all(c.get("skipped") == "budget" for c in final["configs"])
