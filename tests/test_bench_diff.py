"""The bench regression gate's classification logic (tools/bench_diff.py):
pure-function tests over synthetic timing maps — no Spark session."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_diff",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py"),
)
bench_diff = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_diff)


def test_flags_real_regression():
    old = {"q_a": 1.0}
    new = {"q_a": 3.0}
    rep = bench_diff.diff(old, new, steady={"q_a": 1.0})
    assert rep["n_regressions"] == 1
    assert rep["regressions"][0]["query"] == "q_a"
    assert not rep["regressions"][0]["excused_by_family"]


def test_noise_floor_ignores_subsecond_jitter():
    # 0.1 s -> 0.4 s is a 4x ratio but under the 1 s absolute floor
    rep = bench_diff.diff({"q_a": 0.1}, {"q_a": 0.4}, steady={})
    assert rep["n_regressions"] == 0 and not rep["regressions"]


def test_steady_state_floor_ignores_session_noise():
    # 3x over old but within 2x of the recorded fresh-JVM steady state
    rep = bench_diff.diff({"q_a": 1.0}, {"q_a": 3.0}, steady={"q_a": 2.0})
    assert rep["n_regressions"] == 0


def test_family_attribution_shift_excused_but_listed():
    fam = sorted(bench_diff.SHARED_SUBPLAN_FAMILY)
    a, b = fam[0], fam[1]
    # cost moved wholesale from a to b; family sum unchanged
    old = {a: 5.0, b: 0.5}
    new = {a: 0.5, b: 5.0}
    rep = bench_diff.diff(old, new, steady={})
    assert rep["family_sum_stable"]
    assert rep["n_regressions"] == 0
    listed = {r["query"]: r for r in rep["regressions"]}
    assert listed[b]["excused_by_family"]


def test_family_sum_growth_not_excused():
    fam = sorted(bench_diff.SHARED_SUBPLAN_FAMILY)
    a = fam[0]
    old = {a: 2.0}
    new = {a: 6.0}  # family sum itself tripled -> real regression
    rep = bench_diff.diff(old, new, steady={})
    assert rep["n_regressions"] == 1


def test_family_sum_uses_intersection_of_rounds():
    # a family member REMOVED this round must not shrink fam_new and
    # thereby excuse a real regression in a surviving member
    fam = sorted(bench_diff.SHARED_SUBPLAN_FAMILY)
    a, b = fam[0], fam[1]
    old = {a: 2.0, b: 10.0}
    new = {a: 6.0}  # b removed; a itself tripled — real regression
    rep = bench_diff.diff(old, new, steady={})
    assert not rep["family_sum_stable"]
    assert rep["n_regressions"] == 1
    # symmetric: a member ADDED this round must not inflate fam_new
    # and de-excuse a pure attribution shift between surviving members
    old2 = {a: 5.0}
    new2 = {a: 5.2, b: 9.0}  # b is new; a essentially unchanged
    rep2 = bench_diff.diff(old2, new2, steady={})
    assert rep2["family_sum_stable"]
    assert rep2["n_regressions"] == 0
    assert rep2["new_queries"] == [b]


def test_added_and_removed_queries_reported():
    rep = bench_diff.diff({"q_old": 1.0}, {"q_new": 1.0}, steady={})
    assert rep["new_queries"] == ["q_new"]
    assert rep["removed_queries"] == ["q_old"]
    assert rep["n_pairs"] == 0


def test_host_scale_median_and_floor(monkeypatch):
    """_host_scale returns the MEDIAN sentinel fresh/steady ratio,
    floored at 1.0 (a fast box never deflates the gate), and skips
    sentinels without steady entries."""
    readings = {"q_filter": 0.30, "q_tpch_q6": 0.78, "q_project_rekey": 0.25}
    monkeypatch.setattr(
        bench_diff, "_fresh_single", lambda q, sf: readings[q]
    )
    steady = {"q_filter": 0.10, "q_tpch_q6": 0.26, "q_project_rekey": 0.10}
    scale, out = bench_diff._host_scale(steady, "ignored")
    assert abs(scale - 3.0) < 1e-9 and set(out) == set(readings)
    # fast box: ratios < 1 clamp to 1.0
    monkeypatch.setattr(bench_diff, "_fresh_single", lambda q, sf: 0.01)
    scale, _ = bench_diff._host_scale(steady, "ignored")
    assert scale == 1.0
    # missing steady entries are skipped, not divided by zero
    scale, out = bench_diff._host_scale({"q_filter": 0.0}, "ignored")
    assert scale == 1.0 and out == {}
