"""tools/steady_refresh.py staleness logic — pure-function tests (no
Spark): the plan-string normalization that makes fingerprints stable
across sessions, and the stale/seed bookkeeping."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "steady_refresh",
    os.path.join(os.path.dirname(__file__), "..", "tools", "steady_refresh.py"),
)
steady_refresh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(steady_refresh)

_normalize = steady_refresh._normalize


def test_normalize_strips_expression_ids():
    a = _normalize("Project [doc_id#123L, text#45]")
    b = _normalize("Project [doc_id#9001L, text#7]")
    assert a == b


def test_normalize_strips_lambda_counters():
    # lambda variables carry a session-global counter (x_3 vs x_6 for
    # the same plan in two sessions) — observed round 8
    a = _normalize("transform(seq#1, lambdafunction(lambda x_3#2.x, lambda x_3#2, false))")
    b = _normalize("transform(seq#9, lambdafunction(lambda x_6#8.x, lambda x_6#8, false))")
    assert a == b


def test_normalize_strips_grouping_ids():
    a = _normalize("count(struct(g1)#1) FILTER (WHERE (gid#3 = 1))")
    b = _normalize("count(struct(g1)#7) FILTER (WHERE (gid#9 = 2))")
    assert a == b


def test_normalize_strips_rdd_and_paths():
    a = _normalize("Scan ExistingRDD[vec_id#1L,v#2] file:/root/testdata/sf0.001/x")
    b = _normalize("Scan ExistingRDD[s#7,code#8] file:/tmp/sf0.1x100u/x")
    assert a == b


def test_normalize_keeps_structural_differences():
    # different plans must still hash differently
    assert _normalize("SortMergeJoin [a#1], [b#2]") != _normalize(
        "BroadcastHashJoin [a#1], [b#2]"
    )
