"""Invariants for the iterative (non-SQL-expressible) clustering
operators: k-means nearest-centroid optimality + objective
monotonicity, SemDeDup agreement with brute force within its own
cells, and random-projection geometry."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.operators.clustering import (
    kmeans_fit,
    semdedup_pairs,
)
from kafka_streams_spring_cloud_stream_tp1_spark.operators.similarity import (
    random_projection,
    rp_sign_matrix,
)
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_CORRECT


def _unit_matrix(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    v = np.stack([np.asarray(r["embedding"], dtype=float) for r in rows])
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    return ids[order], v[order]


def test_kmeans_assignments_are_nearest_centroid(spark):
    """Every vector's label must be (within float tolerance) its
    argmax-cosine centroid — the defining property of the assignment
    step, robust to partial-sum association order."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    assign, cents = kmeans_fit(emb, k=8, iters=4)
    labels = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    ids, v = _unit_matrix(emb)
    sims = v @ cents.T
    for i, vid in enumerate(ids):
        got = sims[i, labels[vid]]
        best = sims[i].max()
        assert got >= best - 1e-9, f"vec {vid}: {got} < best {best}"


def test_kmeans_objective_improves_over_iterations(spark):
    """More Lloyd's iterations must not worsen the spherical k-means
    objective (mean cosine to the assigned centroid)."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    ids, v = _unit_matrix(emb)

    def objective(iters: int) -> float:
        _, cents = kmeans_fit(emb, k=8, iters=iters)
        return float((v @ cents.T).max(axis=1).mean())

    o1, o4 = objective(1), objective(4)
    assert o4 >= o1 - 1e-9, f"objective fell: {o1} -> {o4}"


def test_kmeans_deterministic(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    a1, _ = kmeans_fit(emb, k=8, iters=2)
    a2, _ = kmeans_fit(emb, k=8, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_k_larger_than_corpus_raises(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    with pytest.raises(ValueError, match="exceeds corpus"):
        kmeans_fit(emb.limit(3), k=8, iters=1)


def test_semdedup_matches_bruteforce_within_cells(spark):
    """SemDeDup's pairs must be EXACTLY the brute-force cosine pairs
    restricted to same-cluster endpoints (same threshold, same
    rounding) — the cluster pass changes the search space, never the
    math inside a cell."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    threshold = 0.4
    got = {
        (r["keep_id"], r["drop_id"], r["score"])
        for r in semdedup_pairs(emb, k=8, iters=4, threshold=threshold).collect()
    }
    assert got, "semdedup found no pairs on a corpus with known near-dups"
    assign, _ = kmeans_fit(emb, k=8, iters=4)
    labels = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    ids, v = _unit_matrix(emb)
    sims = v @ v.T
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if labels[ids[i]] == labels[ids[j]] and sims[i, j] >= threshold:
                want.add((int(ids[i]), int(ids[j]), round(float(sims[i, j]), 4)))
    assert got == want


def test_semdedup_custom_id_and_vec_cols(spark):
    """The advertised id_col/vec_col parameters must actually work
    (r02 advisor: the exact-verify side hardcoded vec_id and broke on
    renames): renamed columns give the identical pair set."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    renamed = emb.select(
        emb["vec_id"].alias("row_key"), emb["embedding"].alias("vec")
    )
    base = {
        (r["keep_id"], r["drop_id"], r["score"])
        for r in semdedup_pairs(emb, k=8, iters=2, threshold=0.4).collect()
    }
    got = {
        (r["keep_id"], r["drop_id"], r["score"])
        for r in semdedup_pairs(
            renamed, k=8, iters=2, threshold=0.4, vec_col="vec", id_col="row_key"
        ).collect()
    }
    assert got == base and base


def test_random_projection_shape_and_signs(spark):
    """The projected frame must equal a numpy recomputation from the
    same sign matrix (up to the 4-decimal rounding both apply), and
    the sign matrix itself must be stable across calls/salts."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    out = random_projection(emb, out_dim=8, in_dim=64).collect()
    signs = np.array(rp_sign_matrix(8, 64), dtype=float)
    assert rp_sign_matrix(8, 64) == rp_sign_matrix(8, 64)
    assert rp_sign_matrix(8, 64, salt="other") != rp_sign_matrix(8, 64)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=float) for r in rows}
    scale = 1.0 / np.sqrt(8)
    for r in out:
        want = signs @ vecs[r["vec_id"]] * scale
        got = np.array([r[f"p{j}"] for j in range(8)])
        assert np.allclose(got, want, atol=2e-4), r["vec_id"]
