"""Distributed clustering over embedding columns: full-corpus Lloyd's
k-means and SemDeDup-style semantic deduplication built on it.

The reference system has no vector surface (its value type is PageEvent
— reference: src/main/java/.../events/PageEvent.java:5); these extend
the engine for LLM-data workloads (SURVEY §8.3). Unlike
`similarity.ivf_index_centroids` (which trains a coarse quantizer on a
bounded driver-side SAMPLE, the FAISS recipe), this is exact Lloyd's
over the WHOLE corpus — the shape used when cluster assignments are a
product (semantic dedup, topic bucketing, curriculum binning), not
just an index.

Scale design (the per-iteration cost is ONE corpus scan):
- Centroids are tiny (k × dim doubles) and live on the driver between
  iterations, broadcast into the assignment pass via closure — the
  corpus is never collected and never shuffled for assignment.
- The centroid update does NOT explode vectors into (id, pos, value)
  rows (that would shuffle corpus × dim rows). Each Arrow batch emits
  k partial rows (cluster, count, sum-vector), so the shuffle carries
  O(batches × k) rows of dim-length arrays — independent of corpus
  row count — and the final per-cluster reduce folds arrays
  element-wise JVM-side.
- Assignment is cosine on unit vectors via one BLAS matmul per Arrow
  batch (vectorized; never a per-row Python loop).
- Determinism: init = the k lowest-id vectors, fixed iteration count,
  argmax ties resolved to the lowest cluster id. Same input ⇒ same
  labels under any partitioning (up to float-sum association in the
  partial reduce, which the tests bound).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double

if TYPE_CHECKING:
    import numpy as np
    import pandas as pd


def _unit_corpus(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    v = as_double(vec_col)
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(v, lambda x: x / F.greatest(n, F.lit(1e-12))).alias("unit"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, "np.ndarray"]:
    """Spherical k-means (cosine, unit-normalized). Returns
    ``(assignments, centroids)``: a (vec_id, cluster) DataFrame and
    the final k × dim unit-row numpy codebook.

    Init is the k lowest-``id_col`` vectors — a bounded k-row collect,
    deterministic under any partitioning (vs. sampling, which would
    need a seed AND a stable sample order).
    """
    import numpy as np

    # Iterative input: normalize once and persist (memory, spill to
    # disk) so each Lloyd's round re-reads unit vectors instead of
    # re-running scan+normalize — the same pattern MLlib's KMeans uses.
    # The small assignment result is localCheckpointed at the end so
    # the big corpus cache can be released before returning.
    corpus = _unit_corpus(emb, vec_col, id_col).persist()
    try:
        init_rows = corpus.orderBy("vec_id").limit(k).collect()
        if len(init_rows) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
        cents = np.stack([np.asarray(r["unit"]) for r in init_rows])
        dim = cents.shape[1]

        for _ in range(iters):
            cents_b = cents  # closure capture: broadcast with the task binary

            def partial_sums(
                it: Iterator["pd.DataFrame"],
            ) -> Iterator["pd.DataFrame"]:
                import pandas as pd

                for pdf in it:
                    if pdf.empty:
                        continue
                    v = np.stack(pdf["unit"].to_numpy())  # (n, dim) unit rows
                    lab = (v @ cents_b.T).argmax(axis=1)  # first max = lowest id
                    rows = []
                    for c in np.unique(lab):
                        m = v[lab == c]
                        rows.append((int(c), len(m), m.sum(axis=0).tolist()))
                    yield pd.DataFrame(rows, columns=["cluster", "n", "vsum"])

            partials = corpus.mapInPandas(
                partial_sums, "cluster int, n long, vsum array<double>"
            )
            # fold the per-batch partials: element-wise array sum, JVM-side
            zero = F.array(*[F.lit(0.0) for _ in range(dim)])
            agg = (
                partials.groupBy("cluster")
                .agg(
                    F.sum("n").alias("n"),
                    # array_sort fixes the fold order of the collected
                    # partials: collect_list order is partition-race
                    # nondeterministic, and float-sum association would
                    # otherwise let near-tie vectors flip labels between
                    # two identical fits
                    F.aggregate(
                        F.array_sort(F.collect_list("vsum")),
                        zero,
                        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                    ).alias("vsum"),
                )
                .collect()  # k rows — bounded by k, not corpus size
            )
            new = cents.copy()
            for r in agg:
                m = np.asarray(r["vsum"]) / max(r["n"], 1)
                norm = np.linalg.norm(m)
                if norm > 1e-12:
                    new[r["cluster"]] = m / norm
            cents = new

        cents_f = cents

        def assign(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            for pdf in it:
                if pdf.empty:
                    continue
                v = np.stack(pdf["unit"].to_numpy())
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "cluster": (v @ cents_f.T).argmax(axis=1).astype("int32"),
                    }
                )

        # localCheckpoint (eager) instead of cache(): materializes the
        # small label set now (so the corpus cache can free below) AND
        # scopes the stored blocks to the DataFrame's lifetime — the
        # ContextCleaner releases them when the result is GC'd, where a
        # cache() entry would leak executor memory for the session
        # (repeated q_kmeans/q_semdedup calls compounded it).
        assignments = corpus.mapInPandas(assign, "vec_id long, cluster int")
        assignments = assignments.localCheckpoint(eager=True)
    finally:
        corpus.unpersist()  # … so the corpus-sized cache frees here
    return assignments, cents


def semdedup_pairs(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the corpus, then flag
    near-duplicate pairs ONLY within each cluster — the k-means pass
    turns an O(n²) all-pairs cosine into k independent O((n/k)²)
    cells. Returns (keep_id, drop_id, score) with keep_id < drop_id
    and cosine ≥ threshold.

    The within-cell pass groups by cluster and matmuls each cell in
    one Arrow batch. Cell size is the scale knob: at corpus scale,
    raise k so cells fit a task (SemDeDup uses k≈110k for LAION-440M);
    a hot cell is the same skew risk as any groupBy — mitigate by
    raising k, or compose `similarity.block_cosine_pairs` per cell.
    """
    import numpy as np  # noqa: F401 (imported for the worker closure)

    assign, _ = kmeans_fit(emb, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    # _unit_corpus threads id_col through (with_norm hardcodes vec_id,
    # which broke non-default id_col — advisor r02)
    corpus = _unit_corpus(emb, vec_col, id_col)
    cells = corpus.join(assign, "vec_id")

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(columns=["keep_id", "drop_id", "score"])
        order = np.argsort(pdf["vec_id"].to_numpy())
        ids = pdf["vec_id"].to_numpy()[order]
        v = np.stack(pdf["unit"].to_numpy())[order]
        sims = v @ v.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "keep_id": ids[iu[keep]],
                "drop_id": ids[ju[keep]],
                "score": np.round(sims[iu, ju][keep], 4),
            }
        )

    return cells.groupBy("cluster").applyInPandas(
        cell_pairs, "keep_id long, drop_id long, score double"
    )


def semdedup_pairs_adaptive(
    emb: DataFrame,
    target_cell: int = 64,
    min_k: int = 2,
    iters: int = 4,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """`semdedup_pairs` with ADAPTIVE k: the cluster count scales with
    the corpus so expected cell size stays ≈ ``target_cell`` at any
    data volume — k = max(min_k, ceil(n / target_cell)).

    This closes the fixed-k boundary measured on the 100× lane
    (BASELINE.md): with k frozen, cells grow linearly with the corpus
    and the within-cell O(cell²) matmul re-becomes the quadratic pass
    SemDeDup exists to avoid. Abbas et al. 2023 size k this way too
    (k ≈ 110k for LAION-440M ≈ 4k-vector cells). The corpus count is
    one column-pruned aggregate (parquet row-group metadata at best);
    k is then a plain Python literal, so the assignment/pair plan is
    identical to `semdedup_pairs`' — only the codebook height changed.
    """
    import math

    n = emb.count()
    k = max(min_k, math.ceil(n / target_cell))
    return semdedup_pairs(
        emb, k=k, iters=iters, threshold=threshold, vec_col=vec_col, id_col=id_col
    )
