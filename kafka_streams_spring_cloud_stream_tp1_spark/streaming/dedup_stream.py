"""Streaming near-duplicate detection against a STATIC corpus — the
ingest-time gate an LLM data pipeline runs on every new crawl batch:
"is this incoming document a near-dup of anything we already hold?"

Pattern: the corpus's MinHash/LSH band index is built ONCE as a batch
frame (band, band_hash, doc_id — three small columns, the vectors/text
stay home) and joined into each micro-batch under `foreachBatch`.
foreachBatch (not a streaming join) because the per-batch logic is a
multi-step batch pipeline — signature aggregate, band explode, index
join, exact verify — which streaming-side operators can't express in
one stateless stage; inside the callback every frame is a plain batch
DataFrame, so the SAME dedup operators run unchanged (the batch/stream
unification Structured Streaming is built on).

Scale shape: the band index has `bands` rows per corpus doc; for a
100 TB corpus it lives as a bucketed table joined by (band, bh) —
below the broadcast threshold Spark broadcasts it, above it the
micro-batch (small) side shuffles, never the corpus. The exact-verify
join touches candidate doc ids only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _hash_shingles,
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_sets,
)


def corpus_band_index(
    corpus: DataFrame, k: int = 12, bands: int = 4, rows: int = 3, n: int = 2
) -> DataFrame:
    """(band, bh, doc_id) LSH bucket index of the static corpus —
    3 small columns per (doc, band); text never leaves the corpus."""
    sig = minhash_signatures(corpus, k=k, n=n)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("corpus_doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))


def near_dup_flags_batch(
    batch: DataFrame,
    index: DataFrame,
    corpus_shingles: DataFrame,
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
    n: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Flag each batch doc that LSH-matches (and exact-verifies at
    ``threshold`` Jaccard against) some corpus doc. Returns
    (doc_id, dup_of, jaccard) for the flagged docs."""
    sig = minhash_signatures(batch, k=k, n=n)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    probe = (
        sig.select("doc_id", *band_cols)
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                        for b in range(bands)
                    ]
                )
            ).alias("e"),
        )
        .select("doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    )
    cands = (
        probe.join(index, ["band", "bh"])
        .select("doc_id", "corpus_doc_id")
        .distinct()
    )
    # r13: verify arrays ride as xxhash64 longs (operators/dedup.py::
    # _hash_shingles — Jaccard is hash-invariant; caveat in QUERIES.md).
    # The corpus side may arrive pre-hashed (stream_near_dup_monitor
    # persists the hashed frame so the transform doesn't re-run per
    # micro-batch); hash it here only when it's still strings.
    from pyspark.sql.types import StringType

    sh_b = _hash_shingles(shingle_sets(batch, n)).select(
        "doc_id", F.col("shingles").alias("sh_new")
    )
    cs = corpus_shingles
    if isinstance(cs.schema["shingles"].dataType.elementType, StringType):
        cs = _hash_shingles(cs)
    sh_c = cs.select(
        F.col("doc_id").alias("corpus_doc_id"), F.col("shingles").alias("sh_old")
    )
    jac = exact_jaccard("sh_new", "sh_old")
    verified = (
        cands.join(sh_b, "doc_id")
        .join(sh_c, "corpus_doc_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
    )
    # strongest match per incoming doc
    return (
        verified.groupBy("doc_id")
        .agg(
            F.max_by("corpus_doc_id", F.struct("jaccard", F.col("corpus_doc_id"))).alias(
                "dup_of"
            ),
            F.max("jaccard").alias("jaccard"),
        )
    )


def stream_near_dup_monitor(
    stream: DataFrame,
    corpus: DataFrame,
    sink: Callable[[DataFrame, int], None],
    threshold: float = 0.8,
    n: int = 2,
):
    """Run near-dup detection on every micro-batch of ``stream``
    (docs with doc_id + text columns) against the static ``corpus``,
    handing each batch's flags DataFrame to ``sink(flags, batch_id)``.
    Returns the started StreamingQuery.

    The corpus band index and shingle sets are persisted and
    materialized BEFORE the stream starts — they are lazy plans, and
    without the persist every micro-batch would re-run the full corpus
    MinHash/shingle pipeline (a per-batch corpus scan at 100 TB scale,
    the opposite of the built-once contract in the module doc). The
    caches release when the query terminates; at real corpus scale
    write the index to a bucketed table instead and re-read it."""
    index = corpus_band_index(corpus, n=n).persist()
    # persist the HASHED verify arrays (r13): hashing above the persist
    # would re-run the transform over the whole corpus every
    # micro-batch; hashed-long arrays are also ~3× smaller cached
    shingles = _hash_shingles(shingle_sets(corpus, n)).persist()
    index.count(), shingles.count()  # build once, eagerly

    def process(batch: DataFrame, batch_id: int) -> None:
        flags = near_dup_flags_batch(
            batch, index, shingles, n=n, threshold=threshold
        )
        sink(flags, batch_id)

    query = stream.writeStream.foreachBatch(process).start()

    _orig_await, _orig_stop = query.awaitTermination, query.stop

    def _cleanup() -> None:
        for df in (index, shingles):
            try:
                df.unpersist()
            except Exception:
                pass

    def awaitTermination(timeout=None):  # noqa: N802 (Spark API casing)
        try:
            return _orig_await(timeout) if timeout is not None else _orig_await()
        finally:
            if not query.isActive:
                _cleanup()

    def stop():
        try:
            return _orig_stop()
        finally:
            _cleanup()

    query.awaitTermination, query.stop = awaitTermination, stop
    return query


__all__ = [
    "corpus_band_index",
    "near_dup_flags_batch",
    "stream_near_dup_monitor",
    "lsh_candidate_pairs",
]
