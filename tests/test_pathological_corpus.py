"""Pathological-document robustness.

Web-scale corpora contain shape extremes the fixture's well-behaved
synthetic text never exercises: megabyte documents, single giant
tokens (minified JS, base64 blobs), whitespace-only and empty bodies,
mixed-script unicode with combining marks and RTL, and astral-plane
emoji. Text operators must process these without task failure and
with sane outputs (a whitespace-only doc has 0 tokens, not a crash;
an astral emoji is one character, not two).

Complements tests/test_null_robustness.py (NULL rows) — together they
pin the two input classes that crash naive per-row code at 100 TB.
"""

from __future__ import annotations

import duckdb
import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import queries_map

SF = "/root/testdata/sf0.001"

LONG_DOC = ("lorem ipsum dolor sit amet " * 8000).strip()   # ~216 KB
GIANT_TOKEN = "x" * 50_000                                   # one 50 KB word
UNICODE_DOC = (
    "naïve café façade 日本語のテキスト 한국어 텍스트 "
    "مرحبا بالعالم עברית טקסט "
    "émotion combining "
    "🚀🧪👩‍🔬 astral and zwj emoji"
)

DOCS = [
    (9_000_001, LONG_DOC, "en", "patho", len(LONG_DOC)),
    (9_000_002, GIANT_TOKEN, "en", "patho", len(GIANT_TOKEN)),
    (9_000_003, "   \t\n  ", "en", "patho", 7),      # whitespace-only
    (9_000_004, "", "en", "patho", 0),               # empty string
    (9_000_005, "a", "en", "patho", 1),              # single char
    (9_000_006, UNICODE_DOC, "xx", "patho", len(UNICODE_DOC)),
]

# Text-centric operators spanning tokenization, n-grams, hashing,
# Arrow-batched Python, windows, and the UDTF chunker.
QUERIES = [
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_repetition_stats",
    "q_dedup_minhash_lsh",
    "q_bpe_encode",
    "q_chunk_documents_udtf",
    "q_winnow_fingerprint",
    "q_redact_pii",
    "q_doc_fingerprint",
    "q_suffix_lcp",
    # round 8: the whitespace-only doc is a REAL zero divisor under
    # ANSI (gopher mean-word-length; caught by the streaming gate)
    "q_gopher_filter",
    "q_ccnet_buckets",
    "q_dsir_weights",
    "q_simhash_width_audit",
    # round 9: incremental CC rides the pair table through the
    # prior-labels + new-pairs union — extremes must survive both legs
    "q_dedup_clusters_incremental",
    "q_token_conditional_entropy",
]


@pytest.fixture(scope="module")
def patho_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_patho")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE extremes (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO extremes VALUES (?, ?, ?, ?, ?)", DOCS)
    con.execute(
        f"""COPY (SELECT * FROM read_parquet('{SF}/documents.parquet')
                UNION ALL SELECT * FROM extremes)
            TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{SF}/{t}.parquet'))
                TO '{out}/{t}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    return str(out)


@pytest.mark.parametrize("name", QUERIES)
def test_query_survives_pathological_docs(spark, patho_dir, name):
    df = queries_map()[name](spark, patho_dir)
    assert df.count() >= 0  # materialize; the assertion is "no task failure"


def test_token_count_extremes(spark, patho_dir):
    """Sanity on the extremes themselves: whitespace-only and empty
    docs carry 0 tokens, the giant token is exactly 1, and the long
    doc's count matches its construction."""
    rows = {
        r.doc_id: r
        for r in queries_map()["q_token_count"](spark, patho_dir)
        .filter("doc_id >= 9000000")
        .collect()
    }
    assert rows[9_000_003].ws_tokens == 0
    assert rows[9_000_004].ws_tokens == 0
    assert rows[9_000_002].ws_tokens == 1
    assert rows[9_000_001].ws_tokens == 5 * 8000
