"""Offline trainer for the tiny cross-encoder stand-in model
(VERDICT r11 #6, round-10 stretch (c)).

Trains a pure-numpy logistic regression over deterministic
(query, document) lexical features on the sf0.001 documents fixture
and prints the learned weights as Python literals — the "model
artifact" that ships in ``operators/ce_model.py``. The point is NOT
model quality (the label is a deterministic lexical-coverage rule a
linear model learns easily); it is proving the
``crossencoder_rerank_udf(scorer=...)`` seam carries an actual
LEARNED artifact end-to-end: offline fit → literal weights → Arrow-
batched distributed forward pass == in-process forward pass,
bit-for-bit.

Protocol (all deterministic, no RNG):
- training queries: fixed 2-term combinations of corpus-frequent
  words (the same register the BM25 queries use);
- features per (query, doc): ``operators/ce_model.py::ce_features``
  — coverage, density, inverse first-hit position, inverse
  log-length (the trainer imports the SAME feature function the
  shipped scorer uses, so there is no train/serve skew);
- label: 1 iff the document contains EVERY query term;
- fit: full-batch gradient descent, 500 steps, lr 2.0, float64.

Usage:

    python tools/train_ce_scorer.py

Prints train accuracy and the CE_WEIGHTS / CE_BIAS literals to paste
into ``operators/ce_model.py`` (already done — re-run to reproduce).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
QUERIES = [
    "spark stream",
    "spark hash",
    "data window",
    "hash window",
    "stream data",
    "spark window stream",
]


def main() -> int:
    import duckdb

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.ce_model import (
        ce_features,
    )

    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
            "WHERE text IS NOT NULL ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()

    X_rows, y_rows = [], []
    for q in QUERIES:
        terms = q.split()
        X_rows.append(ce_features(q, texts))
        y_rows.append(
            np.array(
                [
                    1.0 if all(t in txt.lower().split() for t in terms) else 0.0
                    for txt in texts
                ]
            )
        )
    X = np.vstack(X_rows)
    y = np.concatenate(y_rows)
    print(f"training pairs: {len(y)} ({int(y.sum())} positive)")

    w = np.zeros(X.shape[1])
    b = 0.0
    lr = 2.0
    for _ in range(500):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * (X.T @ g) / len(y)
        b -= lr * g.mean()

    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y > 0.5)).mean()
    print(f"train accuracy: {acc:.4f}")
    print("\n# paste into operators/ce_model.py:")
    print(f"CE_WEIGHTS = {[float(repr(float(v))) for v in w]!r}")
    print(f"CE_BIAS = {float(b)!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
