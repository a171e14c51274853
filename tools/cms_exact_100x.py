"""Count-Min-vs-EXACT accuracy at decade scale (VERDICT r10 #6).

Runs the registry's own `q_cms_frequency` readout (top-20 exact tokens
with their CMS point estimates and one-sided overestimates) at 1x
(sf0.1) and 100x (the real-growth corpus from build_scale_corpus.py
--generate), and prints the accuracy profile next to the timing the
round-9 decade row already recorded — the sketch's ERROR, not just its
cost, is what must hold as the stream grows: CMS guarantees
overestimate <= eps*N with eps = e/w, so the ABSOLUTE error bound
scales with the token mass while the top-k RELATIVE error stays
bounded because heavy tokens grow with N too.

Usage: python tools/cms_exact_100x.py [corpus_100x_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, sf_dir: str, label: str) -> None:
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.llm_queries import (
        _CMS_D,
        _CMS_W,
        q_cms_frequency,
    )

    t0 = time.time()
    rows = q_cms_frequency(spark, sf_dir).collect()
    sec = time.time() - t0
    rows.sort(key=lambda r: -r["exact_count"])
    n_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("sum(size(filter(split(text, '\\\\s+'), t -> t != ''))) n")
        .first()["n"]
    )
    eps_bound = math.e / _CMS_W * n_tokens
    worst = max(r["overestimate"] for r in rows)
    worst_rel = max(r["overestimate"] / r["exact_count"] for r in rows)
    zero = sum(1 for r in rows if r["overestimate"] == 0)
    print(
        f"{label}: N={n_tokens} tokens, d={_CMS_D} w={_CMS_W}, "
        f"top-{len(rows)} probe: exact-hit (over=0) {zero}/{len(rows)}, "
        f"worst abs over={worst} ({worst / n_tokens:.5%} of N; "
        f"eps*N bound={eps_bound:.0f}), worst rel over={worst_rel:.4%}, "
        f"{sec:.1f}s"
    )
    for r in rows[:5]:
        print(
            f"  {r['token']!r}: exact={r['exact_count']} "
            f"cms={r['cms_estimate']} over={r['overestimate']}"
        )


def main() -> int:
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark

    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1x100u"
    spark = get_spark(app_name="cms_exact_100x")
    spark.sparkContext.setLogLevel("ERROR")
    profile(spark, "/root/testdata/sf0.1", "1x (sf0.1)")
    profile(spark, big, "100x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
