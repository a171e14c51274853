"""SimHash production-width proof at the 100x lane (VERDICT r09 #7b).

BASELINE.md "Where the simhash GRAPH ends" records that bits=16 (the
fixture's oracle-bit-parity setting) saturates at 100x: 500k docs in a
2^16 signature space make the hamming<=1 graph ~complete (1.35B
edges), so triangle/k-core over it exceed any single-box window. The
knob is the signature WIDTH. This tool runs the production decision
end to end on the 100x corpus:

1. `simhash_width_audit` (the registry's own readout) profiles the
   collision mass at 16 vs 32 bits;
2. the width where collision mass tracks true duplicate mass (not
   space saturation) is picked — the audit's n_docs_in_collisions
   collapsing from ~all docs to ~dup-family mass is the signal;
3. the near-dup GRAPH is built at that width and the graph family
   (degree distribution, capped triangle counts) is run over it,
   timed — proving the family completes at 100x on the chosen width.

Usage: python tools/simhash_width_100x.py [sf_dir] [bits]
Defaults: /tmp/sf0.1x100u 32
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
    simhash_hamming_pairs,
    simhash_width_audit,
)
from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import (
    degree_distribution,
    triangle_counts,
)
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1x100u"
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="simhash_width_100x", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")

    t0 = time.time()
    audit = simhash_width_audit(docs, widths=(16, 32)).collect()
    t_audit = time.time() - t0
    print(f"width audit ({t_audit:.1f}s):")
    for r in sorted(audit, key=lambda r: r["bits"]):
        print(
            f"  bits={r['bits']}: docs={r['n_docs']} distinct_sigs="
            f"{r['n_distinct_sigs']} collision_groups={r['n_collision_groups']} "
            f"docs_in_collisions={r['n_docs_in_collisions']}"
        )

    t0 = time.time()
    pairs = simhash_hamming_pairs(docs, bits=bits).localCheckpoint(eager=True)
    n_edges = pairs.count()
    t_pairs = time.time() - t0
    print(f"bits={bits} hamming<=1 graph: {n_edges} edges ({t_pairs:.1f}s)")

    t0 = time.time()
    deg = degree_distribution(pairs)
    n_deg_rows = deg.count()
    dmax = deg.agg({"deg": "max"}).collect()[0][0]
    t_deg = time.time() - t0
    print(f"degree distribution: {n_deg_rows} rows, max degree {dmax} ({t_deg:.1f}s)")

    t0 = time.time()
    tri = triangle_counts(pairs, a="doc_a", b="doc_b", max_degree=64)
    n_tri_nodes = tri.count()
    total_tri = tri.agg({"n_triangles": "sum"}).collect()[0][0]
    t_tri = time.time() - t0
    print(
        f"triangle counts (cap 64): {n_tri_nodes} nodes, "
        f"sum n_triangles={total_tri} ({t_tri:.1f}s)"
    )
    print(
        f"SUMMARY sf={sf} bits={bits}: edges={n_edges} "
        f"audit={t_audit:.1f}s pairs={t_pairs:.1f}s degree={t_deg:.1f}s "
        f"triangles={t_tri:.1f}s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
