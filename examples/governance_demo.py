"""Data-governance demo over the parquet fixtures — the release-gate
battery a training-data pipeline runs before a corpus leaves the
enclave, chained through the registered queries:

    direct-identifier scrub               (q_redact_pii)
    re-identification audit               (q_k_anonymity)
    benchmark decontamination             (q_decontaminate)
    train/val/test leakage                (q_split_leakage)
    dataset-release diff                  (q_corpus_diff)
    composition drift alarms              (q_chisq_independence, q_psi_drift)
    distinctive-vocabulary report         (q_distinctive_terms)

Run:  python examples/governance_demo.py [sf_dir]

Each gate is a registered, DuckDB-value-checked query; the scrub and
the k-anonymity profile are map-side-only plans (zero or one shuffle),
so the battery costs roughly one corpus scan per gate at any scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="governance-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries_map()

    print("== PII scrub: emails/phones redacted, counts per doc ==")
    q["q_redact_pii"](spark, sf_dir).show(5, truncate=60)

    print("== k-anonymity: quasi-identifier classes below k=5 ==")
    kanon = q["q_k_anonymity"](spark, sf_dir)
    kanon.filter("at_risk").show(10, truncate=False)
    total = kanon.count()
    risky = kanon.filter("at_risk").count()
    print(f"   {risky}/{total} equivalence classes at risk\n")

    print("== Benchmark decontamination: flagged docs ==")
    q["q_decontaminate"](spark, sf_dir).filter("contaminated").show(5)

    print("== Split leakage: fingerprints crossing split boundaries ==")
    q["q_split_leakage"](spark, sf_dir).show(5, truncate=False)

    print("== Release diff vs synthetic previous snapshot ==")
    q["q_corpus_diff"](spark, sf_dir).show(truncate=False)

    print("== Composition drift: lang x source chi-square ==")
    q["q_chisq_independence"](spark, sf_dir).show(truncate=False)

    print("== Length-distribution drift per source (PSI) ==")
    q["q_psi_drift"](spark, sf_dir).orderBy("source").show(10, truncate=False)

    print("== What makes each source distinctive (Monroe log-odds) ==")
    q["q_distinctive_terms"](spark, sf_dir).orderBy("source", "rank").show(
        15, truncate=False
    )

    spark.stop()


if __name__ == "__main__":
    main()
