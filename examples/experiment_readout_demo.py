"""Experiment-readout demo over the parquet fixtures — the A/B-test /
metric-health battery a product-analytics deployment runs on the event
stream, chained through the registered queries:

    assignment + proportion test          (q_ab_test)
    distribution-free metric shift        (q_mann_whitney)
    mean daily-volume shift               (q_welch_ttest)
    propensity ranking quality            (q_auc_propensity)
    uncertainty on the headline mean      (q_poisson_bootstrap)
    guardrails: drift + changepoints      (q_ks_drift, q_cusum_changepoint,
                                           q_anomaly_zscore, q_acf)

Run:  python examples/experiment_readout_demo.py [sf_dir]

Every statistic is exact-integer-derived (see operators/stats.py) and
value-checked against a DuckDB oracle in the registry, so the numbers
printed here are the same a 1000-executor run would produce — the
plans shuffle on event/user keys only and never sort globally.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="experiment-readout-demo")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries_map()

    print("== A/B proportion z-test (hash assignment) ==")
    q["q_ab_test"](spark, sf_dir).show(truncate=False)

    print("== Mann-Whitney U: purchase vs click event values ==")
    q["q_mann_whitney"](spark, sf_dir).show(truncate=False)

    print("== Welch t: mean daily purchase vs click volume ==")
    q["q_welch_ttest"](spark, sf_dir).show(truncate=False)

    print("== Propensity AUC: does view volume rank heavy buyers? ==")
    q["q_auc_propensity"](spark, sf_dir).show(truncate=False)

    print("== Poisson-bootstrap 95% CI for mean order value (cents) ==")
    q["q_poisson_bootstrap"](spark, sf_dir).show(truncate=False)

    print("== Guardrail: per-source length-distribution drift (KS) ==")
    q["q_ks_drift"](spark, sf_dir).orderBy("source").show(5, truncate=False)

    print("== Guardrail: CUSUM level-shift scan per event type ==")
    q["q_cusum_changepoint"](spark, sf_dir).orderBy("event_type").show(truncate=False)

    print("== Guardrail: daily-volume autocorrelation (lags 1-7) ==")
    q["q_acf"](spark, sf_dir).orderBy("lag").show(truncate=False)

    print("== Calibration: do score levels mean anything? ==")
    q["q_calibration_bins"](spark, sf_dir).orderBy("bin").show(truncate=False)

    print("== Funnel velocity: time-to-convert percentiles ==")
    q["q_funnel_time"](spark, sf_dir).show(truncate=False)

    print("== Kaplan-Meier: time-to-first-purchase (censored) ==")
    q["q_survival_km"](spark, sf_dir).orderBy("t_days").show(10, truncate=False)

    print("== Holt level+trend forecast of daily volume ==")
    q["q_holt_smoothing"](spark, sf_dir).orderBy("event_type").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
