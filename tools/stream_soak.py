"""Streaming-lane soak (VERDICT r09 #5): run every streaming lane for
hundreds of triggers on rate sources in ONE session and RECORD the
per-trigger state-store row counts, so state-size flatness is an
observed long-run artifact (like SOAK_rN.log), not just a per-test
assertion.

Lanes and their state contracts:

- ``hh``   running_heavy_hitters (applyInPandasWithState): state rows
           == live shards, O(n_shards) FOREVER (each shard's GroupState
           is one <=k-counter Misra-Gries summary); changelog output
           <= n_shards*k rows per trigger at any stream volume.
- ``wc``   flagship windowed count (watermarked streaming agg): state
           rows == in-flight (key, window) pairs, bounded by
           |keys| * (horizon/window + slack) because the watermark
           EVICTS closed windows — the series must plateau, never
           climb with stream lifetime.
- ``drift``/``quality``/``dedup`` foreachBatch monitors: ZERO state
           operators by construction (each batch scores against a
           pre-built broadcast/persisted reference); the lane proves
           long-run stability (no slowdown, no growth, bounded sink
           rows per trigger).
- ``cc``   incremental connected components (foreachBatch over a
           versioned parquet label table, VERDICT r10 #2): ZERO Spark
           state operators; the pipeline's real state is the label
           table, whose row count must track the DISTINCT-DOC space
           (modular pair generator -> saturates at <= CC_DOC_SPACE
           and plateaus), never the cumulative pair count; at the end
           the label table must equal the batch closure of every pair
           the stream emitted (logged per batch for the comparison).

The per-trigger state-row series is written into the log run-length
encoded (it saturates, so the encoding is tiny) plus per-block
summaries. Usage:

    python tools/stream_soak.py [triggers] > STREAM_SOAK_rN.log

``triggers`` (default 520) is the minimum trigger count for the two
STATEFUL lanes; the stateless monitors record whatever count they
reach in the same wall-clock window (ASAP triggers, typically the
same order). Exits non-zero on any violated bound.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

N_SHARDS, MG_K = 8, 16
WC_KEYS = 4
# cc lane: pairs live in a modular doc space so the label table
# saturates — even values link a doc to its decade root, odd values
# link decade root to century root, so the full closure is 50
# century-rooted clusters of 100 docs
CC_DOC_SPACE = 5000
# 5 s windows, 10 s watermark -> <= ~4 windows in flight per key; 8 is
# a generous slack bound (trigger jitter holds a window one extra round)
WC_STATE_BOUND = WC_KEYS * 8


class _Recorder(StreamingQueryListener):
    """Append (batchId, numInputRows, total state rows, per-op rows)
    per progress event, keyed by query name. Listener thread only
    appends; the main thread reads after queries stop."""

    def __init__(self) -> None:
        # keyed by str(query id): the foreachBatch monitors start
        # unnamed queries, so name-keying would silently drop their
        # zero-state evidence (the main thread remaps id -> lane)
        self.progress: dict[str, list[tuple[int, int, int]]] = defaultdict(list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(op.numRowsTotal for op in p.stateOperators)
        self.progress[str(p.id)].append(
            (p.batchId, int(p.numInputRows), int(state_rows), len(p.stateOperators))
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def _rle(series: list[int]) -> str:
    out, i = [], 0
    while i < len(series):
        j = i
        while j < len(series) and series[j] == series[i]:
            j += 1
        out.append(f"{series[i]}x{j - i}")
        i = j
    return ",".join(out)


def main() -> int:
    min_triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 520
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.dedup_stream import (
        stream_near_dup_monitor,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.drift_stream import (
        stream_drift_monitor,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.heavy_hitters_stream import (
        running_heavy_hitters,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.pipeline import (
        streaming_windowed_counts,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.quality_stream import (
        stream_quality_gate,
    )

    spark = get_spark(
        app_name="stream_soak",
        # hundreds of tiny triggers: a 32-partition shuffle per trigger
        # is pure scheduler overhead at this batch size
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    rec = _Recorder()
    spark.streams.addListener(rec)
    ckpt = tempfile.mkdtemp(prefix="stream_soak_ckpt_")
    sink_rows: dict[str, list[int]] = defaultdict(list)
    t00 = time.time()

    def rate(rps: int) -> "F.DataFrame":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rps)
            .option("numPartitions", 2)
            .load()
        )

    def counting_sink(lane: str):
        def _sink(df, batch_id):
            sink_rows[lane].append(df.count())

        return _sink

    queries: list[tuple[str, object]] = []

    # hh: skewed key stream — 80% of items from 8 hot keys, tail from 4096
    hh_in = rate(2000).select(
        F.when(
            F.col("value") % 10 < 8,
            F.concat(F.lit("h"), (F.col("value") % 8).cast("string")),
        )
        .otherwise(F.concat(F.lit("t"), (F.col("value") % 4096).cast("string")))
        .alias("item")
    )
    queries.append(
        (
            "hh",
            running_heavy_hitters(hh_in, "item", k=MG_K, n_shards=N_SHARDS)
            .writeStream.outputMode("update")
            .queryName("hh")
            .option("checkpointLocation", f"{ckpt}/hh")
            .foreachBatch(counting_sink("hh"))
            .start(),
        )
    )

    # wc: the reference flagship — 4 pages, 5 s tumbling windows, 10 s
    # watermark; value>100 filter passes ~half the stream
    wc_in = rate(1000).select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("P"), (F.col("value") % WC_KEYS).cast("string")).alias(
            "event_type"
        ),
        (F.col("value") % 200).cast("double").alias("value"),
    )
    queries.append(
        (
            "wc",
            streaming_windowed_counts(wc_in, window="5 seconds", watermark="10 seconds")
            .writeStream.outputMode("update")
            .queryName("wc")
            .option("checkpointLocation", f"{ckpt}/wc")
            .foreachBatch(counting_sink("wc"))
            .start(),
        )
    )

    # stateless monitors: baseline/corpus built once from the static
    # fixture, every micro-batch scored against it
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(300)
        .cache()
    )
    docs.count()

    queries.append(
        (
            "drift",
            stream_drift_monitor(
                rate(500).select((F.col("value") % 997).cast("double").alias("v")),
                docs.select(F.col("n_chars").cast("double").alias("v")),
                "v",
                counting_sink("drift"),
            ),
        )
    )
    words = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), ((F.col("value") + i * 7) % 37).cast("string"))
            for i in range(12)
        ],
    )
    queries.append(
        (
            "quality",
            stream_quality_gate(
                rate(500).select(F.col("value").alias("doc_id"), words.alias("text")),
                docs,
                counting_sink("quality"),
            ),
        )
    )
    # plant a verbatim corpus text on every 50th stream doc so the
    # LSH-probe -> verify path produces real matches, not just empty
    # flag frames
    planted = (
        docs.orderBy("doc_id").select("text").first()["text"] or "fallback text"
    )
    dedup_text = F.when(F.col("value") % 50 == 0, F.lit(planted)).otherwise(words)
    queries.append(
        (
            "dedup",
            stream_near_dup_monitor(
                rate(500).select(F.col("value").alias("doc_id"), dedup_text.alias("text")),
                docs.select("doc_id", "text"),
                counting_sink("dedup"),
            ),
        )
    )

    # cc: incremental connected components over a planted modular pair
    # stream; labels live in a versioned parquet table, pairs are also
    # logged so the end-of-run closure comparison has the ground truth
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        dup_clusters,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.cc_stream import (
        apply_pair_batch,
        latest_labels,
    )

    cc_labels_root = f"{ckpt}/cc_labels"
    cc_pairs_log = f"{ckpt}/cc_pairs_log"
    m = F.col("value") % CC_DOC_SPACE
    cc_in = rate(500).select(
        F.when(F.col("value") % 2 == 0, m)
        .otherwise((m / 10).cast("long") * 10)
        .cast("long")
        .alias("doc_a"),
        F.when(F.col("value") % 2 == 0, (m / 10).cast("long") * 10)
        .otherwise((m / 100).cast("long") * 100)
        .cast("long")
        .alias("doc_b"),
    )

    def cc_process(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)  # read the source once
        batch.write.mode("append").parquet(cc_pairs_log)
        labels = apply_pair_batch(batch.sparkSession, batch, cc_labels_root)
        sink_rows["cc"].append(labels.count())

    queries.append(
        (
            "cc",
            cc_in.writeStream.foreachBatch(cc_process)
            .queryName("cc")
            .option("checkpointLocation", f"{ckpt}/cc")
            .start(),
        )
    )

    lane_ids = {lane: str(q.id) for lane, q in queries}

    def prog(lane: str) -> list[tuple[int, int, int, int]]:
        return rec.progress[lane_ids[lane]]

    # drive until both STATEFUL lanes pass min_triggers (45 min cap —
    # the round-11 cc lane runs a full label-propagation increment per
    # trigger, which slows every lane's trigger cadence on one box)
    stateful = ("hh", "wc")
    last_print = 0.0
    while time.time() - t00 < 2700:
        done = all(len(prog(n)) >= min_triggers for n in stateful)
        if time.time() - last_print > 30:
            counts = {lane: len(prog(lane)) for lane, _ in queries}
            print(f"[{time.time() - t00:5.0f}s] triggers: {counts}", flush=True)
            last_print = time.time()
        if done:
            break
        time.sleep(2)
    for _, q in queries:
        try:
            q.stop()
        except Exception:
            pass
    for _, q in queries:
        try:
            q.awaitTermination(30)
        except Exception:
            pass

    fails: list[str] = []
    print(f"\n=== per-lane results after {time.time() - t00:.0f}s ===")
    for lane, _ in queries:
        rows = prog(lane)
        states = [s for _, _, s, _ in rows]
        n_ops = {k for _, _, _, k in rows}
        inputs = sum(i for _, i, _, _ in rows)
        print(
            f"{lane}: {len(rows)} triggers, {inputs} input rows, "
            f"state rows min/max = {min(states) if states else '-'}"
            f"/{max(states) if states else '-'}, state ops = {sorted(n_ops)}"
        )
        if lane in stateful:
            print(f"  state-rows-per-trigger (RLE): {_rle(states)}")
        # the ≥min_triggers contract is for the stateful lanes (whose
        # state series is the artifact); the stateless monitors record
        # whatever they reach in the same window, floor min//4 — except
        # cc, whose every trigger is a full label-propagation increment
        # (several Spark jobs: union star edges, pointer-jump, snapshot
        # write + prune + count), so its evidence is increments + the
        # final closure equality, floored at min//8
        if lane in stateful:
            need = min_triggers
        elif lane == "cc":
            need = max(50, min_triggers // 8)
        else:
            need = max(100, min_triggers // 4)
        if len(rows) < need:
            fails.append(f"{lane}: only {len(rows)} triggers (< {need})")
        if sink_rows[lane]:
            sr = sink_rows[lane]
            print(
                f"  sink rows/trigger: n={len(sr)} min={min(sr)} max={max(sr)}"
            )

    # bounds — the contracts in the module docstrings
    hh_states = [s for _, _, s, _ in prog("hh")]
    if max(hh_states, default=0) > N_SHARDS:
        fails.append(f"hh state rows exceeded n_shards: {max(hh_states)} > {N_SHARDS}")
    if max(sink_rows["hh"], default=0) > N_SHARDS * MG_K:
        fails.append(
            f"hh changelog exceeded n_shards*k: {max(sink_rows['hh'])} > {N_SHARDS * MG_K}"
        )
    wc_states = [s for _, _, s, _ in prog("wc")]
    if max(wc_states, default=0) > WC_STATE_BOUND:
        fails.append(
            f"wc state rows exceeded watermark bound: {max(wc_states)} > {WC_STATE_BOUND}"
        )
    # plateau: the last quarter must not TREND above the earlier run.
    # A single late jitter spike (trigger delay holding one extra
    # window per key — r11 observed one 20 in an hours-long 12<->16
    # oscillation, still far under the hard bound) is not growth, so
    # the max comparison carries a one-window-per-key slack and the
    # MEDIAN comparison is strict.
    if wc_states:
        cut = 3 * len(wc_states) // 4
        q3, q4 = wc_states[:cut], wc_states[cut:]
        if q3 and q4:
            if max(q4) > max(q3) + WC_KEYS:
                fails.append("wc state rows still climbing in the last quarter")
            med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
            if med(q4) > med(q3):
                fails.append(
                    "wc state-row MEDIAN rose in the last quarter "
                    f"({med(q3)} -> {med(q4)}) — eviction is falling behind"
                )
    for lane in ("drift", "quality", "dedup", "cc"):
        ops = {k for _, _, _, k in prog(lane)}
        if ops - {0}:
            fails.append(f"{lane}: unexpected stateful operators {ops}")
        if lane in ("drift", "quality") and set(sink_rows[lane]) - {1}:
            fails.append(f"{lane}: sink rows per trigger not the 1-row verdict")
    if not any(sink_rows["dedup"]):
        fails.append("dedup: planted corpus text never matched — probe path dead")

    # cc bounds: the label table tracks the doc space, not the pair
    # count — monotone to saturation, plateaued in the last quarter —
    # and the final table equals the batch closure of every pair seen
    cc_sizes = sink_rows["cc"]
    if cc_sizes:
        print(f"  cc label-table rows/trigger (RLE): {_rle(cc_sizes)}")
        if max(cc_sizes) > CC_DOC_SPACE:
            fails.append(
                f"cc label table exceeded doc space: {max(cc_sizes)} > {CC_DOC_SPACE}"
            )
        if any(b < a for a, b in zip(cc_sizes, cc_sizes[1:])):
            fails.append("cc label table shrank between triggers")
        q3 = cc_sizes[: 3 * len(cc_sizes) // 4]
        if q3 and max(cc_sizes[3 * len(cc_sizes) // 4 :], default=0) > max(q3):
            fails.append("cc label table still growing in the last quarter")
        final_labels, _ = latest_labels(spark, cc_labels_root)
        got = {
            (r["doc_id"], r["cluster_id"]) for r in final_labels.collect()
        }
        want = {
            (r["doc_id"], r["cluster_id"])
            for r in dup_clusters(
                spark.read.parquet(cc_pairs_log)
            ).collect()
        }
        if got != want:
            fails.append(
                f"cc final labels != batch closure ({len(got ^ want)} diffs)"
            )
        else:
            print(
                f"  cc final labels == batch closure of the full pair log "
                f"({len(got)} docs)"
            )
    else:
        fails.append("cc: no triggers recorded")

    print(f"\nSTREAM SOAK DONE in {(time.time() - t00) / 60:.1f} min; FAILS: {fails}")
    spark.streams.removeListener(rec)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
