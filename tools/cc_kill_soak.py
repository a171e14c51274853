"""SIGKILL-mid-soak recovery proof for the incremental-CC lane
(VERDICT r11 #4).

The cc stream's restart story rests on three design claims
(`streaming/cc_stream.py` module docstring): the durable
``checkpointLocation`` anchors source offsets, the versioned label
table recovers to its newest ``_SUCCESS``-committed snapshot, and
label propagation is idempotent so a replayed batch is harmless. The
round-11 evidence was a pytest offset-resume test (graceful stop) and
a clean 252-trigger soak; this tool proves the claims under the
UNGRACEFUL failure they exist for:

- **Phase A** runs the cc lane (modular pair stream -> foreachBatch:
  append pairs to a log, advance the label table one version) in a
  CHILD process with a durable checkpoint, and the parent ``SIGKILL``s
  it the moment it crosses the target increment count — no stop(), no
  JVM shutdown hooks, torn files on disk are part of the test.
- **Phase B** starts a FRESH child on the same checkpoint + label
  root + pair log and runs further increments, then stops cleanly.
  Its first batch replays whatever phase A had consumed-but-not-
  committed, re-appending those pairs (duplicate edges — closure-
  idempotent) and re-propagating them onto the newest committed
  snapshot.
- The parent then computes the batch closure ``dup_clusters(pair
  log)`` and asserts the recovered stream's final label table equals
  it exactly, and that the label table stayed within the doc space.

Usage:

    python tools/cc_kill_soak.py [increments_per_phase] > CC_KILL_SOAK_rN.log

Exits non-zero if the closure equality (or any bound) fails.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CC_DOC_SPACE = 2500


def child(workdir: str, target_increments: int) -> int:
    """Run the cc lane until ``target_increments`` label-table
    versions have been produced BY THIS PROCESS, then (phase B only —
    phase A is killed first) stop gracefully."""
    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.cc_stream import (
        apply_pair_batch,
    )

    spark = get_spark(app_name="cc_kill_soak_child")
    spark.sparkContext.setLogLevel("ERROR")

    labels_root = f"{workdir}/labels"
    pairs_log = f"{workdir}/pairs_log"
    progress = f"{workdir}/progress"

    m = F.col("value") % CC_DOC_SPACE
    pair_stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.when(F.col("value") % 2 == 0, m)
            .otherwise((m / 10).cast("long") * 10)
            .cast("long")
            .alias("doc_a"),
            F.when(F.col("value") % 2 == 0, (m / 10).cast("long") * 10)
            .otherwise((m / 100).cast("long") * 100)
            .cast("long")
            .alias("doc_b"),
        )
    )

    done = {"n": 0}

    def process(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)  # read the source once
        batch.write.mode("append").parquet(pairs_log)
        labels = apply_pair_batch(batch.sparkSession, batch, labels_root)
        n = labels.count()
        done["n"] += 1
        # one line per increment — the parent's kill trigger and the
        # artifact's per-increment label-size series
        with open(progress, "a") as f:
            f.write(f"{batch_id} {n}\n")

    q = (
        pair_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .start()
    )
    while done["n"] < target_increments:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(sys.argv[2], int(sys.argv[3]))

    per_phase = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    import tempfile

    workdir = tempfile.mkdtemp(prefix="cc_kill_soak_")
    progress = f"{workdir}/progress"
    t00 = time.time()

    def spawn(n: int) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", workdir, str(n)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    def increments() -> int:
        try:
            with open(progress) as f:
                return sum(1 for _ in f)
        except FileNotFoundError:
            return 0

    # ---- phase A: run, then SIGKILL the instant the target is crossed
    print(f"phase A: starting child, SIGKILL after {per_phase} increments")
    a = spawn(per_phase * 10)  # target far past the kill point — the
    # child must die by signal, never stop gracefully
    while increments() < per_phase:
        if a.poll() is not None:
            print(f"FAIL: phase A child exited early (rc={a.returncode})")
            return 1
        time.sleep(0.2)
    os.kill(a.pid, signal.SIGKILL)
    a.wait()
    killed_at = increments()
    print(
        f"phase A: SIGKILLed mid-run at {killed_at} committed increments "
        f"(rc={a.returncode}, {time.time() - t00:.0f}s)"
    )
    assert a.returncode == -signal.SIGKILL

    # ---- phase B: fresh process, same checkpoint/labels/pair log
    print(f"phase B: restarting from the checkpoint for {per_phase} more")
    b = spawn(killed_at + per_phase)
    rc = b.wait(timeout=900)
    total = increments()
    print(
        f"phase B: clean stop at {total} total increments "
        f"(rc={rc}, {time.time() - t00:.0f}s)"
    )
    if rc != 0:
        print("FAIL: phase B child did not exit cleanly")
        return 1

    # ---- verdict: recovered labels == batch closure of the pair log
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        dup_clusters,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.cc_stream import (
        latest_labels,
    )

    spark = get_spark(app_name="cc_kill_soak_verify")
    spark.sparkContext.setLogLevel("ERROR")
    final_labels, version = latest_labels(spark, f"{workdir}/labels")
    got = {(r["doc_id"], r["cluster_id"]) for r in final_labels.collect()}
    pairs = spark.read.parquet(f"{workdir}/pairs_log")
    n_pairs = pairs.count()
    n_distinct = pairs.distinct().count()
    want = {(r["doc_id"], r["cluster_id"]) for r in dup_clusters(pairs).collect()}

    with open(progress) as f:
        sizes = [int(line.split()[1]) for line in f]
    fails: list[str] = []
    if got != want:
        fails.append(f"final labels != batch closure ({len(got ^ want)} diffs)")
    if max(sizes) > CC_DOC_SPACE:
        fails.append(f"label table exceeded doc space: {max(sizes)}")
    if any(b_ < a_ for a_, b_ in zip(sizes, sizes[1:])):
        fails.append("label table shrank between increments")

    print(
        f"pair log: {n_pairs} rows ({n_distinct} distinct — replayed "
        f"duplicates are the recovery working as designed)"
    )
    print(f"label snapshot v={version}: {len(got)} docs; closure: {len(want)} docs")
    print(f"label-size series min/max: {min(sizes)}/{max(sizes)}")
    print(
        "closure equality across the kill/restart boundary: "
        + ("OK" if got == want else "MISMATCH")
    )
    print(
        f"\nCC KILL SOAK DONE in {(time.time() - t00) / 60:.1f} min; FAILS: {fails}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
