"""Streaming Misra-Gries heavy hitters — the live twin of
`operators/sketches.py::heavy_hitters`, the way `dedup_stream` twins
the batch near-dup gate: an unbounded key stream (URLs, user ids,
query strings) is tracked with BOUNDED state forever, so "what's hot
right now" is answerable at any trigger without a distinct-key
shuffle that grows with the key space.

Sharding makes the global sketch a keyed-state problem: items hash
into ``n_shards`` groups, each group's `applyInPandasWithState` state
is ONE Misra-Gries summary of ≤ k counters (two parallel arrays in
the GroupState — O(k) per shard forever). An item lives in exactly
one shard, so each summary obeys the per-shard guarantee (count ≥
true − n_shard/(k+1)); summing any item's counters across shards (it
has exactly one) keeps the mergeable-summaries lower-bound invariant,
and every item with global frequency > n/(k+1) survives in its shard.

Per trigger each updated shard emits its current counters as
changelog rows (shard, item, lower_bound) — ≤ n_shards·k rows per
trigger regardless of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ..operators.hashing import xhash
from ..operators.sketches import _mg_fold

HH_SCHEMA = "shard INT, item STRING, lower_bound LONG"
_STATE_SCHEMA = "items ARRAY<STRING>, counts ARRAY<LONG>"


def _make_updater(k: int):
    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            items, counts = state.get
            counters = dict(zip(list(items), [int(c) for c in counts]))
        else:
            counters = {}
        for pdf in pdfs:
            if pdf.empty:
                continue
            counters = _mg_fold(counters, pdf["item"].value_counts(), k)
        state.update((list(counters), [int(c) for c in counters.values()]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters),
                "lower_bound": list(counters.values()),
            }
        )

    return update


def running_heavy_hitters(
    stream: DataFrame, item_col: str, k: int = 16, n_shards: int = 8
) -> DataFrame:
    """Changelog stream of (shard, item, lower_bound): each trigger
    re-emits the current ≤k-counter summary of every shard that saw
    data. Downstream merges by taking each item's latest row (items
    are shard-unique, so no cross-shard summation is ever needed)."""
    sharded = stream.select(
        (xhash(F.col(item_col).cast("string")) % n_shards).cast("int").alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_updater(k),
        outputStructType=HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
