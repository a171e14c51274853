"""Iterative graph analytics over relational edge lists.

Connected components (pointer-jumping label propagation) lives in
`dedup.py` where its consumer is; this module holds the general
iterative-computation pattern: PageRank as unrolled DataFrame rounds.
The reference system has no graph surface at all (its whole topology
is one Kafka-Streams count, reference:
src/main/java/.../PageEventHandler.java:26-60); this is north-star
extension surface for influence/importance scoring over entity graphs
(e.g. domain-link authority as a training-data quality prior).

Scale shape per iteration: ONE shuffle join of the edge list against
the node-sized rank frame plus one map-side-combinable destination
aggregate — the textbook distributed PageRank step. Ranks are never
collected; the damping/teleport constant attaches as a broadcast 1-row
aggregate. For long runs, `checkpoint_every` truncates plan lineage
with localCheckpoint (same discipline as dedup.py's pointer jumping);
short unrolled runs (the oracle-checked form) skip it so the whole
computation stays one lazily-planned DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 0,
    assume_unique_bipartite: bool = False,
) -> DataFrame:
    """Undirected PageRank: symmetrize the edge list, run
    ``iterations`` synchronous rounds of
    r'(v) = (1-d)/N + d * Σ_{u~v} r(u)/deg(u), starting uniform.
    Returns (node, rank). Every node appears in the symmetrized edge
    list, so there are no dangling nodes by construction.

    ``assume_unique_bipartite=True`` is a CALLER-ASSERTED contract:
    the input pairs are already unique AND the two node namespaces
    are disjoint (a bipartite graph), so the symmetrized union needs
    no dedup shuffle — for a bipartite fact-derived graph that
    removes the single largest stage of the whole computation. The
    name carries the precondition because the function cannot cheaply
    verify it at scale (checking would cost exactly the distinct
    shuffle the flag exists to skip); violating it yields silently
    inflated degrees and wrong ranks."""
    # Symmetrize in ONE pass over `edges` (the dup_clusters explode
    # device, r12): the union-of-two-selects form executed the caller's
    # edge subplan (its DISTINCT exchange included) once per branch —
    # the before-plan showed every replay of this subtree paying two
    # hashpartitioning(src, dst) exchanges where one suffices.
    e = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
                F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    if not assume_unique_bipartite:
        e = e.distinct()
    # Materialize the node-grain degree table ONCE (r12): deg feeds
    # n1, the uniform seed ranks AND the e_deg join — unmaterialized,
    # each reference replayed the full edge pipeline (the before-plan
    # carried four copies of the distinct+aggregate subtree; after,
    # one). Node-grain, so the cut stays small at any corpus size.
    deg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=False)
    )
    # Materialize the degree-annotated edge list ONCE: every iteration
    # joins against e_deg, and deg/n1/ranks all hang off the same
    # union+distinct subtree — unmaterialized, Spark replays that
    # full upstream plan once per reference (measured 14.6 s for two
    # unrolled rounds at sf0.1; ~4 s with the checkpoint). Same
    # discipline as dedup.py's pointer jumping; on a cluster this is
    # the edge list pinned in executor storage across supersteps.
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    n1 = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = deg.crossJoin(F.broadcast(n1)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for i in range(iterations):
        contribs = (
            e_deg.join(ranks, F.col("src") == F.col("node"))
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = contribs.crossJoin(F.broadcast(n1)).select(
            F.col("dst").alias("node"),
            ((1.0 - damping) / F.col("n_nodes") + damping * F.col("s")).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(
    edges: DataFrame, a: str = "a", b: str = "b", max_degree: int | None = None
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list given in canonical (a < b) form. Joins follow the sorted-id
    orientation (Suri & Vassilvitskii, "Counting Triangles and the
    Curse of the Last Reducer", WWW'11): every triangle x<y<z is
    enumerated exactly once as the wedge (x,y)+(y,z) closed by (x,z),
    so no triangle is double-counted and a hot node's wedge work is
    split across the two lower-id endpoints instead of all landing on
    it. Returns (node, n_triangles) for nodes in ≥1 triangle.

    Scale shape: two shuffle joins on single node keys — the standard
    distributed triangle plan. The edge list is localCheckpoint'd
    FIRST: all three join branches read it, and an unmaterialized
    subplan would replay the (expensive) pair-generation pipeline
    once per branch (measured 14.1 s → ~6 s on the simhash dup graph).
    For power-law graphs the classic refinement (orient by degree,
    not id) bounds wedge counts by O(m^1.5) total; id orientation
    keeps the oracle replayable and is exact regardless.

    ``max_degree`` is this operator's hard work bound (the dedup ops'
    max_bucket discipline): triangle MASS in near-clique dup families
    grows as Σ k³ — five verbatim corpus copies turn 13M triangles
    into 1.6B. With the cap, edges incident to any node of degree >
    max_degree are dropped BEFORE wedge generation, so both the wedge
    count and the output are bounded by m·max_degree no matter how
    large a duplicate family grows; the pruning is a deterministic
    degree filter the oracle replays exactly. None = exact/uncapped."""
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    if max_degree is not None:
        # Materialize the INPUT pairs before the degree pass: deg's
        # two-branch union and the two keep-joins all read `e`, and an
        # unmaterialized edge list replays its (often expensive —
        # simhash-Hamming here) derivation once per branch (r4 driver
        # billed 13.9 s, ~4.5 s of it recompute; ~2× saved by pinning).
        e = e.localCheckpoint(eager=False)
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") <= max_degree).select("node")
        e = e.join(
            keep.withColumnRenamed("node", "a"), "a"
        ).join(keep.withColumnRenamed("node", "b"), "b")
    e = e.localCheckpoint(eager=False)
    # wedge (a,b)+(b,c): name-based joins keep the self-join lineage
    # unambiguous (USING-join dedups the shared columns)
    wedge = e.join(e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b")
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedge.join(closing, ["a", "c"]).select("a", "b", "c")
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def degree_distribution(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Degree histogram of an undirected edge list: (deg, n_nodes) —
    the connectivity-health diagnostic for the near-dup graph (a long
    high-degree tail means viral boilerplate families that will chain
    under transitive closure; `triangle_counts` tells you whether
    those families are coherent, this tells you how big they are
    BEFORE any capping).

    Two map-side-combined aggregations: union of endpoints → count by
    node (shuffle keyed on node id), then count by degree (shuffle
    carries one row per distinct degree — tiny). No joins, no windows;
    at 100 TB the node-keyed aggregate is the same shape as any word
    count."""
    nodes = pairs.select(F.col(a).alias("node")).unionAll(
        pairs.select(F.col(b).alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))


def common_neighbor_scores(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_degree: int | None = 64,
    top_k: int = 50,
) -> DataFrame:
    """Link prediction over an undirected (a < b) edge list: for every
    NON-edge node pair sharing at least one neighbor, the common-
    neighbor count and Jaccard coefficient |N(u)∩N(v)| / |N(u)∪N(v)|
    (Liben-Nowell & Kleinberg CIKM'03). On the near-dup graph these
    are the "missing edge" candidates: two documents whose neighbor
    sets overlap heavily but that no blocking pass ever compared —
    the audit that catches LSH/SimHash recall gaps before a
    transitive-closure dedup splits one true family into two.

    Returns the top_k (doc_a, doc_b, common, jaccard) candidates,
    ordered by common DESC then ids — an exact integer-first order
    both engines reproduce bit-identically.

    Scale shape: symmetrize the edge list (2m rows), degree-cap as in
    `triangle_counts` (wedge mass through a hub grows as deg², so
    edges at nodes with degree > max_degree drop BEFORE the self-join
    — bounded at 2m·max_degree wedges no matter how viral a dup
    family gets), one self-join on the shared-neighbor key, a
    pair-keyed count, an anti-join against the real edges, two
    broadcast-ready degree joins, and a TakeOrdered top-k. Every join
    key is a single node/pair id; no windows, no collects."""
    e = pairs.select(F.col(a).alias("a"), F.col(b).alias("b")).localCheckpoint(
        eager=False
    )
    # symmetric adjacency: (node, neighbor) both directions
    adj = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    if max_degree is not None:
        keep = deg.filter(F.col("deg") <= max_degree).select("node")
        adj = adj.join(keep, "node").join(
            keep.withColumnRenamed("node", "nbr"), "nbr"
        )
    adj = adj.localCheckpoint(eager=False)
    # degrees of the SAME (capped) graph the wedge numerator sees —
    # mixing capped |N∩| with uncapped |N| would make jaccard an
    # internally inconsistent underestimate when the cap trims hubs
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # wedge through the shared neighbor: (u, v) with u < v via the hub
    left = adj.select(F.col("nbr").alias("hub"), F.col("node").alias("u"))
    right = adj.select(F.col("nbr").alias("hub"), F.col("node").alias("v"))
    cand = (
        left.join(right, "hub")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    # drop pairs that are already edges (canonical a < b matches u < v)
    cand = cand.join(
        e.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            "common",
            (
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("common"), "doc_a", "doc_b").limit(top_k)


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    assume_unique_oriented: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """k-core decomposition by ``rounds`` unrolled peeling supersteps
    (Seidman 1983; the distributed peel of Montresor et al. 2013):
    repeatedly drop nodes of degree < k together with their edges;
    the fixpoint is the exact k-core. A FIXED round count keeps the
    computation oracle-replayable as chained SQL CTEs (the same
    contract as `pagerank`'s unrolled iterations); `converged` on
    every output row reports whether the LAST round removed nothing —
    when true the result IS the exact k-core, when false it is a
    sound over-approximation (only non-members were removed; callers
    add rounds). Tests pin convergence at the fixture scales.

    ``assume_unique_oriented=True`` is the caller-asserted contract
    of `pagerank`'s bipartite flag, generalized: the input pairs are
    unique AND strictly oriented (a < b, or disjoint src/dst
    namespaces), so symmetrization needs no dedup shuffle.

    Returns (node, deg, converged): surviving nodes with their
    within-core degree.

    Scale shape per round: one groupBy of the live edge list for
    degrees, then one semi-join per endpoint against the surviving-
    node set — no node ever sees more than its own edges, and the
    edge frame only shrinks. The live edge list is localCheckpoint'd
    each round to cut the exponentially nesting lineage (same
    discipline as `pagerank` / dedup pointer-jumping); on a cluster
    this is the shrinking edge list pinned in executor storage."""
    assert rounds >= 1, "kcore_peel needs at least one peeling round"
    # one-pass symmetrize (explode, not union-of-selects) — the
    # upstream edge subplan executes once per materialization instead
    # of once per union branch (r12, same device as dup_clusters)
    e = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
                F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    if not assume_unique_oriented:
        e = e.distinct()

    def _cut(df):
        # checkpoint=False keeps the full lineage visible — the plan
        # tests read the semi-join structure that localCheckpoint
        # truncates to an ExistingRDD scan in the executed plan.
        return df.localCheckpoint(eager=False) if checkpoint else df

    e = _cut(e)
    removed_any_last = None
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        live = deg.filter(F.col("deg") >= k).select("src")
        removed_any_last = deg.agg(
            F.sum(F.when(F.col("deg") < k, 1).otherwise(0)).alias("n_removed")
        )
        e = _cut(
            e.join(live, "src", "left_semi").join(
                live.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
        )
    final_deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return final_deg.crossJoin(F.broadcast(removed_any_last)).select(
        F.col("src").alias("node"),
        "deg",
        (F.coalesce(F.col("n_removed"), F.lit(0)) == 0).alias("converged"),
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    assume_unique_oriented: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007): every node starts as its own label; each round it
    adopts the most frequent label among its neighbors, ties broken
    to the SMALLEST label — the deterministic variant of LPA's random
    tie-break, so a fixed round count is exactly replayable as
    chained SQL CTEs (the `pagerank`/`kcore_peel` contract).

    Where connected components answer "touching at all" and the
    k-core answers "how densely attached", LPA splits a component
    into its internally-dense communities: a chain of two cliques
    sharing one bridge doc keeps two labels.

    Returns (node, community, stable): `stable` is true when the last
    round changed NO label — synchronous LPA can two-cycle on
    bipartite-ish structure, so the fixpoint flag is per-run honesty,
    not an afterthought (tests pin it true at fixture scales).

    Scale shape per round: one edge ⋈ label join (label frame is
    node-grain) + one (dst, label) map-side-combined count + one
    node-grain argmin — per-node state bounded by its degree's
    distinct labels. Same checkpoint discipline as the other
    iterative operators."""
    # one-pass symmetrize (explode, not union-of-selects) — the
    # upstream edge subplan executes once per materialization instead
    # of once per union branch (r12, same device as dup_clusters)
    e = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
                F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    if not assume_unique_oriented:
        e = e.distinct()

    def _cut(df):
        return df.localCheckpoint(eager=False) if checkpoint else df

    assert rounds >= 1, "label_propagation needs at least one round"
    e = _cut(e)
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    prev = labels
    for i in range(rounds):
        prev = labels
        counted = (
            e.join(labels, F.col("src") == F.col("node"))
            .groupBy("dst", "lab")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        labels = _cut(
            counted.groupBy("dst")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("lab"))).alias("m"))
            .select(F.col("dst").alias("node"), F.col("m.lab").alias("lab"))
        )
    changed = (
        labels.join(
            prev.select(F.col("node"), F.col("lab").alias("plab")), "node"
        )
        .agg(
            F.sum(F.when(F.col("lab") != F.col("plab"), 1).otherwise(0)).alias(
                "n_changed"
            )
        )
    )
    return labels.crossJoin(F.broadcast(changed)).select(
        "node",
        F.col("lab").alias("community"),
        (F.coalesce(F.col("n_changed"), F.lit(0)) == 0).alias("stable"),
    )
