"""Connected-components clustering of duplicate-candidate pairs.

The pair generators (exact / minhash / simhash / token-jaccard / cosine)
emit EDGES; a real dedup pipeline needs the transitive closure — duplicate
GROUPS with one canonical representative per group, so "keep one copy per
cluster" becomes a plain filter. (The reference engine has no dedup surface
at all — this extends the pipeline-operator family the same way
operators/dedup.py does.)

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), expressed
entirely in DataFrame ops:

- each round is two star transforms, each a map-side-combinable
  groupBy-min + same-key join + dedup (a constant handful of
  key-partitioned exchanges of the SHRINKING edge set) — no collect_list
  neighborhood materialization, so a hot hub node (one doc duplicated a
  million times) never builds a million-element array on one task;
- converges in O(log n) rounds even on adversarial path graphs (plain
  min-label propagation needs O(diameter));
- per-round localCheckpoint truncates the lineage so the plan does not
  deepen with iterations (on a real cluster point spark.checkpoint.dir at
  durable storage and this also bounds recovery cost).

The fixed point is a star per component: every member points at the
component's minimum node id, which becomes the cluster id.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Convergence signatures sum per-edge hashes; keep each term < 2^30 so the
# sum of even 10^9 of them stays far from long overflow (ANSI mode throws).
_SIG_MOD = 1_000_000_007


def _canonical(e: DataFrame) -> DataFrame:
    """Orient every edge large→small, drop self-loops and duplicates."""
    return (e.select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _signature(e: DataFrame) -> tuple:
    """Cheap one-action set signature (count + bounded hash sum): equal
    signatures on canonicalized edge sets ⇒ converged. A collision would
    only stop iteration early — max_rounds plus the star-shape check in
    the tests bound the damage — and needs count AND sum to collide."""
    row = e.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(_SIG_MOD))).alias("h")
    ).collect()[0]
    return (row["c"], row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    m = min(Γ(u) ∪ {u}). Cuts long chains in half each round."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .withColumn("m", F.least("mn", "u")).drop("mn"))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u over its SMALLER neighbors N(u): connect every
    v ∈ N(u) ∪ {u} to m = min(N(u)). Flattens local trees into stars.
    Input contract: already canonical (large→small oriented, no
    self-loops, distinct) — _large_star's output is (it emits (v, m)
    with v > u ≥ m and ends in distinct()), and connected_components
    canonicalizes the initial edge set; re-canonicalizing here would add
    a full extra exchange+aggregate of the edge set every round."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    out = (e.join(mins, "u")
           .select(F.col("v").alias("u"), F.col("m").alias("v"))
           .union(mins.select(F.col("u"), F.col("m").alias("v")))
           .where(F.col("u") != F.col("v"))
           .distinct())
    return out


def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_rounds: int = 50) -> DataFrame:
    """Transitive closure of an undirected pair list → (node, cluster)
    for EVERY node that appears in `pairs` (including nodes whose only
    appearance is a self-loop — they map to themselves); cluster = the
    component's minimum node id. Nodes absent from `pairs` entirely are
    singletons — callers cover them with a left join +
    coalesce(cluster, id) (dedup_clusters)."""
    # LAZY checkpoint of the RAW edge set too: `raw` is consumed by the
    # canonicalized iteration AND (much later) by the nodes/loners pass —
    # without its own checkpoint the caller's whole pair-generation plan
    # (an LSH bucket join or a token inverted-index self-join) re-executes
    # once per extra consumer (measured: dedup_clusters ran the pair plan
    # 3-4x; this cuts it to once)
    raw = (pairs.select(F.col(a).cast("long").alias("u"),
                        F.col(b).cast("long").alias("v"))
           .localCheckpoint(eager=False))
    # LAZY checkpoint: the signature aggregate is the round's only action
    # and its scan materializes the checkpoint as a side effect — eager
    # checkpointing would run a second full job per round purely to
    # write the same partitions (measured: CC rounds are dispatch-bound
    # at bench scale, so this halves the per-round fixed cost)
    e = _canonical(raw).localCheckpoint(eager=False)
    sig = _signature(e)
    if sig[0] > 0:
        for _ in range(max_rounds):
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            nxt = _signature(e)
            if nxt == sig:
                break
            sig = nxt
        else:  # pragma: no cover - max_rounds ~2x the log2 of any real n
            raise RuntimeError(
                f"connected_components did not converge in "
                f"{max_rounds} rounds")
    members = e.select(F.col("u").alias("node"), F.col("v").alias("cluster"))
    roots = (e.select(F.col("v").alias("node")).distinct()
             .withColumn("cluster", F.col("node")))
    mapping = members.union(roots)
    # nodes whose only edges were self-loops vanish in canonicalization;
    # the contract still owes them a (node, node) row
    nodes = (raw.select(F.col("u").alias("node"))
             .union(raw.select(F.col("v").alias("node"))).distinct())
    loners = (nodes.join(mapping.select("node").distinct(), "node",
                         "left_anti")
              .withColumn("cluster", F.col("node")))
    return mapping.union(loners)


def dedup_clusters(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   pairs: Optional[DataFrame] = None,
                   threshold: float = 0.8, max_df: int = 1000) -> DataFrame:
    """Document-level dedup verdicts: (doc_id, cluster_id, is_dup) for
    EVERY document — cluster_id is the minimum doc id of the near-dup
    component (transitive closure over token-Jaccard pairs by default;
    pass `pairs` (a, b) to cluster any other generator's output), and
    is_dup=false exactly for the one kept representative per cluster, so
    `filter(~is_dup)` is the keep-list."""
    if pairs is None:
        from pysearchlite_spark.operators.dedup import token_jaccard_pairs
        pairs = token_jaccard_pairs(df, id_col=id_col, text_col=text_col,
                                    threshold=threshold, max_df=max_df)
    cc = connected_components(pairs)
    return (df.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster", "doc_id"))
            .drop("cluster")
            .withColumn("is_dup", F.col("doc_id") != F.col("cluster_id")))
