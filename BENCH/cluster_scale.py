"""Scale/shape proof for operators/cluster.py connected components.

Three adversarial structures in ONE pair set (~1.1M edges, 1.2M nodes):
  * 90k length-10 chains             — the common case: many small comps
  * one 100k-node path               — worst case for label propagation
    (O(diameter) rounds); alternating star must stay O(log n)
  * one 200k-leaf hub star           — skew: a single doc duplicated 200k
    times; no neighborhood array may materialize on one task

Records rounds-to-converge, wall time, and exact component checks.
Usage: python BENCH/cluster_scale.py  (local[32], ~1-2 min)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pysearchlite_spark.session import get_spark  # noqa: E402
from pysearchlite_spark.operators import cluster as C  # noqa: E402


def main() -> None:
    spark = get_spark("cluster-scale", master="local[32]",
                      shuffle_partitions=64)
    out = {"n_chains": 90_000, "chain_len": 10,
           "path_len": 100_000, "hub_leaves": 200_000}

    # node-id layout: chains in [0, 1M), path in [2M, 2.1M), hub at 3M
    chains = spark.range(0, 900_000).where((F.col("id") % 10) != 9).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    path = spark.range(2_000_000, 2_100_000 - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    hub = spark.range(3_000_001, 3_200_001).select(
        F.lit(3_000_000).alias("a"), F.col("id").alias("b"))
    pairs = chains.union(path).union(hub)
    n_edges = pairs.count()  # materialize input before timing
    out["n_edges"] = n_edges

    rounds = {"n": 0}
    orig = C._small_star

    def counting_small_star(e):
        rounds["n"] += 1
        return orig(e)

    C._small_star = counting_small_star
    t0 = time.monotonic()
    cc = C.connected_components(pairs).persist()
    n_rows = cc.count()
    out["cc_sec"] = round(time.monotonic() - t0, 2)
    out["rounds"] = rounds["n"]
    out["n_mapped_nodes"] = n_rows

    # exact checks: every structure collapses to its min id
    agg = (cc.groupBy("cluster").agg(F.count("*").alias("sz"))
           .groupBy("sz").agg(F.count("*").alias("n_comps"))
           .collect())
    sizes = {int(r["sz"]): int(r["n_comps"]) for r in agg}
    out["comp_size_histogram"] = sizes
    ok_chains = sizes.get(10, 0) == 90_000  # 900k ids / 10 per chain
    ok_path = sizes.get(100_000, 0) == 1
    ok_hub = sizes.get(200_001, 0) == 1
    path_root = (cc.where(F.col("node") == 2_099_999)
                 .collect()[0]["cluster"])
    hub_root = (cc.where(F.col("node") == 3_200_000)
                .collect()[0]["cluster"])
    out["checks"] = {
        "chains_10x90k": bool(ok_chains),
        "path_single_comp": bool(ok_path),
        "hub_single_comp": bool(ok_hub),
        "path_root_is_min": path_root == 2_000_000,
        "hub_root_is_min": hub_root == 3_000_000,
    }
    assert all(out["checks"].values()), out["checks"]
    cc.unpersist()

    # typical shape: real dedup graphs are near-cliques (tiny diameter) —
    # without the adversarial path the round count is the common case
    rounds["n"] = 0
    try:
        t0 = time.monotonic()
        cc2 = C.connected_components(chains.union(hub))
        n2 = cc2.count()
        out["typical_sec"] = round(time.monotonic() - t0, 2)
        out["typical_rounds"] = rounds["n"]
        out["typical_nodes"] = n2
    finally:
        C._small_star = orig
    spark.stop()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cluster_scale.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
