"""cap_per_key: deterministic stratified capping, skew-safe two-phase plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.operators.sample import cap_per_key


@pytest.fixture(scope="module")
def docs(spark):
    # 3 keys with very different sizes: a "hot domain" (200 rows), a
    # mid one (40), and one under the cap (3)
    rows = ([(i, "hot") for i in range(200)]
            + [(1000 + i, "mid") for i in range(40)]
            + [(2000 + i, "tiny") for i in range(3)])
    return spark.createDataFrame(rows, ["doc_id", "source"]).cache()


def brute(rows, cap):
    """Independent recomputation: per key, the cap smallest (md5, id)."""
    by_key: dict[str, list] = {}
    for i, k in rows:
        by_key.setdefault(k, []).append(
            (hashlib.md5(str(i).encode()).hexdigest(), i))
    keep = set()
    for k, lst in by_key.items():
        for _, i in sorted(lst)[:cap]:
            keep.add(i)
    return keep


@pytest.mark.parametrize("cap", [1, 7, 25])
@pytest.mark.parametrize("salts", [1, 4, 16])
def test_matches_brute_force(docs, cap, salts):
    got = {r["doc_id"] for r in
           cap_per_key(docs, "source", cap, salts=salts).collect()}
    want = brute([(r["doc_id"], r["source"]) for r in docs.collect()], cap)
    assert got == want  # exact kept SET, not just counts


def test_salt_invariance(docs):
    """The salt shapes the shuffle, never the result."""
    a = {r["doc_id"] for r in cap_per_key(docs, "source", 9,
                                          salts=1).collect()}
    for s in (2, 5, 16, 64):
        b = {r["doc_id"] for r in cap_per_key(docs, "source", 9,
                                              salts=s).collect()}
        assert b == a, f"salts={s} changed the kept set"


def test_under_cap_key_kept_whole(docs):
    out = cap_per_key(docs, "source", 7)
    counts = {r["source"]: r["c"] for r in
              out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {"hot": 7, "mid": 7, "tiny": 3}


def test_custom_priority(docs):
    """priority_col: keep the LOWEST doc_ids per key (ascending order)."""
    out = cap_per_key(docs, "source", 2,
                      priority_col=F.col("doc_id").cast("double"))
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [0, 1, 1000, 1001, 2000, 2001]


def test_columns_unchanged(docs):
    out = cap_per_key(docs.withColumn("extra", F.lit("x")), "source", 3)
    assert out.columns == ["doc_id", "source", "extra"]
    assert out.filter(F.col("extra") != "x").count() == 0


def test_phase1_bounds_hot_key(docs):
    """Plan shape: with salts>1 the final per-key window is fed by the
    salted partial top-cap — a hot key contributes at most cap*salts rows
    to phase 2 (the skew bound), checked by running phase 1 standalone."""
    cap, salts = 5, 8
    pr = F.md5(F.col("doc_id").cast("string"))
    from pyspark.sql import Window
    w1 = (Window.partitionBy("source", "_salt")
          .orderBy(F.col("_pr").asc(), F.col("doc_id").asc()))
    phase1 = (docs.withColumn("_pr", pr)
              .withColumn("_salt", F.pmod(F.xxhash64(F.col("doc_id")),
                                          F.lit(salts)))
              .withColumn("_rn", F.row_number().over(w1))
              .filter(F.col("_rn") <= cap))
    per_key = {r["source"]: r["c"] for r in
               phase1.groupBy("source").agg(F.count("*").alias("c"))
               .collect()}
    assert per_key["hot"] <= cap * salts
    # and the two windowed exchanges are both hash partitioned (no
    # single-partition global window anywhere in the plan)
    plan = cap_per_key(docs, "source", cap,
                       salts=salts)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "SinglePartition" not in plan


def test_native_group_limit_plan(docs):
    """The salts=1 default leans on Spark's InferWindowGroupLimit for the
    map-side skew bound: the physical plan must carry a PARTIAL
    WindowGroupLimit (runs before the exchange, caps each map task's
    per-key contribution) — the native equivalent of phase 1. If a Spark
    upgrade ever stops inferring it, this test fails and the default
    should flip back to salts>1 (see operators/sample.py docstring)."""
    plan = cap_per_key(docs, "source", 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
    assert "SinglePartition" not in plan


def test_validation(docs):
    with pytest.raises(ValueError):
        cap_per_key(docs, "source", 0)
    with pytest.raises(ValueError):
        cap_per_key(docs, "source", 3, salts=0)


# ---------------------------------------------------------------- weighted

def brute_wsample(rows, n, salt=""):
    """Independent recomputation: n smallest -ln(u)/w with u from md5."""
    import math

    def key(i, w):
        u = int(hashlib.md5((str(i) + salt).encode()).hexdigest()[:13],
                16) / 2 ** 52
        return -math.log(u) / w
    return [i for i, w in sorted(rows, key=lambda t: (key(*t), t[0]))[:n]]


@pytest.fixture(scope="module")
def weighted(spark):
    rows = [(i, float(i % 13 + 1)) for i in range(500)]
    return (spark.createDataFrame(rows, ["doc_id", "w"]).cache(), rows)


@pytest.mark.parametrize("n", [1, 20, 100])
def test_wsample_matches_brute_force(weighted, n):
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df, rows = weighted
    got = [r["doc_id"] for r in
           weighted_sample_n(df, n, "w").orderBy("doc_id").collect()]
    assert got == sorted(brute_wsample(rows, n))


def test_wsample_salt_draws_independent_samples(weighted):
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df, rows = weighted
    a = {r["doc_id"] for r in weighted_sample_n(df, 50, "w").collect()}
    b = {r["doc_id"] for r in
         weighted_sample_n(df, 50, "w", salt="round2").collect()}
    assert a == set(brute_wsample(rows, 50))
    assert b == set(brute_wsample(rows, 50, salt="round2"))
    assert a != b  # different salt, different draw
    # re-run is identical (determinism)
    assert a == {r["doc_id"]
                 for r in weighted_sample_n(df, 50, "w").collect()}


def test_wsample_weight_bias(weighted):
    """Heavier rows must be sampled more often: mean weight of the kept
    half should clearly exceed the corpus mean (7.0 for weights 1..13)."""
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df, _ = weighted
    kept = weighted_sample_n(df, 100, "w").collect()
    mean_w = sum(r["w"] for r in kept) / len(kept)
    assert mean_w > 7.5, mean_w


def test_wsample_excludes_nonpositive_and_null(spark):
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 3.0)],
        ["doc_id", "w"])
    got = {r["doc_id"] for r in weighted_sample_n(df, 10, "w").collect()}
    assert got == {1, 5}


def test_wsample_plan_is_take_ordered(weighted):
    """No shuffle, no global sort: the plan must be TakeOrderedAndProject
    (size-n heap per partition, partials merged on the driver)."""
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df, _ = weighted
    plan = weighted_sample_n(df, 10, "w")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_wsample_validation(weighted):
    from pysearchlite_spark.operators.sample import weighted_sample_n
    df, _ = weighted
    with pytest.raises(ValueError):
        weighted_sample_n(df, 0, "w")
