"""Dedup operators vs brute-force single-node oracles."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.operators.dedup import (exact_dedup,
                                                minhash_lsh_pairs,
                                                simhash_pairs,
                                                token_jaccard_pairs)
from pysearchlite_spark.tokenizer import normalized_tokens


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(10, 40)))))
    # planted exact dups
    docs.append((60, docs[3][1]))
    docs.append((61, docs[3][1]))
    docs.append((62, docs[10][1]))
    # planted near-dups (one token changed)
    toks = docs[5][1].split()
    toks[0] = "CHANGED"
    docs.append((63, " ".join(toks)))
    return docs


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    return spark.createDataFrame(corpus, "doc_id long, text string")


def test_exact_dedup(docs_df, corpus):
    got = {r["doc_id"]: (r["keep_id"], r["is_dup"])
           for r in exact_dedup(docs_df).collect()}
    text_min = {}
    for i, t in corpus:
        text_min.setdefault(t, i)
    for i, t in corpus:
        assert got[i] == (text_min[t], i != text_min[t])


def test_exact_dedup_null_text(spark):
    """NULL text must not vanish from the output: sha2(NULL) is NULL and
    NULL join keys never match, which silently dropped those rows before
    the coalesce('') fix — NULL now groups with empty text, matching the
    minhash/simhash tokenizer's fillna('')."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["keep_id"], r["is_dup"])
           for r in exact_dedup(df).collect()}
    assert got == {1: (1, False), 2: (1, True),
                   3: (3, False), 4: (1, True)}


def _jaccard(a, b):
    sa, sb = set(normalized_tokens(a)), set(normalized_tokens(b))
    if not sa | sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_token_jaccard_pairs_exact(docs_df, corpus):
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in token_jaccard_pairs(docs_df, threshold=0.5,
                                        max_df=10**9).collect()}
    want = {}
    for (i, ti), (j, tj) in itertools.combinations(corpus, 2):
        jac = _jaccard(ti, tj)
        if jac >= 0.5:
            want[(min(i, j), max(i, j))] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_minhash_lsh_finds_near_dups(docs_df, corpus):
    got = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    # exact dups must be found (jaccard 1.0 → identical signatures)
    assert (3, 60) in got and (3, 61) in got and (60, 61) in got
    assert (10, 62) in got
    # the one-token-changed near-dup has jaccard >~0.95
    assert (5, 63) in got
    # no false positives below threshold: verify against brute force
    for a, b in got:
        ta = dict(corpus)[a]
        tb = dict(corpus)[b]
        assert _jaccard(ta, tb) >= 0.5


def test_token_jaccard_bounded_max_df(spark):
    """Bounded candidate generation (the 100-TB configuration): pairs
    sharing ONLY hot tokens (df > max_df) are excluded by design — the
    documented exactness condition is 'shares >= 1 token with df <=
    max_df'; pairs with a rare shared token keep exact jaccard values."""
    hot = "the and of common words everywhere always present tokens here"
    docs = (
        # pair 0: all-hot pair, high jaccard, NO rare shared token
        [(0, hot), (1, hot)]
        # pair 2-3: hot + one shared rare token
        + [(2, hot + " rareshared"), (3, hot + " rareshared")]
        # fillers so the hot tokens exceed max_df=4
        + [(10 + i, hot + f" filler{i}") for i in range(8)])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           token_jaccard_pairs(df, threshold=0.5, max_df=4).collect()}
    assert (0, 1) not in got          # only-hot pair excluded by the bound
    assert got.get((2, 3)) == pytest.approx(1.0)
    # unbounded finds the all-hot pair too (exactness reference)
    full = {(r["a"], r["b"]) for r in
            token_jaccard_pairs(df, threshold=0.5, max_df=10**9).collect()}
    assert (0, 1) in full and (2, 3) in full


def test_degenerate_corpus_bounded(spark):
    """Scale guard: >=10k identical docs + planted near-identical pairs.
    Uncapped LSH would self-join one bucket into ~50M candidate pairs; the
    capped path must finish with O(n) output (star pairs), still find the
    planted near-dups living outside the giant cluster, and report the
    oversized buckets through lsh_oversize_stats (no silent truncation)."""
    from pysearchlite_spark.operators.dedup import (lsh_oversize_stats,
                                                    minhash_buckets,
                                                    simhash_buckets)
    n = 10_000
    boiler = "cookie policy accept terms privacy all rights reserved " \
             "subscribe newsletter copyright twenty twenty four"
    docs = [(i, boiler) for i in range(n)]
    # near-dup pair far from the cluster
    base = " ".join(f"unique{j} token{j * 7 % 13}" for j in range(30))
    docs.append((n, base))
    docs.append((n + 1, base.replace("unique3", "CHANGED")))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    cap = 50
    pairs = minhash_lsh_pairs(df, threshold=0.5, max_bucket=cap).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    # bounded: star pairs over the cluster, not quadratic
    assert len(got) <= 4 * (n + 2), len(got)
    # the identical cluster is fully connected through its representative
    assert {(0, b) for b in range(1, n)} <= got
    # the outside near-dup pair is found via normal small buckets
    assert (n, n + 1) in got
    # the cap's effect is observable
    over = lsh_oversize_stats(minhash_buckets(df), ["band", "bh"], cap)
    assert over.count() > 0

    spairs = simhash_pairs(df, max_hamming=3, max_bucket=cap).collect()
    sgot = {(r["a"], r["b"]): r["hamming"] for r in spairs}
    assert len(sgot) <= 4 * (n + 2), len(sgot)
    assert all(sgot[(0, b)] == 0 for b in range(1, n))
    assert lsh_oversize_stats(simhash_buckets(df), ["c", "v"],
                              cap).count() > 0


def test_capped_equals_uncapped_on_normal_corpus(docs_df):
    """On a non-degenerate corpus a tight cap must not change results —
    pairs found via star+rep edges verify to the same (a,b,jaccard) set."""
    base = {(r["a"], r["b"], r["jaccard"]) for r in
            minhash_lsh_pairs(docs_df, threshold=0.5,
                              max_bucket=10**6).collect()}
    capped = {(r["a"], r["b"], r["jaccard"]) for r in
              minhash_lsh_pairs(docs_df, threshold=0.5,
                                max_bucket=3).collect()}
    # capping may only LOSE pairs relative to uncapped, never invent them,
    # and the planted dups must survive even a cap of 3
    assert capped <= base
    keys = {(a, b) for a, b, _ in capped}
    assert {(3, 60), (3, 61), (60, 61), (10, 62), (5, 63)} <= keys


def test_simhash_pairs_find_exact_dups(docs_df):
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(docs_df, max_hamming=3).collect()}
    assert got.get((3, 60)) == 0
    assert got.get((3, 61)) == 0
    assert got.get((60, 61)) == 0
    assert got.get((10, 62)) == 0
    # all reported pairs honor the distance bound
    assert all(h <= 3 for h in got.values())
    # (the one-token-changed near-dup (5, 63) may legitimately exceed
    # hamming 3 — simhash flips several bits per token change)


def test_simhash_hierarchical_banding_saturated(spark):
    """The 10^9-doc saturation regime in miniature: every 16-bit bucket
    that contains the planted hamming-2 pair is oversized with MORE
    DISTINCT signatures than the cap (so level-1 star pairs AND the
    rep-level join both miss it — round 2's documented degradation).
    Hierarchical level-2 banding (32-bit two-chunk keys) must still find
    the pair, with bounded output."""
    from pysearchlite_spark.operators.dedup import (lsh_oversize_stats,
                                                    simhash_pairs_from_sigs)

    S0, S1, S2, S3 = 0x1111, 0x2222, 0x3333, 0x4444

    def sig(c0, c1, c2, c3):
        return (c3 << 48) | (c2 << 32) | (c1 << 16) | c0

    rows = []
    # planted pair: clean on chunks 2 and 3, one bit flipped in each of 0, 1
    rows.append((9000, sig(S0 ^ 1, S1, S2, S3)))       # A
    rows.append((9001, sig(S0, S1 ^ 2, S2, S3)))       # B
    # 30 noise docs per chunk index sharing that chunk's planted value but
    # DISTINCT everywhere else -> every bucket holding A/B together
    # ((2,S2), (3,S3)) has 32 docs and 32 distinct sigs > cap; chunks 0/1
    # get their own oversized buckets so ALL FOUR chunk indexes saturate
    for i in range(30):
        u = 0x5000 + i  # unique filler, never equals S*/A/B chunk values
        rows.append((i, sig(S0 ^ 1, u, u + 1, u + 2)))          # chunk0 = A's
        rows.append((100 + i, sig(u, S1 ^ 2, u + 1, u + 2)))    # chunk1 = B's
        rows.append((200 + i, sig(u, u + 1, S2, u + 2)))        # chunk2 hot
        rows.append((300 + i, sig(u, u + 1, u + 2, S3)))        # chunk3 hot
    df = spark.createDataFrame(rows, "doc_id long, simhash long")

    cap = 10
    # precondition: the pair's shared buckets are oversized with > cap
    # distinct signatures (the regime where round 2 lost the pair)
    chunks = df.selectExpr(
        "doc_id",
        "stack(2, 2L, shiftrightunsigned(simhash, 32) & 65535, "
        "3L, shiftrightunsigned(simhash, 48) & 65535) as (c, v)")
    over = lsh_oversize_stats(chunks, ["c", "v"], cap).collect()
    assert {(r["c"], r["v"]) for r in over} >= {(2, S2), (3, S3)}

    got = {(r["a"], r["b"]): r["hamming"] for r in
           simhash_pairs_from_sigs(df, max_hamming=3,
                                   max_bucket=cap).collect()}
    assert got.get((9000, 9001)) == 2
    # bounded: nothing quadratic leaked through (122 docs -> O(n) pairs)
    assert len(got) < 4 * len(rows), len(got)


def test_repeated_spans_planted(spark):
    """Cross-doc repeated 4-token spans: docs 1/2 share one span, doc 3 is
    disjoint, doc 4 repeats a span only WITHIN itself (must NOT count),
    doc 5 is too short for any span."""
    from pysearchlite_spark.operators.dedup import repeated_spans
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta unique1 tail1"),
         (2, "lead2 alpha beta gamma delta tail2"),
         (3, "wholly different words here indeed"),
         (4, "rep rep rep rep pad rep rep rep rep"),
         (5, "too short")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_span_frac"])
           for r in repeated_spans(df, n=4).collect()}
    # doc1: 3 spans, 1 shared ('alpha beta gamma delta')
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (2, 0, 0.0)
    # doc4: spans {'rep rep rep rep', 'rep rep rep pad', 'rep rep pad rep',
    # 'rep pad rep rep', 'pad rep rep rep'} — 5 distinct, none cross-doc
    assert got[4] == (5, 0, 0.0)
    assert got[5] == (0, 0, 0.0)
    assert set(got) == {1, 2, 3, 4, 5}


def test_span_contamination_planted(spark):
    """Decontamination: doc 1 leaks one probe 4-gram, doc 2 is fully
    contained in the probe set, doc 3 is clean, doc 4 too short."""
    from pysearchlite_spark.operators.dedup import span_contamination
    corpus = spark.createDataFrame(
        [(1, "clean lead the quick brown fox jumps clean tail"),
         (2, "exact benchmark sentence verbatim here"),
         (3, "entirely unrelated training content words"),
         (4, "too short")],
        "doc_id long, text string")
    probe = spark.createDataFrame(
        [("the quick brown fox jumps over",),
         ("exact benchmark sentence verbatim here today",)],
        "text string")
    got = {r["doc_id"]: (r["n_spans"], r["contaminated_spans"],
                         r["contamination_frac"])
           for r in span_contamination(corpus, probe, n=4).collect()}
    # doc1: 6 spans, 2 leak ('the quick brown fox', 'quick brown fox jumps')
    assert got[1] == (6, 2, round(2 / 6, 6))
    # doc2: 2 spans, both inside the probe sentence
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_mod61_fold_bit_identical_to_modulo():
    """The Mersenne-fold modulo used in the MinHash permutation kernel must
    agree with numpy's `%` on every u64 input shape the kernel produces
    (a*h+b wraps mod 2^64 first — the fold must match that convention)."""
    import numpy as np

    from pysearchlite_spark.operators.dedup import (MERSENNE, _minhash_params,
                                                    _mod61)
    rng = np.random.default_rng(42)
    # raw u64 extremes + uniform draws
    xs = np.concatenate([
        np.array([0, 1, MERSENNE - 1, MERSENNE, MERSENNE + 1,
                  2**64 - 1, 2**63, 2**61, 2**61 - 2], dtype=np.uint64),
        rng.integers(0, 2**64 - 1, size=100_000, dtype=np.uint64)])
    assert np.array_equal(_mod61(xs), xs % np.uint64(MERSENNE))
    # the kernel's exact expression shape: (a*h + b) with u64 wraparound
    a, b = _minhash_params(64, 7)
    h = rng.integers(0, 2**64 - 1, size=10_000, dtype=np.uint64)
    vals = a[:, None] * h[None, :] + b[:, None]
    assert np.array_equal(_mod61(vals), vals % np.uint64(MERSENNE))
