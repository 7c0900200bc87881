"""prepare_corpus — the canonical training-data preparation pipeline.

Composes the engine's pipeline operators into the standard web-corpus
cleaning flow (the C4 / Gopher / MassiveText recipe):

    canonical-URL dedup → language filter → quality thresholds →
    repetition thresholds → exact dedup → near dedup (MinHash-LSH +
    connected components) → duplicate-line removal → benchmark
    decontamination → PII redaction → write cleaned parquet
    [+ build index]

Every stage is optional (None disables it) and runs on the PREVIOUS
stage's survivors; the return value is a per-stage report of kept /
dropped counts — a 100-TB run needs that observability, and the counts
force each stage to materialize so retries re-read a persisted
frontier, not the whole upstream chain.

Scale shape: every stage is one of the already-audited distributed
operators (no new shuffles introduced here) — quality/repetition are
shuffle-free scans, exact dedup exchanges (hash, id) pairs, near dedup
is the hard-capped LSH bucket join + O(log n) star clustering, and
decontamination broadcasts the (tiny) probe spans. The keep-frontier
between stages is a doc_id left-semi join, never a collected list.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _threshold_pred(thresholds: Dict[str, float], valid_cols) -> "F.Column":
    """"min_<col>" keeps rows with col >= value, "max_<col>" keeps
    col <= value; <col> must be one of the stage's stats columns
    (quality_stats: n_chars n_tokens distinct_ratio avg_token_len
    punct_ratio stopword_ratio; repetition_stats: top{n}gram_frac /
    dup{n}gram_frac)."""
    pred = F.lit(True)
    for key, val in thresholds.items():
        kind, _, col = key.partition("_")
        if kind not in ("min", "max") or col not in valid_cols:
            raise ValueError(f"unknown threshold {key!r}; use "
                             f"min_/max_ + one of {sorted(valid_cols)}")
        cond = (F.col(col) >= val) if kind == "min" else (F.col(col) <= val)
        pred = pred & cond
    return pred


def prepare_corpus(spark: SparkSession, df: DataFrame, out_dir: str, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   url_dedup_col: Optional[str] = None,
                   lang: Optional[str] = None,
                   strip_lines: Optional[Dict] = None,
                   strip_lines_stage: str = "after_near",
                   quality: Optional[Dict[str, float]] = None,
                   repetition: Optional[Dict[str, float]] = None,
                   exact_dedup: bool = True,
                   near_dedup: Optional[Dict] = None,
                   decontaminate: Optional[Dict] = None,
                   redact_pii: bool = False,
                   index_dir: Optional[str] = None,
                   release_cache: bool = False,
                   **build_kw) -> dict:
    """Run the cleaning pipeline over `df` (id_col + text_col at
    minimum; extra columns ride along), write the surviving rows to
    `out_dir` as parquet, optionally build a search index over them.

    url_dedup_col: name of a URL column — drop re-crawls whose URLs
        canonicalize identically (functions/url.py; keep the min doc_id).
    lang: keep docs whose n-gram language-ID prediction equals this.
    strip_lines: corpus-wide duplicate-LINE removal (CCNet/Dolma
        boilerplate-paragraph stage); dict of strip_duplicate_lines
        overrides ({"min_count": 2, "min_chars": 15}). A transform —
        rewrites text, never drops docs. Never runs before exact dedup:
        an exact doc copy makes every one of its lines a corpus-repeated
        line and both copies would be gutted to empty text. Its
        exploded-lines cache follows the dedup-operator convention
        (released via release_cache=True).
    strip_lines_stage: where the line removal runs —
        "after_near" (default, the Dolma order: near-dup copies sharing
        paragraphs can't gut each other) or "after_exact" (between exact
        and near dedup: boilerplate-heavy corpora otherwise pay a
        measured 3.3x near-dedup cost, BENCH/near_banner_ab.json —
        short boilerplate-dominated docs collapse into shared-minima
        LSH buckets and candidate generation is quadratic up to
        max_bucket).
    quality: min_/max_ thresholds over quality_stats columns, e.g.
        {"min_n_tokens": 50, "max_punct_ratio": 0.2,
         "min_stopword_ratio": 0.05}.
    repetition: min_/max_ thresholds over repetition_stats columns,
        e.g. {"max_top2gram_frac": 0.2, "max_dup5gram_frac": 0.3}.
    exact_dedup: drop byte-identical texts (keep the min doc_id).
    near_dedup: MinHash-LSH near-dup clustering; dict of
        minhash_lsh_pairs overrides ({"threshold": 0.9, ...}); only the
        minimum-id representative of each cluster survives.
    decontaminate: {"probe": DataFrame[, "probe_text_col"], "n": 8,
        "max_frac": 0.0} — drop docs whose distinct n-token spans
        overlap the probe (benchmark) set beyond max_frac.
    redact_pii: replace emails/phones/IPv4 in the SURVIVORS' text with
        placeholder tokens (functions/pii.py) just before the write;
        adds n_emails/n_phones/n_ipv4 metadata columns. A transform
        stage, never drops rows.
    release_cache: clear the ENTIRE session cache on exit (including
        failures). The dedup operators persist() intermediates whose
        release is documented as the caller's job and expose no handle;
        a job that owns its SparkSession (jobs/prepare_corpus.py) should
        pass True — a library caller sharing a session with its own
        cached frames should leave it False and manage the cache itself.

    Returns {"stages": [{stage, kept, dropped, sec}...], "n_in", "n_out",
    "out_dir"[, "index_dir", "index": BuildResult dict]}. `sec` is the
    stage's wall time (stats + frontier semi-join + survivor count) — the
    per-stage observability a 100-TB run steers by.
    """
    import inspect
    import time

    from pysearchlite_spark.functions import text as T
    from pysearchlite_spark.operators import dedup as D
    from pysearchlite_spark.operators.cluster import dedup_clusters

    # ---- validate EVERY config up front: a typo'd key must fail before
    # the first Spark action, not after hours of upstream stages. Valid
    # column sets come from the stats functions' own output schemas
    # (limit(0) → plan-only, no job), so they can never desynchronize
    if quality:
        cols = set(T.quality_stats(df.limit(0), id_col=id_col,
                                   text_col=text_col).columns) - {id_col}
        _threshold_pred(quality, cols)
    if repetition:
        cols = set(T.repetition_stats(df.limit(0), id_col=id_col,
                                      text_col=text_col).columns) - {id_col}
        _threshold_pred(repetition, cols)
    if strip_lines_stage not in ("after_near", "after_exact"):
        raise ValueError(f"strip_lines_stage must be 'after_near' or "
                         f"'after_exact', got {strip_lines_stage!r}")
    if strip_lines is not None:
        from pysearchlite_spark.functions.lines import strip_duplicate_lines
        ok = set(inspect.signature(strip_duplicate_lines).parameters)
        bad = set(strip_lines) - (ok - {"df", "id_col", "text_col"})
        if bad:
            raise ValueError(
                f"unknown strip_lines keys {sorted(bad)}; "
                f"strip_duplicate_lines takes "
                f"{sorted(ok - {'df', 'id_col', 'text_col'})}")
    if near_dedup is not None:
        ok = set(inspect.signature(D.minhash_lsh_pairs).parameters)
        bad = set(near_dedup) - (ok - {"df", "id_col", "text_col"})
        if bad:
            raise ValueError(f"unknown near_dedup keys {sorted(bad)}; "
                             f"minhash_lsh_pairs takes "
                             f"{sorted(ok - {'df', 'id_col', 'text_col'})}")
        # dedup_clusters/minhash signatures key docs by LONG ids
        id_type = df.schema[id_col].dataType.simpleString()
        if id_type not in ("bigint", "int", "smallint", "tinyint"):
            raise ValueError(f"near_dedup requires an integral id_col; "
                             f"{id_col} is {id_type}")
    if decontaminate is not None and "probe" not in decontaminate:
        raise ValueError("decontaminate needs a 'probe' DataFrame")

    report: dict = {"stages": [], "out_dir": out_dir}
    owned: list = []  # frames THIS call persisted (never the caller's df)

    def checkpoint_frontier(kept: DataFrame) -> DataFrame:
        """Materialize AND truncate the frontier's logical plan at the
        stage boundary. Each stage references its input 2-3× (the stats
        side and the semi-join side), so without truncation the plan
        grows ~3^stage and Catalyst ANALYSIS — pure driver time — comes
        to dominate the later stages (measured at 17k docs: the
        decontaminate stage cost 202 s on a fully cached frontier vs 8 s
        on a flat one). persist() alone does not help: caching shortcuts
        execution, not analysis. Reliable checkpoint() when the session
        has a checkpoint dir (a 100-TB cluster run should set one — the
        frontier then survives executor loss), else localCheckpoint().

        The local checkpoint is LAZY: advance()'s count() is the next
        action and materializes it as a side effect, so each stage runs
        ONE job instead of an eager-checkpoint job plus a count job (the
        same fusion connected_components uses per round). The reliable
        branch stays eager — a lazy reliable checkpoint recomputes its
        input in the separate checkpoint-write job."""
        if spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
            return kept.checkpoint(eager=True)
        return kept.localCheckpoint(eager=False)

    def advance(stage: str, kept: DataFrame) -> DataFrame:
        nonlocal n_prev, cur, t_stage
        kept = checkpoint_frontier(kept)
        n = kept.count()
        now = time.monotonic()
        report["stages"].append(
            {"stage": stage, "kept": n, "dropped": n_prev - n,
             "sec": round(now - t_stage, 2)})
        t_stage = now
        # identity check (DataFrame == builds a Column, never use `in`);
        # never release a cache the CALLER holds. Checkpointed frontiers
        # are not persist()-tracked: their executor storage is freed by
        # the ContextCleaner once the next stage drops the reference.
        if any(f is cur for f in owned):
            cur.unpersist()
            owned[:] = [f for f in owned if f is not cur]
        n_prev, cur = n, kept
        return kept

    # Input caching: if the caller already cached df, their cache serves
    # the n_in count and the first stage and is NOT ours to release
    # (persisting/unpersisting any plan-equivalent alias evicts the same
    # CacheManager entry — select("*") canonicalizes away). Otherwise
    # persist it ourselves, BEFORE counting, so the n_in pass fills the
    # cache instead of being a wasted extra input scan.
    cur = df
    if not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        cur = df.persist()
        owned.append(cur)
    report["n_in"] = n_prev = cur.count()
    t_stage = time.monotonic()

    try:
        if url_dedup_col is not None:
            # re-crawl dedup by canonical URL — runs FIRST: it is the
            # cheapest filter (no tokenization; shuffles only
            # (canonical, id) pairs) and every doc it drops is work the
            # text stages never do
            from pysearchlite_spark.functions.url import url_dedup
            verd = url_dedup(cur, url_col=url_dedup_col, id_col=id_col)
            keep = (verd.filter(~F.col("is_dup"))
                    .select(F.col("doc_id").alias(id_col)))
            advance("url_dedup", cur.join(keep, id_col, "left_semi"))

        if lang is not None:
            # inline per-row filter, same shape as the quality stage below
            from pysearchlite_spark.partitioning import spread_input
            # asNondeterministic (guide §4.4 pattern): a filter over a
            # UDF-derived column otherwise gets pushed below the
            # spread_input exchange, dragging the UDF evaluation back onto
            # the raw scan's 1-2 tasks
            advance("lang",
                    (spread_input(cur)
                     .withColumn("_lang",
                                 T.make_langid_udf().asNondeterministic()(
                                     F.col(text_col)))
                     .filter(F.col("_lang") == lang).drop("_lang")))

        def _expr_pred(thresholds, exprs):
            # the thresholds were already validated up front; here the
            # predicate is built over the stat EXPRESSIONS themselves so
            # no stat column ever needs a (possibly colliding) name
            pred = F.lit(True)
            for key, val in thresholds.items():
                kind, _, col = key.partition("_")
                e = exprs[col]
                pred = pred & ((e >= val) if kind == "min" else (e <= val))
            return pred

        if quality:
            # INLINE filter: quality stats are a pure per-row function of
            # the text, so the keep decision rides the same scan instead of
            # a stats frame + id semi-join (which re-shuffles the frontier
            # and doubles the passes). quality_exprs is the same expression
            # set quality_stats serves — values (incl. rounding) identical.
            from pysearchlite_spark.partitioning import spread_input
            pred = _expr_pred(quality, T.quality_exprs(text_col, "_toks"))
            # asNondeterministic pins the tokenize UDF ABOVE the
            # spread_input exchange (see the lang stage note)
            t = (spread_input(cur)
                 .withColumn("_toks",
                             T.make_tokens_udf().asNondeterministic()(
                                 F.col(text_col)))
                 .filter(pred).drop("_toks"))
            advance("quality", t)

        if repetition:
            # same inline-filter shape as quality: one UDF pass, no join
            from pysearchlite_spark.partitioning import spread_input
            rep_udf, fields = T.make_repetition_udf()
            pred = _expr_pred(
                repetition,
                {f: F.round(F.col(f"_r.{f}"), 6) for f in fields})
            t = (spread_input(cur)
                 .withColumn("_r", rep_udf.asNondeterministic()(
                     F.col(text_col)))
                 .filter(pred).drop("_r"))
            advance("repetition", t)

        if exact_dedup:
            # the keep-list IS the min-id-per-hash aggregate — the
            # per-doc verdict join exact_dedup() builds on top of it is
            # only needed by verdict consumers, not the pipeline
            keep = (cur.select(
                F.col(id_col),
                F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
                .alias("_h"))
                .groupBy("_h").agg(F.min(id_col).alias(id_col))
                .select(id_col))
            advance("exact_dedup", cur.join(keep, id_col, "left_semi"))

        def _strip_lines_stage():
            # see strip_lines_stage docstring for the placement tradeoff
            nonlocal cur
            from pysearchlite_spark.functions.lines import (
                strip_duplicate_lines)
            cur = (strip_duplicate_lines(cur, id_col=id_col,
                                         text_col=text_col, **strip_lines)
                   .drop("n_lines", "n_removed"))
            advance("strip_lines", cur)

        if strip_lines is not None and strip_lines_stage == "after_exact":
            _strip_lines_stage()

        if near_dedup is not None:
            pairs = D.minhash_lsh_pairs(cur, id_col=id_col,
                                        text_col=text_col, **near_dedup)
            verd = dedup_clusters(cur, id_col=id_col, text_col=text_col,
                                  pairs=pairs)
            keep = (verd.filter(~F.col("is_dup"))
                    .select(F.col("doc_id").alias(id_col)))
            advance("near_dedup", cur.join(keep, id_col, "left_semi"))

        if strip_lines is not None and strip_lines_stage == "after_near":
            _strip_lines_stage()

        if decontaminate is not None:
            kw = dict(decontaminate)
            probe = kw.pop("probe")
            max_frac = float(kw.pop("max_frac", 0.0))
            sig = D.span_contamination(cur, probe, id_col=id_col,
                                       text_col=text_col, **kw)
            keep = (sig.filter(F.col("contamination_frac") <= max_frac)
                    .select(F.col("doc_id").alias(id_col)))
            advance("decontaminate", cur.join(keep, id_col, "left_semi"))

        if redact_pii:
            # transformation, not a filter: replace the text column with
            # its redacted form (emails/phones/IPv4 -> placeholder
            # tokens) and keep the per-doc counts as ride-along metadata.
            # Runs LAST so redaction never perturbs the tokenize-based
            # filter stages above, and only survivors pay for it.
            from pysearchlite_spark.functions.pii import (
                redact_pii as _redact_pii)
            cur = (_redact_pii(cur, text_col=text_col)
                   .withColumn(text_col, F.col(f"{text_col}_clean"))
                   .drop(f"{text_col}_clean"))
            advance("redact_pii", cur)

        cur.write.mode("overwrite").parquet(out_dir)
        report["n_out"] = n_prev

        if index_dir is not None:
            import dataclasses

            from pysearchlite_spark.plans.builder import build_index
            cleaned = spark.read.parquet(out_dir)
            res = build_index(spark, cleaned, index_dir, text_col=text_col,
                              id_col=id_col, **build_kw)
            report["index_dir"] = index_dir
            report["index"] = dataclasses.asdict(res)
    finally:
        # release everything this call persisted — including on failure,
        # where half-run stages must not leak corpus-scale caches
        for frame in owned:
            frame.unpersist()
        if release_cache:
            spark.catalog.clearCache()
    return report
