"""MultiFieldIndex — field-scoped search over per-field indexes.

The reference engine is single-field (search_engine.py:19-60 indexes one
text blob per doc); real corpora carry title/body/anchor/etc. This module
adds fields the way Lucene actually models them — each field is an
INDEPENDENT term space with its own df, avgdl and postings — by building
one SearchIndex per field under a shared root and coordinating queries
across them. No builder changes: every per-field index keeps the full
maintenance surface (deletes, compaction, append, snapshots) and the full
query surface (boolean, phrase, msm, filters) it already has.

Scale shape: at 100 TB this IS how you shard fields — per-field indexes
are separately partitioned, separately pruned (a title-only query never
touches body postings, which dominate the bytes), and separately
compacted. Cross-field operations compose per-field DISTRIBUTED kernels;
the only driver-side work is merging per-field top-k lists or
intersecting already-small id arrays.

Ranking across fields is Lucene's DisjunctionMaxQuery: score(d) =
max_f(w_f * s_f(d)) + tie_breaker * sum of the other fields' weighted
scores. For tie_breaker=0 the per-field top-k union provably contains
the global top-k (if k docs beat d in d's own best field, each of their
maxima beats d's max — so a global top-k doc is in its best field's
top-k). For tie_breaker>0 the candidate set is widened by `expand`
per-field and rescored exactly over the candidates via the filtered
topk path (filter_ids), which Lucene itself approximates with the same
candidate-bound caveat.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.operators import intersect as I
from pysearchlite_spark.plans.builder import build_index

_FIELDS_FILE = "fields.json"
_FIELD_NAME = re.compile(r"[A-Za-z0-9_][A-Za-z0-9_.-]*")


def build_multi_field(spark: SparkSession, df: DataFrame, root: str, *,
                      fields: Dict[str, str],
                      id_col: Optional[str] = None,
                      url_col: Optional[str] = None,
                      **build_kw) -> "MultiFieldIndex":
    """Build one index per field under root/fields/<name>.

    fields: field name → source column (or SQL expression string, e.g. a
    derived title). Every per-field build shares the SAME id/url columns,
    so a docID means the same document in every field — the invariant all
    cross-field operations rely on. id_col is REQUIRED here (unlike
    build_index): without a caller-stable id, each per-field build would
    assign its own ids and sort-key ties could map the same document to
    different ids in different fields — silently intersecting and maxing
    across different documents. Extra build_index kwargs (segment_docs,
    with_positions, ...) apply to every field."""
    if not fields:
        raise ValueError("fields must name at least one field")
    if id_col is None:
        raise ValueError(
            "id_col is required: per-field builds must agree on docIDs, "
            "and builder-assigned ids are only unique within one build")
    for name in fields:
        if _FIELD_NAME.fullmatch(name) is None:
            raise ValueError(f"invalid field name {name!r} (it becomes a "
                             "directory under root/fields)")
    for bad in ("text_col", "html_col"):
        if bad in build_kw:
            raise ValueError(f"{bad} is per-field here — use `fields`")
    os.makedirs(root, exist_ok=True)
    for name, expr in fields.items():
        fdf = df.selectExpr(
            *([id_col] if id_col else []),
            *([url_col] if url_col and url_col != id_col else []),
            f"({expr}) AS __field_text__")
        build_index(spark, fdf, os.path.join(root, "fields", name),
                    text_col="__field_text__", id_col=id_col,
                    url_col=url_col, **build_kw)
    tmp = os.path.join(root, f".{_FIELDS_FILE}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"fields": sorted(fields)}, fh)
    os.replace(tmp, os.path.join(root, _FIELDS_FILE))  # atomic commit
    return MultiFieldIndex(spark, root)


class MultiFieldIndex:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        with open(os.path.join(root, _FIELDS_FILE)) as fh:
            self.fields: List[str] = list(json.load(fh)["fields"])
        self._idx: Dict[str, SearchIndex] = {}

    def field(self, name: str) -> SearchIndex:
        """The per-field SearchIndex — the FULL single-field surface
        (phrase, near, msm, filters, deletes, snapshots) scoped to one
        field."""
        if name not in self.fields:
            raise KeyError(f"unknown field {name!r}; have {self.fields}")
        if name not in self._idx:
            self._idx[name] = SearchIndex(
                self.spark, os.path.join(self.root, "fields", name))
        return self._idx[name]

    # ------------------------------------------------------- boolean ----
    def search_and_ids(self, by_field: Dict[str, str],
                       distributed: bool = False) -> np.ndarray:
        """Docs matching EVERY field's conjunctive query (Lucene
        `title:(a b) AND body:(c d)`), ascending docID. Each field's AND
        runs on its own (pruned, optionally distributed) kernel; the
        cross-field step intersects the per-field id arrays — already
        small relative to postings (intersect_sorted orders them
        smallest-first itself)."""
        if not by_field:
            raise ValueError("by_field must name at least one field query")
        parts = []
        for f, q in by_field.items():
            ids = self.field(f).search_and_ids(q, distributed=distributed)
            if ids.size == 0:
                return np.empty(0, dtype=np.int64)
            parts.append(ids)
        return I.intersect_sorted(parts)

    def count_and(self, by_field: Dict[str, str],
                  distributed: bool = False) -> int:
        return int(self.search_and_ids(by_field,
                                       distributed=distributed).size)

    def search_df(self, by_field: Dict[str, str]) -> DataFrame:
        """Lazy cross-field AND — per-field distributed kernels joined on
        doc_id (nothing collected; the 10^12-doc shape). The url column
        resolves from the first field's docmap."""
        if not by_field:
            raise ValueError("by_field must name at least one field query")
        first, *rest = by_field.items()
        out = self.field(first[0]).search_df(first[1], mode="and")
        for f, q in rest:
            out = out.join(self.field(f).search_df(q, mode="and")
                           .select("doc_id"), "doc_id", "left_semi")
        return out

    # -------------------------------------------------------- ranking ---
    def topk_dismax(self, query: str, k: int = 10,
                    weights: Optional[Dict[str, float]] = None,
                    tie_breaker: float = 0.0, expand: int = 3,
                    ) -> List[Tuple[int, float]]:
        """Disjunction-max ranked retrieval across every field (Lucene
        DisMaxQuery): score(d) = max over fields of w_f*s_f(d), plus
        tie_breaker * the sum of the remaining fields' weighted scores.
        Returns (doc_id, score) by score desc, doc_id asc.

        Exactness: tie_breaker=0 is EXACT from per-field top-k alone (see
        module docstring). tie_breaker>0 rescoring is exact over the
        candidate union of per-field top-(k*expand) lists; a doc outside
        every widened list can in principle sneak into the true top-k at
        large tie_breaker — raise `expand` to tighten, the Lucene
        trade-off."""
        unknown = set(weights or {}) - set(self.fields)
        if unknown:
            raise KeyError(f"unknown weight fields {sorted(unknown)}; "
                           f"have {self.fields}")
        w = {f: 1.0 for f in self.fields}
        w.update(weights or {})
        kk = k if tie_breaker == 0.0 else k * max(1, expand)
        per_field: Dict[str, Dict[int, float]] = {}
        cand: set = set()
        for f in self.fields:
            top = self.field(f).topk(query, k=kk)
            per_field[f] = {d: w[f] * s for d, s in top}
            cand.update(per_field[f])
        if not cand:
            return []
        if tie_breaker > 0.0:
            # exact scores for every candidate in every field — the
            # filtered topk path scores exactly the allow-listed docs
            ids = sorted(cand)
            for f in self.fields:
                missing = [d for d in ids if d not in per_field[f]]
                if missing:
                    scored = self.field(f).topk(
                        query, k=len(missing), filter_ids=missing,
                        use_blockmax=False)
                    per_field[f].update(
                        {d: w[f] * s for d, s in scored})
        out = []
        for d in cand:
            ss = [per_field[f][d] for f in self.fields if d in per_field[f]]
            best = max(ss)
            out.append((d, best + tie_breaker * (sum(ss) - best)))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]

    def search_query_ids(self, q: str, distributed: bool = False):
        """Query-string search over the fields (every clause must be
        field-scoped, e.g. `title:spark -body:"slow scan"`) — see
        query_parser for the grammar."""
        from pysearchlite_spark import query_parser as QP
        return QP.evaluate(self, q, distributed=distributed)

    def search_query_df(self, q: str) -> DataFrame:
        from pysearchlite_spark import query_parser as QP
        return QP.evaluate_df(self, q)

    # ---------------------------------------------------- maintenance ---
    def delete_docs(self, doc_ids) -> None:
        """Tombstone docs in EVERY field index (a document is deleted as
        a whole, not per field)."""
        from pysearchlite_spark.plans.deletes import delete_docs as _dd
        ids = list(doc_ids)
        for f in self.fields:
            _dd(self.spark, os.path.join(self.root, "fields", f), ids)
        self._idx.clear()  # handles are snapshot-scoped; reopen

    def compact(self, **kw) -> None:
        from pysearchlite_spark.plans.compaction import compact_segments
        for f in self.fields:
            compact_segments(self.spark,
                             os.path.join(self.root, "fields", f), **kw)
        self._idx.clear()
