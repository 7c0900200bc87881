"""Lucene-style query string parser over the SearchIndex surfaces.

The reference speaks bare AND term lists (do_query.py:9-24); production
engines expose one string syntax that composes every query type. This
parser covers the subset whose operators this engine implements, each
clause dispatching to the existing (tested, oracle-backed) kernel:

    table part                  conjunction of terms (leapfrog AND)
    "big table"                 exact phrase (positional index)
    "big table"~2               ordered proximity, slop 2 (NEAR)
    -merge  -"slow scan"        negated clause (AND-NOT subtraction)
    tab*  te?t                  wildcard expansion + OR union
    tabel~1  tabel~             fuzzy term (Levenshtein ≤ 1 / ≤ 2)
    /s(mall|low)/               regex expansion + OR union
    (table OR row)              disjunctive group: ANY member matches;
                                scored as ONE SynonymQuery pseudo-term
    part^2  (a OR b)^1.5        boost: multiplies the clause's BM25
                                contribution (no boolean effect)
    title:part                  field-scoped term (MultiFieldIndex)
    title:"big table"           field-scoped phrase

Semantics: every non-negated clause MUST match (the conjunctive
training-data-filter shape; Lucene's practical default in most
deployments), negated clauses must NOT. A multi-term wildcard/regex
clause matches if ANY expansion matches (Lucene multi-term rewrite).

Evaluation has the engine's two shapes:
  * `evaluate(idx, q)` — driver path: each clause produces its sorted id
    array from its own (pruned) kernel; arrays intersect/subtract with
    the numpy sorted-mask kernels. Right for interactive queries.
  * `evaluate_df(idx, q)` — the 10^12-doc path: each clause is its LAZY
    per-segment DataFrame (search_df), composed with left_semi /
    left_anti joins on doc_id — nothing collected, sink with .write.

Field-scoped clauses require a MultiFieldIndex; a plain SearchIndex
rejects them loudly (never silently re-scopes to the whole doc).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

# one clause: "-" negation, optional "field:", then exactly one of
# quoted phrase (optional ~slop), /regex/, (disjunctive group) with
# optional ^boost, or a bare token (which may carry * / ? wildcards, a
# ~edits fuzzy suffix, or a ^boost suffix)
_CLAUSE = re.compile(r"""
    (?P<neg>-)?
    (?:(?P<field>[A-Za-z0-9_][A-Za-z0-9_.-]*):)?
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | /(?P<regex>[^/]+)/
      | \((?P<group>[^()"/]*)\)(?:\^(?P<gboost>\d+(?:\.\d+)?))?
      | (?P<token>[^\s"/()]+)
    )""", re.VERBOSE)


@dataclass
class Clause:
    kind: str        # "term" | "phrase" | "near" | "wild" | "regex" | "fuzzy"
    text: str
    negated: bool = False
    field: Optional[str] = None
    slop: int = 0
    edits: int = 0               # fuzzy clauses: max Levenshtein distance
    boost: float = 1.0           # term/group clauses: score multiplier


@dataclass
class ParsedQuery:
    must: List[Clause] = field(default_factory=list)
    must_not: List[Clause] = field(default_factory=list)


def parse(q: str) -> ParsedQuery:
    """Tokenize the query string into clauses. Raises ValueError on
    syntax errors (unterminated quote/regex, empty clause) — a malformed
    filter must fail loudly, not silently drop a condition."""
    out = ParsedQuery()
    pos, n = 0, len(q)
    while pos < n:
        if q[pos].isspace():
            pos += 1
            continue
        m = _CLAUSE.match(q, pos)
        if m is None or m.end() == m.start():
            raise ValueError(f"query syntax error at {pos}: {q[pos:]!r}")
        pos = m.end()
        if pos < n and not q[pos].isspace():
            # every clause must end at whitespace/EOS — otherwise
            # '"a b"~x' silently re-parses ~x as an extra term clause
            raise ValueError(f"query syntax error at {pos}: {q[pos:]!r}")
        if m["phrase"] is not None:
            words = m["phrase"].split()
            if not words:
                raise ValueError("empty phrase clause")
            slop = int(m["slop"] or 0)
            kind = ("near" if slop > 0 else
                    "phrase" if len(words) > 1 else "term")
            c = Clause(kind, m["phrase"], field=m["field"], slop=slop)
        elif m["regex"] is not None:
            c = Clause("regex", m["regex"], field=m["field"])
        elif m["group"] is not None:
            # (a OR b) disjunctive group: standalone uppercase OR is the
            # Lucene operator (separator); members analyze like terms.
            # Bare whitespace separates too — (a b) ≡ (a OR b).
            from pysearchlite_spark.tokenizer import query_terms
            members = list(dict.fromkeys(
                t for w in m["group"].split() if w != "OR"
                for t in query_terms(w)))
            c = Clause("group", " ".join(members), field=m["field"],
                       boost=float(m["gboost"] or 1.0))
        else:
            tok = m["token"]
            boost = 1.0
            bm = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", tok)
            if bm is not None:
                tok, boost = bm[1], float(bm[2])
            fz = re.fullmatch(r"([^~]+)~(\d*)", tok)
            if fz is not None:
                # Lucene fuzzy syntax: term~N (bare ~ defaults to 2)
                edits = int(fz[2]) if fz[2] else 2
                if edits > 2:
                    raise ValueError(
                        f"fuzzy clause {tok!r}: max_edits must be ≤ 2")
                c = Clause("fuzzy", fz[1], field=m["field"], edits=edits,
                           boost=boost)
            else:
                kind = "wild" if ("*" in tok or "?" in tok) else "term"
                c = Clause(kind, tok, field=m["field"], boost=boost)
        c.negated = bool(m["neg"])
        (out.must_not if c.negated else out.must).append(c)
    # Lucene-analyzer semantics: a term/phrase clause whose text contains
    # no indexable tokens (bare punctuation — 'big & fast') VANISHES at
    # analysis time, exactly as the plain surfaces tokenize it away; it
    # must not silently empty the whole query
    from pysearchlite_spark.tokenizer import query_terms
    for lst in (out.must, out.must_not):
        lst[:] = [c for c in lst
                  if c.kind not in ("term", "phrase", "near", "group")
                  or query_terms(c.text)]
    if not out.must:
        raise ValueError("query needs at least one non-negated clause "
                         "with indexable tokens")
    return out


def _scope(idx, c: Clause):
    """Resolve the SearchIndex a clause runs against. Fielded clauses
    need a MultiFieldIndex; plain clauses against a MultiFieldIndex are
    ambiguous — require the field."""
    fielded = hasattr(idx, "fields") and hasattr(idx, "field")
    if c.field is not None:
        if not fielded:
            raise ValueError(
                f"fielded clause {c.field}:{c.text!r} needs a "
                "MultiFieldIndex; this index has no fields")
        return idx.field(c.field)
    if fielded:
        raise ValueError(
            f"clause {c.text!r} must name a field on a multi-field "
            f"index (have {idx.fields})")
    return idx


def _clause_ids(idx, c: Clause, distributed: bool) -> np.ndarray:
    s = _scope(idx, c)
    if c.kind == "term":
        return s.search_and_ids(c.text, distributed=distributed)
    if c.kind == "phrase":
        return s.search_phrase_ids(c.text, distributed=distributed)
    if c.kind == "near":
        return s.search_near_ids(c.text, c.slop, distributed=distributed)
    if c.kind == "group":
        # ANY member matches — exactly the OR-union kernel
        return s.search_or_ids(c.text, distributed=distributed)
    if c.kind == "wild":
        return s.search_wildcard_ids(c.text, distributed=distributed)
    if c.kind == "fuzzy":
        return s.search_fuzzy_ids(c.text, max_edits=c.edits,
                                  distributed=distributed)
    return s.search_regex_ids(c.text, distributed=distributed)


def evaluate(idx, q: str, distributed: bool = False) -> np.ndarray:
    """Matching doc_ids (ascending) for a query string — driver path.
    Clauses short-circuit: the first empty MUST clause ends the query
    before later clauses run their kernels."""
    from pysearchlite_spark import codec
    from pysearchlite_spark.engine import _allowed_mask

    pq = parse(q)
    ids: Optional[np.ndarray] = None
    for c in pq.must:
        part = _clause_ids(idx, c, distributed)
        if part.size == 0:
            return part
        if ids is None:
            ids = part
        else:
            ids = ids[_allowed_mask(ids, part)]
            if ids.size == 0:
                return ids
    assert ids is not None  # parse() guarantees a MUST clause
    for c in pq.must_not:
        if ids.size == 0:
            return ids
        excl = _clause_ids(idx, c, distributed)
        if excl.size:
            ids = ids[codec.tombstone_keep_mask(ids, excl)]
    return ids


def evaluate_topk(idx, q: str, k: int = 10,
                  distributed: bool = False) -> List[Tuple[int, float]]:
    """BM25 top-k for a query string: candidates are the FULL boolean
    match set (every clause enforced — phrases, wildcards, negations),
    scores are disjunctive BM25 over the plain term and (a OR b) group
    clauses, each scaled by its ^boost (phrase/wildcard/fuzzy/regex
    clauses gate membership but don't score — the classic filter-vs-
    score split; a group scores as ONE SynonymQuery pseudo-term).
    Composition: evaluate() produces the allow-list, the filtered top-k
    path ranks inside it. A query with no term/group clause has nothing
    to score → ValueError."""
    from pysearchlite_spark.tokenizer import query_terms

    pq = parse(q)
    if hasattr(idx, "fields"):
        raise ValueError("evaluate_topk ranks a single index; use "
                         "MultiFieldIndex.topk_dismax for fields")
    groups: List[List[str]] = []
    boosts: List[float] = []
    has_group = False
    for c in pq.must:
        if c.field is not None:
            continue
        if c.kind == "term":
            # a term clause may analyze to several tokens ('a.b') — each
            # scores independently, as the plain topk path always did
            for t in query_terms(c.text):
                groups.append([t])
                boosts.append(c.boost)
        elif c.kind == "group":
            groups.append(query_terms(c.text))
            boosts.append(c.boost)
            has_group = True
    if not groups:
        raise ValueError("query has no scoring term clause")
    ids = evaluate(idx, q, distributed=distributed)
    if ids.size == 0:
        return []
    if not has_group and all(b == 1.0 for b in boosts):
        # pure-term unboosted query: keep the plain (block-max-capable)
        # topk path, bit-identical to pre-grammar behavior
        return idx.topk(" ".join(g[0] for g in groups), k=k,
                        distributed=distributed, filter_ids=ids)
    return idx.topk_groups(groups, k=k, boosts=boosts,
                           distributed=distributed, filter_ids=ids)


_DF_MODE = {"term": "and", "phrase": "phrase", "near": "near",
            "wild": "wildcard", "regex": None}


def evaluate_df(idx, q: str):
    """Matching (doc_id, url) as a LAZY DataFrame — the 10^12-doc path:
    per-clause search_df frames composed with left_semi (MUST) and
    left_anti (MUST NOT) joins on doc_id; nothing reaches the driver."""
    pq = parse(q)

    def clause_df(c: Clause):
        s = _scope(idx, c)
        if c.kind in ("regex", "fuzzy"):
            # no search_df mode for these; expand here and union like OR
            terms = (s.expand_regex(c.text) if c.kind == "regex" else
                     s.expand_fuzzy(c.text, max_edits=c.edits))
            return s.search_df(" ".join(terms), mode="or") if terms else \
                s.search_df("", mode="or")
        if c.kind == "group":
            return s.search_df(c.text, mode="or")
        return s.search_df(c.text, mode=_DF_MODE[c.kind], slop=c.slop)

    out = clause_df(pq.must[0])
    for c in pq.must[1:]:
        out = out.join(clause_df(c).select("doc_id"), "doc_id", "left_semi")
    for c in pq.must_not:
        out = out.join(clause_df(c).select("doc_id"), "doc_id", "left_anti")
    return out
