"""Single-node reference engine (the oracle).

Reproduces stn/pysearchlite's observable semantics exactly —
  * docID = insertion order        (/root/reference/pysearchlite/doc_list.py:42-45)
  * doc-level term presence        (inverted_index_skip_list.py:48-57, set() at :49)
  * AND = sorted intersection, ascending docIDs (inverted_index_skip_list.py:207-250)
  * missing-term short-circuit → []  (:198-201)
  * count = len(AND)               (:252-298)
  * search maps ids → names        (search_engine.py:49-55)
— and extends it with the spec'd BM25 the reference lacks (SURVEY.md §2.9):
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)), k1 = 1.2, b = 0.75,
  tf_c = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)), score = Σ idf*tf_c over
  distinct query terms, ties broken by ascending docID. OR-union queries
  (ascending docIDs, missing terms contribute empty, no short-circuit).

Pure Python + stdlib. This is what the Spark engine must match rank-exactly.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from pysearchlite_spark.tokenizer import normalized_tokens, query_terms

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class OracleEngine:
    """In-memory index with pysearchlite semantics + BM25 extension."""

    def __init__(self) -> None:
        self.doc_names: List[str] = []
        # term -> {doc_id: tf}; postings iterate in ascending doc_id because
        # doc_ids are assigned monotonically (reference A1 invariant).
        self.tf: Dict[str, Dict[int, int]] = {}
        self.doc_len: List[int] = []

    # -- indexing ----------------------------------------------------------
    def index(self, name: str, text: str) -> int:
        doc_id = len(self.doc_names)
        self.doc_names.append(name)
        toks = normalized_tokens(text)
        self.doc_len.append(len(toks))
        for t in toks:
            self.tf.setdefault(t, {})
            self.tf[t][doc_id] = self.tf[t].get(doc_id, 0) + 1
        return doc_id

    def index_corpus(self, docs: List[Tuple[str, str]]) -> None:
        for name, text in docs:
            self.index(name, text)

    # -- stats -------------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.doc_names)

    @property
    def avgdl(self) -> float:
        return (sum(self.doc_len) / len(self.doc_len)) if self.doc_len else 0.0

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def postings(self, term: str) -> List[int]:
        return sorted(self.tf.get(term, {}).keys())

    # -- boolean queries ----------------------------------------------------
    def search_and_ids(self, query: str) -> List[int]:
        terms = query_terms(query)
        if not terms:
            return []
        if any(self.df(t) == 0 for t in terms):  # P4 short-circuit
            return []
        lists = sorted((self.postings(t) for t in terms), key=len)
        result = set(lists[0])
        for lst in lists[1:]:
            result &= set(lst)
            if not result:
                return []
        return sorted(result)

    def search_or_ids(self, query: str) -> List[int]:
        terms = query_terms(query)
        result: set = set()
        for t in terms:
            result |= set(self.tf.get(t, {}).keys())
        return sorted(result)

    def search(self, query: str) -> List[str]:
        return [self.doc_names[i] for i in self.search_and_ids(query)]

    def count(self, query: str) -> int:
        return len(self.search_and_ids(query))

    # -- BM25 top-k ----------------------------------------------------------
    def score_doc(self, terms: List[str], doc_id: int) -> float:
        score = 0.0
        avgdl = self.avgdl
        dl = self.doc_len[doc_id]
        for t in terms:
            tf = self.tf.get(t, {}).get(doc_id, 0)
            if tf == 0:
                continue
            idf = bm25_idf(self.n_docs, self.df(t))
            denom = tf + K1 * (1.0 - B + B * dl / avgdl)
            score += idf * tf * (K1 + 1.0) / denom
        return score

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Disjunctive (OR) BM25 top-k: (doc_id, score) sorted by
        score desc, doc_id asc."""
        terms = query_terms(query)
        candidates = self.search_or_ids(query)
        scored = [(d, self.score_doc(terms, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def topk_and(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Conjunctive BM25 top-k (all terms must match)."""
        terms = query_terms(query)
        scored = [(d, self.score_doc(terms, d)) for d in self.search_and_ids(query)]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
