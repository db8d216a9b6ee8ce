"""Single-process reference oracle: dict-based index build + BM25 top-k.

Mirrors the in-memory flow of the reference's JsonlToCiff
(/root/reference/src/lib.rs:992-1134): one pass accumulating a
``postings_map[term] -> [(doc_id, tf)]`` and per-doc lengths, then
term-sorted (byte-wise, /root/reference/src/lib.rs:1067-1069) and
docid-sorted finalization — except documents are transcript turns,
docids come from the stable (conv_id, turn_idx) sort (SURVEY.md §2.4 T1)
and doclength is the token count (Σ tf, natural-text rule, §1.3).

This oracle defines the BM25 semantics the distributed engine must be
rank-identical to (SURVEY.md §6): PISA defaults k1=0.9, b=0.4,
``idf = max(ln((N - df + 0.5)/(df + 0.5)), EPS_IDF)``, all arithmetic
float64, ties broken by (score desc, doc_id asc).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

K1_DEFAULT = 0.9
B_DEFAULT = 0.4
EPS_IDF = 1e-6


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


@dataclass
class OracleIndex:
    num_docs: int = 0
    total_terms: int = 0
    avg_doclength: float = 0.0
    doclengths: list[int] = field(default_factory=list)
    collection_docids: list[str] = field(default_factory=list)
    # term -> list[(doc_id, tf)], docid-ascending
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)

    @classmethod
    def build(cls, transcripts: pa.Table) -> "OracleIndex":
        """transcripts (conv_id, turn_idx, text, ...) -> index.

        docid = dense rank under byte-wise-ascending (conv_id, turn_idx).
        """
        conv = transcripts["conv_id"].to_pylist()
        turn = transcripts["turn_idx"].to_pylist()
        text = transcripts["text"].to_pylist()
        order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
        idx = cls()
        postings: dict[str, dict[int, int]] = {}
        for doc_id, i in enumerate(order):
            toks = tokenize(text[i] or "")
            idx.doclengths.append(len(toks))
            idx.collection_docids.append(f"{conv[i]}/{turn[i]}")
            idx.total_terms += len(toks)
            for t in toks:
                tf_map = postings.setdefault(t, {})
                tf_map[doc_id] = tf_map.get(doc_id, 0) + 1
        idx.num_docs = len(order)
        idx.avg_doclength = (
            idx.total_terms / idx.num_docs if idx.num_docs else 0.0
        )  # f64 division as /root/reference/src/lib.rs:616-617
        for t in sorted(postings, key=lambda s: s.encode()):
            idx.postings[t] = sorted(postings[t].items())
        return idx

    # -- CIFF Header analogue -------------------------------------------
    def manifest(self) -> dict:
        return {
            "version": 1,
            "num_docs": self.num_docs,
            "num_postings_lists": len(self.postings),
            "total_terms_in_collection": self.total_terms,
            "average_doclength": self.avg_doclength,
        }

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def cf(self, term: str) -> int:
        return sum(tf for _, tf in self.postings.get(term, ()))

    # -- BM25 ------------------------------------------------------------
    def idf(self, term: str) -> float:
        df = self.df(term)
        if df == 0:
            return 0.0
        return max(
            math.log((self.num_docs - df + 0.5) / (df + 0.5)), EPS_IDF
        )

    def bm25_scores(
        self, query: str, k1: float = K1_DEFAULT, b: float = B_DEFAULT
    ) -> dict[int, float]:
        """doc_id -> score over all docs matching >= 1 query term.

        Duplicate query terms count once (standard disjunctive bag-of-
        words over the unique term set; summation in byte-sorted term
        order for determinism)."""
        terms = sorted(set(tokenize(query)), key=lambda s: s.encode())
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for doc_id, tf in plist:
                dl = self.doclengths[doc_id]
                norm = tf + k1 * (1.0 - b + b * dl / self.avg_doclength)
                contrib = w * tf * (k1 + 1.0) / norm
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
        return scores

    def bm25_topk(
        self, query: str, k: int = 10, k1: float = K1_DEFAULT, b: float = B_DEFAULT
    ) -> list[tuple[int, float]]:
        scores = self.bm25_scores(query, k1=k1, b=b)
        # rank on 9-dp-rounded scores — the engine's _rank key
        ranked = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )
        return ranked[:k]
