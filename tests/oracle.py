"""Pure-Python/numpy reference scorer implementing Xapian BM25 semantics
exactly (double precision, iterator-style evaluation) - the recall-parity
oracle for the device executor (BASELINE.md methodology; reference formulas
from src/xapian/weight/bm25weight.cc)."""

from __future__ import annotations

import math
from collections import defaultdict


class OracleIndex:
    """Tiny exact inverted index over analysed term dicts."""

    def __init__(self):
        self.postings = defaultdict(dict)  # term -> {docid: wdf}
        self.doclen = []
        self.keys = []

    def add(self, key, term_wdfs: dict):
        docid = len(self.keys)
        self.keys.append(key)
        self.doclen.append(float(sum(term_wdfs.values())))
        for t, w in term_wdfs.items():
            self.postings[t][docid] = float(w)
        return docid

    @property
    def N(self):
        return len(self.keys)

    @property
    def avg_len(self):
        return sum(self.doclen) / len(self.doclen) if self.doclen else 0.0

    def bm25_term_weight(self, term, wqf=1.0, k1=1.0, k3=1.0, b=0.5):
        n = len(self.postings.get(term, {}))
        tw = (self.N - n + 0.5) / (n + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        termweight = math.log(tw)
        if k3 != 0:
            termweight *= (k3 + 1.0) * wqf / (k3 + wqf)
        return termweight * (k1 + 1.0)

    def bm25_or(self, terms, k=10, k1=1.0, b=0.5, min_normlen=0.5):
        """OR query, BM25-scored, ties by ascending docid."""
        scores = defaultdict(float)
        lf = 1.0 / self.avg_len if self.avg_len else 0.0
        for t in terms:
            tw = self.bm25_term_weight(t)
            for docid, wdf in self.postings.get(t, {}).items():
                normlen = max(self.doclen[docid] * lf, min_normlen)
                denom = k1 * (normlen * b + (1 - b)) + wdf
                scores[docid] += tw * (wdf / denom)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def match_and(self, groups):
        """Docids matching AND over groups (each group = OR of terms)."""
        sets = []
        for g in groups:
            s = set()
            for t in g:
                s |= set(self.postings.get(t, {}))
            sets.append(s)
        out = set.intersection(*sets) if sets else set()
        return sorted(out)

    def match_or(self, terms):
        s = set()
        for t in terms:
            s |= set(self.postings.get(t, {}))
        return sorted(s)
