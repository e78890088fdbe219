"""Pure-Python/numpy brute-force BM25 oracle (no Spark).

Generates golden fixtures (SURVEY.md §5.2.2): exact top-k (doc_id, score)
per query, ties broken by ascending doc_id, scores rounded to 6 decimals.
The Spark engine must be rank-identical against this.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .config import BM25_B, BM25_K1, DEFAULT_TOP_K, SCORE_ROUND_DECIMALS, TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


class BruteForceBM25:
    def __init__(self, docs: dict[int, str], k1: float = BM25_K1, b: float = BM25_B):
        self.k1, self.b = k1, b
        self.tf: dict[int, Counter] = {d: Counter(tokenize(t)) for d, t in docs.items()}
        self.doc_len = {d: sum(c.values()) for d, c in self.tf.items()}
        self.n = len(docs)
        self.avgdl = sum(self.doc_len.values()) / self.n if self.n else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, doc_id: int, terms: list[str]) -> float:
        dl = self.doc_len[doc_id]
        s = 0.0
        for t in sorted(set(terms)):
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            s += self.idf(t) * (tf * (self.k1 + 1.0)) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            )
        return s

    def topk(self, terms: list[str], k: int = DEFAULT_TOP_K) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — only docs matching ≥1 term."""
        scored = []
        for d in self.tf:
            s = self.score(d, terms)
            if s > 0.0:
                scored.append((d, round(s, SCORE_ROUND_DECIMALS)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return [(i + 1, d, s) for i, (d, s) in enumerate(scored[:k])]
