"""Percolation: match NEW documents against a REGISTERED query set.

ES percolator analog (Lucene monitor / Luwak): queries are the data,
documents stream through, and the output says which registered queries
each document matches — the alerting / routing / classification
direction, inverted from search. Percolation runs on documents BEFORE
they are indexed, so no index is needed or consulted.

Spark shape: ONE corpus scan. Every registered query compiles to a pure
Catalyst boolean column over the tokenized document (term membership,
higher-order-function phrase/NEAR counts, startswith/rlike/levenshtein
lambdas), the scan emits one struct per query via a single explode, and
nothing shuffles until the caller aggregates. At 100 TB this is the
plan you want: the query set rides the closure (it is metadata-sized),
the corpus is read once, and whole-stage codegen fuses all per-query
predicates into one pass per row batch.

Semantic notes vs the indexed executors (deliberate, ES-faithful):
  * fuzzy matches ANY token within the edit bound — percolation has no
    dictionary, so there is no MultiTermQuery rewrite bound to mirror.
  * prefix/wildcard/regexp likewise test tokens directly, unbounded.
  * scoring knobs (^w boosts, ^=v, dismax) are inert: percolation is
    match/no-match (ES returns _score=1 per matching query).
  * field predicates (lang:en, doc_len ranges) evaluate against the
    document frame's OWN columns; doc_len is derived from the tokens.

Boolean matching contract (Lucene BooleanQuery.matches):
  all MUST ∧ all FILTER ∧ no MUST_NOT ∧ (#matched SHOULD ≥ msm, where
  msm defaults to 1 when the query has no MUST/FILTER scoring anchor —
  a SHOULD-only query must match something — and to the explicit
  min_should_match otherwise).
"""

from __future__ import annotations

import operator
import re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_expr
from .boolean import FILTER, MUST, MUST_NOT, SHOULD, Clause, parse_query
from .phrase import near_tf_expr, phrase_tf_expr


def _wildcard_rx(pattern: str) -> str:
    return "^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"


def _phrase_prefix_pred(toks: Column, head: list[str], prefix: str) -> Column:
    """True when the exact `head` phrase occurs immediately followed by a
    token starting with `prefix` (ES match_phrase_prefix, scan form)."""

    def is_start(_x: Column, i: Column) -> Column:
        conds = [
            F.get(toks, i + F.lit(j)) == F.lit(t) for j, t in enumerate(head)
        ]
        nxt = F.get(toks, i + F.lit(len(head)))
        conds.append(nxt.isNotNull() & nxt.startswith(prefix))
        return reduce(operator.and_, conds)

    return F.size(F.filter(toks, is_start)) > 0


def _clause_pred(toks: Column, c: Clause) -> Column:
    """Catalyst match predicate for one clause over a token array (and,
    for `predicate` kinds, the document frame's own columns)."""
    k = c.kind
    if k == "term":
        return F.array_contains(toks, c.terms[0])
    if k == "prefix":
        p = c.terms[0]
        return F.exists(toks, lambda t: t.startswith(p))
    if k == "wildcard":
        rx = _wildcard_rx(c.terms[0])
        return F.exists(toks, lambda t: t.rlike(rx))
    if k == "regexp":
        rx = f"^(?:{c.terms[0]})$"  # whole-term, same as expand_regexp
        return F.exists(toks, lambda t: t.rlike(rx))
    if k == "fuzzy":
        term, edits = c.terms[0], int(c.window or 2)
        return F.exists(
            toks, lambda t: F.levenshtein(t, F.lit(term), edits) >= 0
        )
    if k == "phrase":
        return phrase_tf_expr(toks, list(c.terms)) > 0
    if k == "near":
        return near_tf_expr(toks, list(c.terms), int(c.window)) > 0
    if k == "phrase_prefix":
        return _phrase_prefix_pred(toks, list(c.terms), c.prefix)
    if k == "predicate":
        return F.expr(c.predicate)
    raise ValueError(f"percolate: unsupported clause kind {k!r}")


def _query_pred(toks: Column, clauses: list[Clause], msm: int) -> Column:
    musts = [
        _clause_pred(toks, c)
        for c in clauses
        if c.occur in (MUST, FILTER)
    ]
    nots = [_clause_pred(toks, c) for c in clauses if c.occur == MUST_NOT]
    shoulds = [_clause_pred(toks, c) for c in clauses if c.occur == SHOULD]
    if not musts and not shoulds:
        raise ValueError("percolate: query needs ≥1 MUST/FILTER/SHOULD clause")
    conds: list[Column] = list(musts)
    conds.extend(~n for n in nots)
    if shoulds:
        need = max(int(msm), 0 if musts else 1)
        if need > len(shoulds):
            return F.lit(False)  # Lucene: msm above SHOULD count matches nothing
        if need > 0:
            n_matched = reduce(
                operator.add, [s.cast("int") for s in shoulds]
            )
            conds.append(n_matched >= need)
    return reduce(operator.and_, conds) if conds else F.lit(True)


def percolate(
    docs: DataFrame,
    queries: dict[int, str | list[Clause]],
    content_col: str = "content",
    min_should_match: int | dict[int, int] = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id) for every registered query a document matches —
    see the module docstring for the matching contract and the one-scan
    plan shape. `queries` maps query_id → Lucene-flavored query string
    (parse_query grammar) or pre-parsed clause list; `min_should_match`
    is an int for all queries or a per-query_id dict."""
    parsed = {
        int(qid): (parse_query(q) if isinstance(q, str) else list(q))
        for qid, q in queries.items()
    }
    if not parsed:
        return docs.sparkSession.createDataFrame(
            [], "query_id int, doc_id long"
        )
    msm = (
        {q: int(min_should_match.get(q, 0)) for q in parsed}
        if isinstance(min_should_match, dict)
        else {q: int(min_should_match) for q in parsed}
    )
    toks = F.col("_toks")
    proj = docs.withColumn("_toks", tokens_expr(content_col)).withColumn(
        "doc_len", F.size("_toks").cast("int")
    )
    arms = F.array(
        *[
            F.struct(
                F.lit(qid).cast("int").alias("query_id"),
                _query_pred(toks, cl, msm[qid]).alias("_m"),
            )
            for qid, cl in sorted(parsed.items())
        ]
    )
    return (
        proj.select(F.col(id_col).alias("doc_id"), F.explode(arms).alias("q"))
        .filter(F.col("q._m"))
        .select(F.col("q.query_id").alias("query_id"), "doc_id")
    )
