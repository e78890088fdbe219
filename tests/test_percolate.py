"""Percolation (ES percolator analog): registered queries vs streaming
documents, one Catalyst scan — pinned against a brute-force reference
over the parsed clause semantics."""

from __future__ import annotations

import re

import pytest

from contextinator_spark.operators.boolean import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    parse_query,
)
from contextinator_spark.operators.percolate import percolate

DOCS = [
    (0, "hash table hash join", "en"),
    (1, "spark join spark", "en"),
    (2, "hash join merge", "de"),
    (3, "table hash table hash", "de"),
    (4, "spark hash table", "en"),
    (5, "merge sort merge", "en"),
    (6, "join join join hash", "de"),
    (7, "nothing relevant here", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string, lang string")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_clause(toks, lang, c) -> bool:
    k = c.kind
    if k == "term":
        return c.terms[0] in toks
    if k == "prefix":
        return any(t.startswith(c.terms[0]) for t in toks)
    if k == "wildcard":
        rx = "^" + ".*".join(re.escape(p) for p in c.terms[0].split("*")) + "$"
        return any(re.match(rx, t) for t in toks)
    if k == "regexp":
        return any(re.fullmatch(c.terms[0], t) for t in toks)
    if k == "fuzzy":
        return any(_lev(t, c.terms[0]) <= (c.window or 2) for t in toks)
    if k == "phrase":
        n = len(c.terms)
        return any(tuple(toks[i:i + n]) == c.terms for i in range(len(toks) - n + 1))
    if k == "near":
        anchor, rest, w = c.terms[0], c.terms[1:], c.window
        pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(c.terms)}
        return any(
            all(any(abs(pj - p0) <= w for pj in pos.get(t, [])) for t in rest)
            for p0 in pos.get(anchor, [])
        )
    if k == "phrase_prefix":
        n = len(c.terms)
        return any(
            tuple(toks[i:i + n]) == c.terms
            and i + n < len(toks)
            and toks[i + n].startswith(c.prefix)
            for i in range(len(toks) - n)
        )
    if k == "predicate":
        m = re.fullmatch(r"lang = '(\w+)'", c.predicate)
        assert m, c.predicate
        return lang == m.group(1)
    raise AssertionError(k)


def _brute_query(toks, lang, clauses, msm=0) -> bool:
    musts = [c for c in clauses if c.occur in (MUST, FILTER)]
    shoulds = [c for c in clauses if c.occur == SHOULD]
    nots = [c for c in clauses if c.occur == MUST_NOT]
    if not all(_brute_clause(toks, lang, c) for c in musts):
        return False
    if any(_brute_clause(toks, lang, c) for c in nots):
        return False
    if shoulds:
        need = max(msm, 0 if musts else 1)
        if need > len(shoulds):
            return False
        if sum(_brute_clause(toks, lang, c) for c in shoulds) < need:
            return False
    return True


QUERIES = {
    0: "+hash spark",
    1: 'hash -join "table hash"',
    2: '+"table hash" join',
    3: '"big join"~3 spark',
    4: "hash lang:en",
    5: "-lang:de table",
    6: "mer* sort",
    7: "grup~2",
    8: "/s(park|ort)/",
    9: '"table h*"',
    10: "+join +hash -spark",
    11: "zzz_absent",
}


def test_percolate_matches_brute_force(spark, docs):
    out = percolate(docs, QUERIES)
    got = {(r.query_id, r.doc_id) for r in out.collect()}
    want = set()
    for qid, q in QUERIES.items():
        cl = parse_query(q)
        for did, text, lang in DOCS:
            if _brute_query(text.split(), lang, cl):
                want.add((qid, did))
    assert got == want and got


def test_percolate_min_should_match(spark, docs):
    q = {0: "hash table spark"}
    for msm in (0, 1, 2, 3, 4):
        got = {r.doc_id for r in percolate(docs, q, min_should_match=msm).collect()}
        want = {
            did
            for did, text, lang in DOCS
            if _brute_query(text.split(), lang, parse_query(q[0]), msm=msm)
        }
        assert got == want, msm
    # per-query dict form
    two = {0: "hash table spark", 1: "hash table spark"}
    got = percolate(docs, two, min_should_match={1: 3}).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    assert by_q.get(1, set()) < by_q[0]


def test_percolate_stays_one_codegen_scan(spark, docs):
    """No exchange in the plan before the explode — the whole query set
    evaluates in one pass over the corpus."""
    plan = percolate(docs, QUERIES)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_percolate_guards(spark, docs):
    with pytest.raises(ValueError, match="MUST/FILTER/SHOULD"):
        percolate(docs, {0: "-hash"}).collect()
    assert percolate(docs, {}).count() == 0
