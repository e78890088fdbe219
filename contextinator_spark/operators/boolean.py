"""Boolean query executor — Lucene BooleanQuery semantics over the segment
store, unifying every query form the engine has into one composable plan:

    MUST      clause must match; contributes to the score
    SHOULD    optional; contributes to the score when it matches (with no
              MUST clause, a doc must match ≥1 SHOULD — which falls out of
              the plan shape: docs enter only through a matching clause)
    MUST_NOT  clause must not match; never contributes to the score
    FILTER    doc_meta predicate restricts candidates without rescoring
              (idf/df/avgdl stay collection-global — Lucene FILTER clause,
              same contract as bm25_segments.scoped_topk_segments)

Clause kinds: ``term``, ``prefix``/``wildcard``/``fuzzy`` (bounded
MultiTermQuery rewrite via bm25_segments.expand_prefix/expand_wildcard/
expand_fuzzy), ``phrase`` / ``near`` / ``phrase_prefix`` (positional,
scored as ONE synthetic term over the matched set —
phrase.positional_matches; phrase_prefix = `"table s*"`, ES
match_phrase_prefix, its trailing prefix expanded into a MultiPhraseQuery
alternatives slot), ``predicate`` (FILTER / negated FILTER).

score(d) = round(Σ_{matching scoring clauses c} boost_c · partial_c(d), 6)
where a term clause's partial is idf·tf_norm (global df), a
prefix/wildcard/fuzzy clause's partial is the Σ over its expansion
(identical to prefix_topk/fuzzy_topk), a positional clause's partial is
BM25 with df = |matched docs|, tf = occurrence count (identical to
phrase_topk_indexed's scoring), and boost_c is the Lucene `^w` multiplier
(default 1). Query-string form (parse_query):

    +hash spark^0.5 -join "table hash"^2 "big table"~3 mer* grup~1 lang:en

Scale shape (the reason this is one plan, not k plans):
  * every posting read is partition-pruned (dictionary probe first; a
    clause term absent everywhere costs zero scan jobs);
  * each needed term is decoded ONCE even when several clauses share it;
  * one shuffle: groupBy(doc_id) folds clause partials + the MUST-coverage
    count; MUST_NOT and FILTER resolve as anti/semi joins on the (already
    aggregated, candidate-sized) stream — AQE broadcasts small sides;
  * a rare single-term MUST clause (df ≤ DRIVER_TOPK_MAX_DF) short-circuits
    into a broadcast candidate mask applied kernel-side to every other
    term's postings (searchsorted), the same sound candidate-based prune as
    topk_segments_conjunctive — θ/block-max pruning is intentionally ABSENT
    here: θ lower-bounds the disjunctive k-th best, which bounds nothing
    once MUST/MUST_NOT constraints reshape the candidate set.

No reference parity: Contextinator has no Boolean search (its query surface
is grep + vector retrieval, search.rs / chroma_ops.py); this is new engine
surface composing the round-4 executors (conjunctive, scoped, MultiTermQuery,
positional) into the standard IR algebra.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import (
    BM25_B,
    BM25_K1,
    DEFAULT_TOP_K,
    DRIVER_TOPK_MAX_DF,
    SCORE_ROUND_DECIMALS,
)
from .bm25 import idf_expr, tf_norm_expr
from .bm25_segments import (
    MAX_EXPANSIONS,
    _idf,
    _spread_slices,
    _tf_norm,
    _tombstones,
    expand_fuzzy,
    expand_prefix,
    expand_regexp,
    expand_wildcard,
    load_stats,
    probe_dictionary,
)
from .compress import decode_postings
from .deletes import live_mask
from .phrase import positional_matches

MUST, SHOULD, MUST_NOT, FILTER = "MUST", "SHOULD", "MUST_NOT", "FILTER"

_RESULT_SCHEMA = "rank int, doc_id long, score double"


@dataclass(frozen=True)
class Clause:
    """One Boolean clause. kind ∈ {term, prefix, wildcard, regexp, fuzzy,
    phrase, near, predicate}; `terms` carries the token sequence
    (term/phrase/near) or the single pattern (prefix/wildcard/regexp/
    fuzzy); `window` is the NEAR
    radius — or, for a fuzzy clause, the max edit distance; `predicate` is
    a SQL expression over the store's doc_meta columns; `boost` multiplies
    the clause's score partial (Lucene `^w` — scoring clauses only, inert
    on MUST_NOT/FILTER); `const_score` (Lucene `^=v`, ConstantScoreQuery)
    replaces the clause's BM25 partial with a fixed per-doc value — a doc
    matching the clause through ANY number of expansion terms or
    occurrences contributes exactly v once. A `^=v` on a field/range
    clause turns the filter into a scoring clause (ConstantScore over the
    filter), which is the canonical Lucene use."""

    occur: str
    kind: str
    terms: tuple[str, ...] = field(default=())
    window: int | None = None
    predicate: str | None = None
    boost: float = 1.0
    const_score: float | None = None
    # phrase_prefix only: the prefix the token AFTER `terms` must start
    # with (ES match_phrase_prefix — expanded against the dictionary at
    # execution time into a MultiPhraseQuery alternatives slot)
    prefix: str | None = None


_TOKEN_RX = re.compile(r"[a-z0-9_]+")
# scanner: quoted phrase (optional ~N slop, optional ^boost), field:value,
# or a bare word (fuzzy/boost suffixes on words are peeled off in code —
# the word atom must stay greedy so `mer*` and `foo-bar` survive intact)
_SCAN_RX = re.compile(
    r"""\s*(?P<occur>[+-]?)
        (?:
          "(?P<phrase>[^"]*)"(?:~(?P<window>\d+))?
          (?:\^(?P<peq>=)?(?P<pboost>\d+(?:\.\d+)?))?
        | (?P<rfld>[A-Za-z_][A-Za-z0-9_]*):
          (?P<lb>[\[{])\s*(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)\s*(?P<rb>[\]}])
        | (?P<fld>[A-Za-z_][A-Za-z0-9_]*):(?P<val>[^\s"]+)
        | (?P<word>[^\s"]+)
        )""",
    re.VERBOSE,
)
# word suffixes, Lucene order: term~2^3 (fuzzy before boost); `~` alone
# means the Lucene default of 2 edits
_FUZZ_RX = re.compile(r"~(?P<edits>[012]?)$")
_BOOST_RX = re.compile(r"\^(?P<boost>\d+(?:\.\d+)?)$")
# `^=v` constant score (peeled before `^w` — `=` would fail _BOOST_RX)
_CONST_RX = re.compile(r"\^=(?P<v>\d+(?:\.\d+)?)$")

# doc_meta columns a field clause may target (resident store metadata;
# anything else would silently match nothing)
FILTER_FIELDS = ("repo", "path", "lang", "commit")
# range clauses additionally cover the numeric doc_len column
# (Lucene PointRangeQuery vs TermRangeQuery split)
RANGE_FIELDS = FILTER_FIELDS + ("doc_len",)
NUMERIC_FIELDS = ("doc_len",)


def _toks(text: str) -> tuple[str, ...]:
    """The engine's pinned token policy (config.TOKEN_PATTERN semantics):
    lowercase, maximal [a-z0-9_] runs — queries MUST normalize exactly
    like the index writer or matches silently vanish."""
    return tuple(_TOKEN_RX.findall(text.lower()))


def parse_query(q: str) -> list[Clause]:
    """Parse a Lucene-flavored query string into clauses.

    `+x` → MUST, `-x` → MUST_NOT, bare → SHOULD; `"a b"` phrase,
    `"a b"~N` NEAR with window N; a word containing `*` → wildcard
    (trailing-only `*` → prefix); `/re/` → regexp (Lucene RegexpQuery,
    whole-term match); `word~`/`word~1`/`word~2` → fuzzy
    (Lucene FuzzyQuery; bare `~` = 2 edits); any scoring atom may carry a
    trailing `^w` boost (fuzzy-then-boost order, `grup~1^2.5`);
    `field:value` → FILTER predicate (field ∈ FILTER_FIELDS; `value` may
    carry `*` → SQL LIKE), `-field:value` excludes instead;
    `field:[lo TO hi]` / `{lo TO hi}` → range FILTER (Lucene
    TermRangeQuery on strings, PointRangeQuery on doc_len; `*` = open
    bound, `[* TO *]` = field existence, `-` negates). Multi-token
    words ("foo-bar") become phrases — the tokenizer would index them
    adjacently, so the faithful query is positional."""
    clauses: list[Clause] = []
    pos = 0
    while pos < len(q):
        m = _SCAN_RX.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise ValueError(f"unparseable query tail: {q[pos:]!r}")
            break
        pos = m.end()
        occur = {"+": MUST, "-": MUST_NOT, "": SHOULD}[m.group("occur")]
        if m.group("phrase") is not None:
            raw = m.group("phrase")
            words = raw.split()
            if "*" in raw:
                # `"table s*"` → phrase-prefix (ES match_phrase_prefix):
                # exact head tokens, then any term starting with the
                # suffix word. Wildcard anywhere else in a phrase is
                # rejected loudly (it would otherwise silently tokenize
                # the `*` away and match a plain phrase).
                if not (words and words[-1].endswith("*") and raw.count("*") == 1):
                    raise ValueError(
                        f'phrase wildcard must be a trailing prefix ("a b*"): {raw!r}'
                    )
                if m.group("window"):
                    raise ValueError("phrase-prefix does not take a slop (~N)")
                pre = _toks(words[-1][:-1])
                head = _toks(" ".join(words[:-1]))
                if len(pre) != 1:
                    raise ValueError(f"bad phrase-prefix word: {words[-1]!r}")
                if not head:
                    raise ValueError(
                        "phrase-prefix needs at least one exact leading "
                        "term (use bare `s*` for a prefix query)"
                    )
                pb = m.group("pboost")
                is_const = m.group("peq") is not None
                clauses.append(
                    Clause(occur, "phrase_prefix", head, prefix=pre[0],
                           boost=1.0 if is_const else (float(pb) if pb else 1.0),
                           const_score=float(pb) if is_const and pb else None)
                )
                continue
            terms = _toks(raw)
            if not terms:
                raise ValueError("empty phrase clause")
            w = m.group("window")
            pb = m.group("pboost")
            # Lucene slop 0 IS an exact phrase — `"a b"~0` must not become
            # a NEAR clause with an unsatisfiable window for distinct terms
            win = int(w) if w else None
            is_const = m.group("peq") is not None
            clauses.append(
                Clause(occur, "near" if win else "phrase", terms,
                       window=win or None,
                       boost=1.0 if is_const else (float(pb) if pb else 1.0),
                       const_score=float(pb) if is_const and pb else None)
            )
        elif m.group("rfld") is not None:
            # Lucene range syntax: field:[lo TO hi] inclusive, {lo TO hi}
            # exclusive, mixable; `*` is an open bound ([* TO *] is the
            # field-existence query). TermRangeQuery on string fields,
            # PointRangeQuery semantics on numeric doc_len. Ranges are
            # filter-context only (non-scoring fields), like field:value.
            fld = m.group("rfld").lower()
            if fld not in RANGE_FIELDS:
                raise ValueError(
                    f"unknown range field {fld!r} (have {RANGE_FIELDS})"
                )

            def _bound(op: str, v: str) -> str | None:
                if v == "*":
                    return None
                if fld in NUMERIC_FIELDS:
                    try:
                        float(v)
                    except ValueError:
                        raise ValueError(
                            f"numeric range field {fld!r} needs numeric "
                            f"bounds, got {v!r}"
                        ) from None
                    return f"{fld} {op} {v}"
                return f"{fld} {op} '{v.replace(chr(39), chr(39) * 2)}'"

            parts = [
                p
                for p in (
                    _bound(">=" if m.group("lb") == "[" else ">", m.group("lo")),
                    _bound("<=" if m.group("rb") == "]" else "<", m.group("hi")),
                )
                if p
            ]
            pred = " AND ".join(parts) if parts else f"{fld} IS NOT NULL"
            clauses.append(
                Clause(MUST_NOT if occur == MUST_NOT else FILTER,
                       "predicate", predicate=pred)
            )
        elif m.group("fld") is not None:
            fld, val = m.group("fld").lower(), m.group("val")
            const = None
            vc = _CONST_RX.search(val)
            if vc:  # ^=v: ConstantScore over the filter → scoring clause
                const, val = float(vc.group("v")), val[: vc.start()]
            else:
                vb = _BOOST_RX.search(val)
                if vb:  # boost on a filter-context clause is inert (Lucene)
                    val = val[: vb.start()]
            if fld not in FILTER_FIELDS:
                raise ValueError(
                    f"unknown filter field {fld!r} (have {FILTER_FIELDS})"
                )
            esc = val.replace("'", "''")
            pred = (
                f"{fld} LIKE '{esc.replace('*', '%')}'"
                if "*" in val
                else f"{fld} = '{esc}'"
            )
            # +field:v and field:v both restrict (Lucene treats a bare
            # field clause on a non-scoring field as a filter); with ^=v
            # the clause scores, so +/bare keep their MUST/SHOULD meaning
            if const is not None and occur != MUST_NOT:
                clauses.append(
                    Clause(occur, "predicate", predicate=pred,
                           const_score=const)
                )
            else:
                clauses.append(
                    Clause(MUST_NOT if occur == MUST_NOT else FILTER,
                           "predicate", predicate=pred)
                )
        else:
            word = m.group("word")
            boost, edits, const = 1.0, None, None
            cm = _CONST_RX.search(word)
            if cm:
                const, word = float(cm.group("v")), word[: cm.start()]
            bm = _BOOST_RX.search(word)
            if bm:
                boost, word = float(bm.group("boost")), word[: bm.start()]
            if const is not None and boost != 1.0:
                raise ValueError(
                    f"{m.group('word')!r}: ^=v and ^w are mutually exclusive"
                )
            # /pattern/ → RegexpQuery (Lucene syntax; whole-term match,
            # lowercased to the index's token normalization). Peeled
            # before the fuzzy suffix so `/a~b/` stays a regex literal.
            if len(word) > 2 and word.startswith("/") and word.endswith("/"):
                clauses.append(
                    Clause(occur, "regexp", (word[1:-1].lower(),),
                           boost=boost, const_score=const)
                )
                continue
            fm = _FUZZ_RX.search(word)
            if fm:
                edits, word = int(fm.group("edits") or 2), word[: fm.start()]
            if not word:
                raise ValueError("dangling ~/^ suffix with no term")
            # any ~/^ still present is a malformed suffix (`term~3`,
            # `term^`, `a^b`) — raise rather than silently reparse the
            # suffix digits as a second phrase token
            if "~" in word or "^" in word:
                raise ValueError(
                    f"malformed ~/^ suffix in {m.group('word')!r} "
                    "(fuzzy supports ~, ~0, ~1, ~2; boost needs a number)"
                )
            if "*" in word:
                if edits is not None:
                    raise ValueError(f"wildcard cannot also be fuzzy: {word!r}~")
                body = word.lower()
                if not _TOKEN_RX.fullmatch(body.replace("*", "")):
                    raise ValueError(f"bad wildcard pattern {word!r}")
                kind = (
                    "prefix"
                    if body.count("*") == 1 and body.endswith("*")
                    else "wildcard"
                )
                pat = body[:-1] if kind == "prefix" else body
                clauses.append(
                    Clause(occur, kind, (pat,), boost=boost, const_score=const)
                )
            else:
                terms = _toks(word)
                if not terms:
                    raise ValueError(f"word {word!r} has no indexable tokens")
                if edits is not None:
                    if len(terms) != 1:
                        raise ValueError(f"fuzzy needs a single token: {word!r}")
                    if edits == 0:  # term~0 is an exact term query
                        clauses.append(
                            Clause(occur, "term", terms, boost=boost,
                                   const_score=const)
                        )
                    else:
                        clauses.append(
                            Clause(occur, "fuzzy", terms, window=edits,
                                   boost=boost, const_score=const)
                        )
                elif len(terms) == 1:
                    clauses.append(
                        Clause(occur, "term", terms, boost=boost,
                               const_score=const)
                    )
                else:  # "foo-bar" indexes as adjacent tokens → phrase
                    clauses.append(
                        Clause(occur, "phrase", terms, boost=boost,
                               const_score=const)
                    )
    if not clauses:
        raise ValueError("empty query")
    return clauses


def _clause_terms(
    spark: SparkSession, index_dir: str, c: Clause, max_expansions: int
) -> list[str]:
    """Terms a term-ish clause scores over (prefix/wildcard/fuzzy →
    bounded dictionary expansion; dictionary-only, zero posting reads)."""
    if c.kind == "term":
        return list(c.terms)
    if c.kind == "prefix":
        return expand_prefix(spark, index_dir, c.terms[0], max_expansions)
    if c.kind == "wildcard":
        return expand_wildcard(spark, index_dir, c.terms[0], max_expansions)
    if c.kind == "regexp":
        return expand_regexp(spark, index_dir, c.terms[0], max_expansions)
    if c.kind == "fuzzy":
        return expand_fuzzy(
            spark, index_dir, c.terms[0],
            max_edits=c.window or 2, max_expansions=max_expansions,
        )
    raise ValueError(f"not a term clause: {c.kind}")


def _positional_slots(
    spark: SparkSession, index_dir: str, c: Clause, max_expansions: int
) -> list | None:
    """Slot list a positional clause matches over. phrase/NEAR pass their
    terms through; phrase_prefix appends the bounded dictionary expansion
    of its prefix as an ALTERNATIVES slot (MultiPhraseQuery — the kernel
    unions the slot's postings keys). None = the prefix expands to no
    dictionary term, so the clause can never match."""
    if c.kind != "phrase_prefix":
        return list(c.terms)
    exp = expand_prefix(spark, index_dir, c.prefix, max_expansions)
    if not exp:
        return None
    return [*c.terms, exp]


_SCORED_SCHEMA = "doc_id long, score double"


def _boolean_scored(
    spark: SparkSession,
    index_dir: str,
    clauses: list[Clause],
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
    rare_filter: bool = True,
    combine: str = "sum",
    tie_breaker: float = 0.0,
    min_should_match: int = 0,
    _partials_out: list | None = None,
) -> DataFrame:
    """The FULL scored match stream (doc_id, score) of a Boolean query —
    everything boolean_topk does except the final rank/limit, so
    composers that re-weight scores before ranking (boosting_topk) can
    reuse the whole executor: occur semantics, expansions, positional
    clauses, const scores, msm, MUST_NOT, FILTER.

    `combine` picks the cross-clause score combiner: "sum" is
    BooleanQuery (Σ over matching scoring clauses); "dismax" is
    DisjunctionMaxQuery — each scoring CLAUSE first folds to its own
    score (a prefix/fuzzy clause is internally still a sum over its
    expansion, per Lucene's rewrite), then
    score(d) = max_c + tie_breaker · Σ_{c' ≠ argmax} c'. Occur semantics
    (MUST coverage, MUST_NOT, FILTER) are combiner-independent.

    `min_should_match` is Lucene's BooleanQuery.setMinimumNumberShouldMatch:
    a doc must match ≥ that many DISTINCT SHOULD clauses (on top of full
    MUST coverage). A clause matching through several expansion terms
    counts once — coverage counts clauses, not terms. A value larger than
    the number of SHOULD clauses is unsatisfiable → empty result.

    Positional clauses (phrase/near) require a positions store
    (posting_format=2, segments.write_index(positions=True)); term-only
    queries run on either format."""
    if combine not in ("sum", "dismax"):
        raise ValueError(f"combine must be sum|dismax, got {combine!r}")
    stats = load_stats(index_dir)
    n_partitions = int(stats["n_partitions"])
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    scoring = [c for c in clauses if c.occur in (MUST, SHOULD)]
    if not scoring:
        raise ValueError(
            "BooleanQuery needs ≥1 scoring (MUST/SHOULD) clause — pure "
            "filter/exclusion queries have no ranking signal"
        )
    nots = [c for c in clauses if c.occur == MUST_NOT]
    filters = [c for c in clauses if c.occur == FILTER]
    if any(c.kind == "predicate" and c.const_score is None for c in scoring):
        raise ValueError(
            "predicate clauses are FILTER/MUST_NOT only (add ^=v for a "
            "scoring ConstantScore filter)"
        )
    if min_should_match < 0:
        raise ValueError(f"min_should_match must be ≥ 0, got {min_should_match}")
    should_ids = [cid for cid, c in enumerate(clauses) if c.occur == SHOULD]
    if min_should_match > len(should_ids):
        # Lucene: msm above the SHOULD clause count matches nothing
        return spark.createDataFrame([], _SCORED_SCHEMA)

    # ---- expansion + dictionary probe (metadata-scale, no posting reads)
    termish = [
        (cid, c) for cid, c in enumerate(clauses)
        if c.occur in (MUST, SHOULD)
        and c.kind in ("term", "prefix", "wildcard", "fuzzy", "regexp")
    ]
    positional = [
        (cid, c) for cid, c in enumerate(clauses)
        if c.occur in (MUST, SHOULD)
        and c.kind in ("phrase", "near", "phrase_prefix")
    ]
    must_ids = [cid for cid, c in enumerate(clauses) if c.occur == MUST]

    cl_terms: dict[int, list[str]] = {
        cid: _clause_terms(spark, index_dir, c, max_expansions)
        for cid, c in termish
    }
    all_terms = sorted({t for ts in cl_terms.values() for t in ts})
    info = probe_dictionary(spark, index_dir, all_terms, n_partitions) if all_terms else {}
    # a MUST term-group with no indexed expansion can never be satisfied
    for cid, c in termish:
        if c.occur == MUST and not any(t in info for t in cl_terms[cid]):
            return spark.createDataFrame([], _SCORED_SCHEMA)

    tomb_bc, tomb_over = _tombstones(spark, index_dir)
    idf = {t: _idf(float(info[t]["df"]), n_docs) for t in info}
    # term → clause ids that score it (several clauses may share a term;
    # the blob is decoded once and fanned out per clause)
    term_clauses: dict[str, list[int]] = {}
    for cid, _c in termish:
        for t in cl_terms[cid]:
            if t in info:
                term_clauses.setdefault(t, []).append(cid)

    # ---- rare-MUST candidate mask (sound conjunctive prune, kernel-side)
    cand_bc = None
    if rare_filter and must_ids:
        rare = [
            (int(info[c.terms[0]]["df"]), c.terms[0])
            for cid, c in termish
            if c.occur == MUST and c.kind == "term" and c.terms[0] in info
        ]
        if rare:
            df_r, t_r = min(rare)
            if df_r <= DRIVER_TOPK_MAX_DF and len(term_clauses) > 1:
                rows = (
                    spark.read.parquet(os.path.join(index_dir, "segments"))
                    .filter(
                        (F.col("partition_id") == info[t_r]["partition_id"])
                        & (F.col("term") == t_r)
                    )
                    .select("blob")
                    .collect()
                )
                ids = [decode_postings(bytes(r["blob"]))[0] for r in rows]
                cand_bc = spark.sparkContext.broadcast(
                    np.sort(np.concatenate(ids)) if ids else np.empty(0, np.int64)
                )

    parts: list[DataFrame] = []

    # ---- term-clause partial stream (one pruned scan, Arrow kernel)
    if term_clauses:
        pids = sorted({info[t]["partition_id"] for t in term_clauses})
        seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("partition_id").isin(pids)
            & F.col("term").isin(sorted(term_clauses))
        )
        seg = _spread_slices(
            seg, spark, sum(int(info[t]["df"]) for t in term_clauses)
        )
        idf_b, tc_b = dict(idf), dict(term_clauses)
        boost_b = {cid: float(c.boost) for cid, c in termish}
        const_b = {cid: c.const_score for cid, c in termish}

        def score_slices(pdf_iter):
            cand = cand_bc.value if cand_bc is not None else None
            for pdf in pdf_iter:
                out_d, out_c, out_p = [], [], []
                for term, blob in zip(pdf["term"], pdf["blob"]):
                    doc_ids, tfs, dls = decode_postings(bytes(blob))
                    if tomb_bc is not None and doc_ids.size:
                        m = live_mask(doc_ids, tomb_bc.value)
                        doc_ids, tfs, dls = doc_ids[m], tfs[m], dls[m]
                    if cand is not None and doc_ids.size:
                        if cand.size:
                            pos = np.minimum(
                                np.searchsorted(cand, doc_ids), cand.size - 1
                            )
                            m = cand[pos] == doc_ids
                        else:
                            m = np.zeros(doc_ids.size, bool)
                        doc_ids, tfs, dls = doc_ids[m], tfs[m], dls[m]
                    if doc_ids.size == 0:
                        continue
                    partial = None  # BM25 math skipped for const-only terms
                    for cid in tc_b[term]:
                        out_d.append(doc_ids)
                        out_c.append(np.full(doc_ids.size, cid, np.int32))
                        cv = const_b[cid]
                        if cv is not None:  # ConstantScoreQuery partial
                            out_p.append(np.full(doc_ids.size, cv, np.float64))
                            continue
                        if partial is None:
                            partial = idf_b[term] * _tf_norm(
                                tfs.astype(np.float64), dls.astype(np.float64),
                                avgdl, k1, b,
                            )
                        w = boost_b[cid]
                        out_p.append(partial if w == 1.0 else partial * w)
                if out_d:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(out_d),
                            "clause_id": np.concatenate(out_c),
                            "partial": np.concatenate(out_p),
                        }
                    )

        parts.append(
            seg.mapInPandas(
                score_slices, schema="doc_id long, clause_id int, partial double"
            )
        )

    # ---- positional-clause partial streams (phrase/NEAR/phrase-prefix as
    # ONE synthetic term over the matched set)
    for cid, c in positional:
        slots = _positional_slots(spark, index_dir, c, max_expansions)
        if slots is None:
            # prefix expanded to nothing: a SHOULD contributes no stream;
            # a MUST still counts in len(must_ids), so coverage empties
            # the result — same contract as an unindexed MUST term
            continue
        matched, stats_df = positional_matches(
            spark, index_dir, slots, window=c.window
        )
        if c.const_score is not None:  # ConstantScore(phrase): v per match
            parts.append(
                matched.select(
                    "doc_id",
                    F.lit(cid).cast("int").alias("clause_id"),
                    F.lit(float(c.const_score)).alias("partial"),
                )
            )
            continue
        dfp = matched.agg(F.count(F.lit(1)).cast("double").alias("df_phrase"))
        parts.append(
            matched.crossJoin(F.broadcast(stats_df))
            .crossJoin(F.broadcast(dfp))
            .select(
                "doc_id",
                F.lit(cid).cast("int").alias("clause_id"),
                (
                    idf_expr(F.col("df_phrase"), F.col("n_docs"))
                    * tf_norm_expr(
                        F.col("phrase_tf").cast("double"),
                        F.col("doc_len").cast("double"),
                        F.col("avgdl"),
                        k1,
                        b,
                    )
                    * F.lit(float(c.boost))
                ).alias("partial"),
            )
        )

    # ---- scoring-predicate streams (ConstantScore over a metadata filter):
    # doc_meta scan filtered by the predicate, v per live doc. doc_meta is
    # not tombstone-masked on disk, so mask here — the term/positional
    # streams mask kernel-side and would never resurrect a deleted doc.
    const_preds = [
        (cid, c) for cid, c in enumerate(clauses)
        if c.occur in (MUST, SHOULD) and c.kind == "predicate"
    ]
    for cid, c in const_preds:
        pm = (
            spark.read.parquet(os.path.join(index_dir, "doc_meta"))
            .filter(c.predicate)
            .select(
                "doc_id",
                F.lit(cid).cast("int").alias("clause_id"),
                F.lit(float(c.const_score)).alias("partial"),
            )
        )
        if tomb_bc is not None and tomb_bc.value.size:
            dead = spark.createDataFrame(
                [(int(d),) for d in tomb_bc.value], "doc_id long"
            )
            pm = pm.join(F.broadcast(dead), "doc_id", "left_anti")
        parts.append(pm)

    if not parts:
        # every scoring clause expanded to zero indexed terms (e.g. a
        # SHOULD-only query of unknown words): nothing can score, so the
        # Lucene-faithful result is empty — not an error
        return spark.createDataFrame([], _SCORED_SCHEMA)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    if tomb_over is not None:  # over-cap tombstones: distributed anti-join
        allp = allp.join(tomb_over, "doc_id", "left_anti")
    if _partials_out is not None:
        _partials_out.append(allp)

    # ---- ONE shuffle: fold partials + MUST coverage per doc. For dismax
    # the per-clause fold is pivoted into one column per scoring clause
    # (clause count is small and known) inside the SAME aggregate — a
    # groupBy(doc_id, clause_id) → groupBy(doc_id) chain would be two
    # exchanges over the posting-sized partial stream (measured 2× slower
    # at 8M docs, scripts/new_surface_probe.py).
    must_set = F.array(*[F.lit(i) for i in must_ids]) if must_ids else None
    # SHOULD-coverage agg (minimum_should_match): count DISTINCT matched
    # SHOULD clause ids per doc, same shape as the MUST-coverage count
    should_cov = None
    if min_should_match > 0:
        should_set = F.array(*[F.lit(i) for i in should_ids])
        should_cov = F.count_distinct(
            F.when(F.array_contains(should_set, F.col("clause_id")),
                   F.col("clause_id"))
        ).alias("n_should")
    # ConstantScore clauses fold with per-clause MAX, not SUM: a doc
    # matching a const clause through several expansion terms carries
    # several identical const partials, and Lucene's contract is exactly v
    # once per doc (all rows equal v, so max == v)
    const_ids = [
        cid for cid, c in enumerate(clauses)
        if c.occur in (MUST, SHOULD) and c.const_score is not None
    ]
    if combine == "dismax":
        scids = [cid for cid, c in enumerate(clauses) if c.occur in (MUST, SHOULD)]
        # BM25 partials are strictly positive, so coalesce-to-0 is a safe
        # identity for both the max and the sum of absent clauses
        cs = [
            F.coalesce(
                (F.max if cid in const_ids else F.sum)(
                    F.when(F.col("clause_id") == cid, F.col("partial"))
                ),
                F.lit(0.0),
            ).alias(f"_c{cid}")
            for cid in scids
        ]
        agg_cols = list(cs)
        if must_ids:
            agg_cols.append(
                F.count_distinct(
                    F.when(F.array_contains(must_set, F.col("clause_id")),
                           F.col("clause_id"))
                ).alias("n_must")
            )
        if should_cov is not None:
            agg_cols.append(should_cov)
        ccols = [F.col(f"_c{cid}") for cid in scids]
        best = F.greatest(*ccols) if len(ccols) > 1 else ccols[0]
        total = ccols[0]
        for c in ccols[1:]:
            total = total + c
        scored = (
            allp.groupBy("doc_id")
            .agg(*agg_cols)
            .withColumn(
                "score",
                F.round(
                    best + F.lit(float(tie_breaker)) * (total - best),
                    SCORE_ROUND_DECIMALS,
                ),
            )
            .drop(*[f"_c{cid}" for cid in scids])
        )
    else:
        if const_ids:
            # split the sum: BM25 clauses sum as before, each const clause
            # contributes max(=v) once; absent clauses coalesce to 0
            nc = F.coalesce(
                F.sum(
                    F.when(~F.col("clause_id").isin(const_ids), F.col("partial"))
                ),
                F.lit(0.0),
            )
            total = nc
            for cid in const_ids:
                total = total + F.coalesce(
                    F.max(F.when(F.col("clause_id") == cid, F.col("partial"))),
                    F.lit(0.0),
                )
            agg_cols = [F.round(total, SCORE_ROUND_DECIMALS).alias("score")]
        else:
            agg_cols = [
                F.round(F.sum("partial"), SCORE_ROUND_DECIMALS).alias("score")
            ]
        if must_ids:
            agg_cols.append(
                F.count_distinct(
                    F.when(F.array_contains(must_set, F.col("clause_id")),
                           F.col("clause_id"))
                ).alias("n_must")
            )
        if should_cov is not None:
            agg_cols.append(should_cov)
        scored = allp.groupBy("doc_id").agg(*agg_cols)
    if must_ids:
        scored = scored.filter(F.col("n_must") == len(must_ids)).drop("n_must")
    if should_cov is not None:
        scored = scored.filter(
            F.col("n_should") >= min_should_match
        ).drop("n_should")

    # ---- MUST_NOT: anti-join the union of excluded doc sets
    ex = _excluded_docs(spark, index_dir, nots, n_partitions, max_expansions)
    if ex is not None:
        scored = scored.join(ex, "doc_id", "left_anti")

    # ---- FILTER: doc_meta predicate semi-join (global scores preserved)
    for c in filters:
        meta = (
            spark.read.parquet(os.path.join(index_dir, "doc_meta"))
            .filter(c.predicate)
            .select("doc_id")
        )
        scored = scored.join(meta, "doc_id", "left_semi")

    return scored.select("doc_id", "score")


def _rank_tail(scored: DataFrame, k: int) -> DataFrame:
    """(rank, doc_id, score) top-k of a (doc_id, score) stream — the
    shared collector tail (score desc, doc_id asc)."""
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "score")
    )


def boolean_topk(
    spark: SparkSession,
    index_dir: str,
    clauses: list[Clause],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
    rare_filter: bool = True,
    combine: str = "sum",
    tie_breaker: float = 0.0,
    min_should_match: int = 0,
) -> DataFrame:
    """(rank, doc_id, score) for a Boolean query over the segment store —
    _boolean_scored (see its docstring for the full occur/scoring
    contract) plus the top-k collector tail."""
    return _rank_tail(
        _boolean_scored(
            spark, index_dir, clauses, k1=k1, b=b,
            max_expansions=max_expansions, rare_filter=rare_filter,
            combine=combine, tie_breaker=tie_breaker,
            min_should_match=min_should_match,
        ),
        k,
    )


def boosting_topk(
    spark: SparkSession,
    index_dir: str,
    positive: str | list[Clause],
    negative: str | list[Clause],
    negative_boost: float = 0.5,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
    combine: str = "sum",
    tie_breaker: float = 0.0,
    min_should_match: int = 0,
) -> DataFrame:
    """Boosting query (ES `boosting`, Lucene BoostingQuery): rank by the
    positive Boolean query's score, DEMOTED by ×negative_boost for docs
    that match the negative query — unlike MUST_NOT, demoted docs stay
    in the result, just lower:

        score(d) = round(pos(d) × (negative_boost if d ∈ M(neg) else 1), 6)

    where pos(d) is the engine's rounded Boolean score and M(neg) is the
    negative query's full match set under its own occur semantics
    (scores discarded — matching is what demotes). negative_boost must
    be in [0, 1): ≥1 would promote, which Lucene forbids.

    Topology: two _boolean_scored plans (the negative one reduced to a
    distinct doc_id set) joined on doc_id — the demotion is a left join
    + one multiply, no new exchange shapes. Top-k pruning on the
    positive side alone would be unsound (a demoted doc may leave the
    top-k), which is exactly why this composes over the FULL scored
    stream, not boolean_topk's collector output."""
    if not (0.0 <= float(negative_boost) < 1.0):
        raise ValueError("negative_boost must be in [0, 1)")
    pos_cl = parse_query(positive) if isinstance(positive, str) else positive
    neg_cl = parse_query(negative) if isinstance(negative, str) else negative
    pos = _boolean_scored(
        spark, index_dir, pos_cl, k1=k1, b=b,
        max_expansions=max_expansions, combine=combine,
        tie_breaker=tie_breaker, min_should_match=min_should_match,
    )
    neg = (
        _boolean_scored(
            spark, index_dir, neg_cl, k1=k1, b=b,
            max_expansions=max_expansions,
        )
        .select("doc_id")
        .distinct()
        .withColumn("_neg", F.lit(True))
    )
    demoted = pos.join(neg, "doc_id", "left").select(
        "doc_id",
        F.round(
            F.when(
                F.col("_neg").isNotNull(),
                F.col("score") * F.lit(float(negative_boost)),
            ).otherwise(F.col("score")),
            SCORE_ROUND_DECIMALS,
        ).alias("score"),
    )
    return _rank_tail(demoted, k)


def _excluded_docs(
    spark: SparkSession,
    index_dir: str,
    nots: list[Clause],
    n_partitions: int,
    max_expansions: int,
) -> DataFrame | None:
    """Union of doc_id sets matching any MUST_NOT clause. Term-ish kinds
    decode doc_ids from a pruned segments scan (tfs/positions ignored);
    positional kinds reuse positional_matches; predicate kinds read
    doc_meta. Tombstoned docs need no masking here — they never enter the
    scored stream, so extra ids in the anti-join side are inert."""
    if not nots:
        return None
    outs: list[DataFrame] = []
    terms: set[str] = set()
    for c in nots:
        if c.kind in ("term", "prefix", "wildcard", "fuzzy", "regexp"):
            terms.update(_clause_terms(spark, index_dir, c, max_expansions))
        elif c.kind in ("phrase", "near", "phrase_prefix"):
            slots = _positional_slots(spark, index_dir, c, max_expansions)
            if slots is None:
                continue  # unexpandable -"a b*" excludes nothing
            matched, _ = positional_matches(
                spark, index_dir, slots, window=c.window
            )
            outs.append(matched.select("doc_id"))
        else:  # negated metadata predicate
            outs.append(
                spark.read.parquet(os.path.join(index_dir, "doc_meta"))
                .filter(c.predicate)
                .select("doc_id")
            )
    if terms:
        info = probe_dictionary(spark, index_dir, sorted(terms), n_partitions)
        if info:
            pids = sorted({v["partition_id"] for v in info.values()})
            seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
                F.col("partition_id").isin(pids) & F.col("term").isin(sorted(info))
            )

            def just_docs(pdf_iter):
                for pdf in pdf_iter:
                    ids = [
                        decode_postings(bytes(blob))[0] for blob in pdf["blob"]
                    ]
                    if ids:
                        yield pd.DataFrame({"doc_id": np.concatenate(ids)})

            outs.append(seg.mapInPandas(just_docs, schema="doc_id long"))
    if not outs:
        return None
    ex = outs[0]
    for o in outs[1:]:
        ex = ex.unionByName(o)
    return ex.distinct()


def rescore_topk(
    spark: SparkSession,
    index_dir: str,
    query: str | list[Clause],
    rescore: str | list[Clause],
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """Two-pass rescoring (the ES `rescore` block): the cheap first-pass
    Boolean `query` selects its top `window_size` docs, then ONLY that
    window is re-scored as

        score(d) = round(query_weight × first(d)
                         + rescore_weight × second(d), 6)

    where second(d) is the `rescore` query's Boolean score (0 when the
    doc doesn't match it), and the final top-k is cut from the window.
    The classic use is BM25 first / phrase-proximity second: the
    expensive positional query runs conceptually "against k docs", and
    docs outside the window keep their first-pass order below it.

    Exactness contract: identical to ES — the rescore pass can only
    reorder WITHIN the window; a doc outside the window can never enter
    the top-k (that is the point of the window, not an approximation
    bug). k > window_size is rejected to keep the contract visible.

    Topology: first pass = the full Boolean executor + its collector
    (TakeOrderedAndProject, window_size rows on the driver-side plan, not
    collected); second pass = _boolean_scored(rescore) LEFT-joined to the
    tiny window frame — the window side broadcasts, so the rescore scan
    stays partition-pruned and the join adds no exchange."""
    if k > window_size:
        raise ValueError(
            f"k ({k}) must be ≤ window_size ({window_size}) — rescoring "
            "only reorders within the first-pass window"
        )
    q_cl = parse_query(query) if isinstance(query, str) else query
    r_cl = parse_query(rescore) if isinstance(rescore, str) else rescore
    window = boolean_topk(
        spark, index_dir, q_cl, k=window_size, k1=k1, b=b,
        max_expansions=max_expansions,
    ).select("doc_id", F.col("score").alias("_first"))
    second = _boolean_scored(
        spark, index_dir, r_cl, k1=k1, b=b, max_expansions=max_expansions
    ).select("doc_id", F.col("score").alias("_second"))
    # restrict the rescore stream to the window first (broadcast semi-join
    # — the window is ≤ window_size rows), so the final left join's right
    # side is tiny and broadcastable; the preserved side never broadcasts
    sec_w = second.join(
        F.broadcast(window.select("doc_id")), "doc_id", "left_semi"
    )
    combined = (
        window
        .join(F.broadcast(sec_w), "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(float(query_weight)) * F.col("_first")
                + F.lit(float(rescore_weight))
                * F.coalesce(F.col("_second"), F.lit(0.0)),
                SCORE_ROUND_DECIMALS,
            ).alias("score"),
        )
    )
    return _rank_tail(combined, k)


def function_score_topk(
    spark: SparkSession,
    index_dir: str,
    query: str | list[Clause],
    field: str = "doc_len",
    modifier: str = "log1p",
    factor: float = 1.0,
    mode: str = "multiply",
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """Field-value-factor scoring (the ES `function_score` /
    `field_value_factor` block): the Boolean query's score combined with
    a deterministic function of an index-resident numeric doc_meta
    field —

        score(d) = round(bm25(d) <mode> fn(factor × field(d)), 6)

    with fn ∈ {none, log1p, sqrt} and mode ∈ {multiply, sum}. The
    classic uses: length normalization beyond BM25's own, recency or
    popularity boosts when the store carries such a column.

    Pruning contract: the combine reorders docs arbitrarily relative to
    the BM25 order, so this composes over _boolean_scored's FULL stream
    (same reasoning as boosting_topk) and joins doc_meta on doc_id —
    one extra shuffle-free broadcast-free equi-join against the store's
    partitioned metadata, then the shared collector tail."""
    if modifier not in ("none", "log1p", "sqrt"):
        raise ValueError(f"modifier must be none|log1p|sqrt: {modifier!r}")
    if mode not in ("multiply", "sum"):
        raise ValueError(f"mode must be multiply|sum: {mode!r}")
    q_cl = parse_query(query) if isinstance(query, str) else query
    scored = _boolean_scored(
        spark, index_dir, q_cl, k1=k1, b=b, max_expansions=max_expansions
    )
    meta = spark.read.parquet(os.path.join(index_dir, "doc_meta")).select(
        "doc_id", F.col(field).cast("double").alias("_fv")
    )
    v = F.lit(float(factor)) * F.col("_fv")
    fn = {"none": v, "log1p": F.log1p(v), "sqrt": F.sqrt(v)}[modifier]
    comb = (
        F.col("score") * fn if mode == "multiply" else F.col("score") + fn
    )
    out = scored.join(meta, "doc_id").select(
        "doc_id", F.round(comb, SCORE_ROUND_DECIMALS).alias("score")
    )
    return _rank_tail(out, k)


def decay_score_topk(
    spark: SparkSession,
    index_dir: str,
    query: str | list[Clause],
    field: str = "doc_len",
    origin: float = 0.0,
    scale: float = 10.0,
    offset: float = 0.0,
    decay: float = 0.5,
    shape: str = "gauss",
    mode: str = "multiply",
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """ES function_score decay functions (gauss / exp / linear): the
    Boolean score re-weighted by distance of a numeric doc_meta field
    from an origin — the canonical recency / proximity / length-target
    boost. With dist = max(0, |field − origin| − offset), the multiplier
    is exactly ES's parameterization (decay reached at distance scale):

        gauss   exp(−dist² / (2σ²)),        σ² = −scale² / (2 ln decay)
        exp     exp(λ·dist),                λ  = ln(decay) / scale
        linear  max(0, (l − dist) / l),     l  = scale / (1 − decay)

    mode ∈ {multiply, sum}. Same pruning contract as field_value_factor:
    re-weighting reorders past any top-k cut, so this composes over the
    FULL _boolean_scored stream + one doc_meta equi-join."""
    if shape not in ("gauss", "exp", "linear"):
        raise ValueError(f"shape must be gauss|exp|linear: {shape!r}")
    if mode not in ("multiply", "sum"):
        raise ValueError(f"mode must be multiply|sum: {mode!r}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1): {decay}")
    if scale <= 0:
        raise ValueError(f"scale must be > 0: {scale}")
    import math as _math

    q_cl = parse_query(query) if isinstance(query, str) else query
    scored = _boolean_scored(
        spark, index_dir, q_cl, k1=k1, b=b, max_expansions=max_expansions
    )
    meta = spark.read.parquet(os.path.join(index_dir, "doc_meta")).select(
        "doc_id", F.col(field).cast("double").alias("_fv")
    )
    dist = F.greatest(
        F.lit(0.0), F.abs(F.col("_fv") - F.lit(float(origin))) - F.lit(float(offset))
    )
    if shape == "gauss":
        sigma2 = -(float(scale) ** 2) / (2.0 * _math.log(float(decay)))
        mult = F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    elif shape == "exp":
        lam = _math.log(float(decay)) / float(scale)
        mult = F.exp(F.lit(lam) * dist)
    else:
        l = float(scale) / (1.0 - float(decay))
        mult = F.greatest(F.lit(0.0), (F.lit(l) - dist) / F.lit(l))
    comb = F.col("score") * mult if mode == "multiply" else F.col("score") + mult
    out = scored.join(meta, "doc_id").select(
        "doc_id", F.round(comb, SCORE_ROUND_DECIMALS).alias("score")
    )
    return _rank_tail(out, k)


def script_score_topk(
    spark: SparkSession,
    index_dir: str,
    query: str | list[Clause],
    expr: str,
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """ES script_score: the Boolean query's score replaced by an
    ARBITRARY Catalyst SQL expression over `score` (the BM25 value) and
    the store's doc_meta columns — the generic re-scoring form that
    field_value_factor and the decay functions are special cases of,
    e.g.

        expr="score * ln(1 + doc_len)"          (≡ fvf log1p)
        expr="score * 0.5 + sqrt(doc_len)"      (additive shaping)
        expr="case when lang = 'en' then score * 2 else score end"

    The expression stays JVM-side whole-stage codegen (F.expr — never a
    Python UDF); the composition rides the FULL _boolean_scored stream
    (re-scoring reorders past any cut — same soundness argument as
    boosting/fvf/decay) joined to the store-resident doc_meta. The
    expression must be deterministic per row for reproducible rankings —
    nondeterministic functions are the caller's own foot-gun, as in ES."""
    q_cl = parse_query(query) if isinstance(query, str) else query
    scored = _boolean_scored(
        spark, index_dir, q_cl, k1=k1, b=b, max_expansions=max_expansions
    )
    meta = spark.read.parquet(os.path.join(index_dir, "doc_meta"))
    out = (
        scored.join(meta, "doc_id")
        .withColumn("score", F.expr(expr).cast("double"))
        .select("doc_id", F.round("score", SCORE_ROUND_DECIMALS).alias("score"))
    )
    return _rank_tail(out, k)


def boolean_explain(
    spark: SparkSession,
    index_dir: str,
    query: str | list[Clause],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
    combine: str = "sum",
    tie_breaker: float = 0.0,
    min_should_match: int = 0,
) -> DataFrame:
    """Score decomposition for a Boolean query's top-k (the BooleanQuery
    face of Lucene IndexSearcher.explain): one row per (hit, matching
    scoring clause) carrying that clause's folded partial — boosts
    included, a ConstantScore clause folds to its fixed v once — joined
    to the hit's rank and total score. (rank, doc_id, score, clause_id,
    occur, kind, partial), ordered (rank, clause_id), partial rounded to
    6. Under combine="sum" with no msm oddities, Σ partials per hit
    re-rounds to the hit's score (tested); under dismax the clause rows
    expose max + tie·rest directly.

    Plan: ONE extra consumer of the executor's own partial stream
    (_boolean_scored's `allp`, pre-fold) — the ranking is the standard
    collector output; the decomposition restricts `allp` to the k
    surviving docs with a broadcast join, then folds per (doc, clause).
    No second scan of the store, no new exchange shapes."""
    cl = parse_query(query) if isinstance(query, str) else list(query)
    sink: list = []
    scored = _boolean_scored(
        spark, index_dir, cl, k1=k1, b=b, max_expansions=max_expansions,
        combine=combine, tie_breaker=tie_breaker,
        min_should_match=min_should_match, _partials_out=sink,
    )
    top = _rank_tail(scored, k)
    out_schema = (
        "rank int, doc_id long, score double, clause_id int, "
        "occur string, kind string, partial double"
    )
    if not sink:
        return spark.createDataFrame([], out_schema)
    allp = sink[0]
    const_ids = [
        cid for cid, c in enumerate(cl)
        if c.occur in (MUST, SHOULD) and c.const_score is not None
    ]
    meta = spark.createDataFrame(
        [
            (cid, c.occur, c.kind)
            for cid, c in enumerate(cl)
            if c.occur in (MUST, SHOULD)
        ],
        "clause_id int, occur string, kind string",
    )
    folded = (
        allp.join(F.broadcast(top), "doc_id")
        .groupBy("rank", "doc_id", "score", "clause_id")
        .agg(
            F.sum("partial").alias("_sum"), F.max("partial").alias("_max")
        )
        .withColumn(
            "partial",
            F.round(
                F.when(F.col("clause_id").isin(const_ids), F.col("_max"))
                .otherwise(F.col("_sum")),
                SCORE_ROUND_DECIMALS,
            ),
        )
    )
    return (
        folded.join(F.broadcast(meta), "clause_id")
        .select("rank", "doc_id", "score", "clause_id", "occur", "kind", "partial")
        .orderBy("rank", "clause_id")
    )


def boolean_topk_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = DEFAULT_TOP_K,
    **kw,
) -> DataFrame:
    """parse_query + boolean_topk: the one-call query-string surface."""
    return boolean_topk(spark, index_dir, parse_query(query), k=k, **kw)


# ---------------------------------------------------------------------------
# batch executor (S10): many Boolean queries, ONE plan
# ---------------------------------------------------------------------------

_SLOT_BASE = 1024  # positional keys pack (qid, clause-slot); slots < 1024
_BATCH_SCHEMA = "query_id int, rank int, doc_id long, score double"


def boolean_topk_multi(
    spark: SparkSession,
    index_dir: str,
    queries: dict[int, str | list[Clause]],
    k: int = DEFAULT_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_expansions: int = MAX_EXPANSIONS,
    combine: str = "sum",
    tie_breaker: float = 0.0,
    max_partial_rows: int | None = None,
    min_should_match: int | dict[int, int] = 0,
) -> DataFrame:
    """Batch Boolean executor: (query_id, rank, doc_id, score) for many
    Boolean queries in ONE plan — the Boolean twin of
    bm25_segments.topk_segments_multi / phrase.positional_topk_indexed_multi.
    Per-query results are identical to boolean_topk with the same combine
    (tested); `queries` values are query strings (parsed here) or
    pre-parsed clause lists.

    Topology (a query log is mostly Boolean-shaped, so this is the
    throughput path):
      * ONE dictionary probe for the union of every query's scoring +
        MUST_NOT terms (prefix/wildcard/fuzzy expansions are per-clause
        dictionary probes — bounded, metadata-only, as in Lucene's
        MultiTermQuery rewrite);
      * ONE pruned segment scan decodes each term's blob ONCE and fans the
        tf-normalized scores out to every (query, clause-slot) using it —
        rows carry (query_id, slot, is_must, partial);
      * positional clauses across ALL queries ride ONE
        phrase.positional_matches_multi pass (each term decoded once into
        the bucket-packed layout, every clause answered from offset views);
      * MUST_NOT doc sets fold into ONE (query_id, doc_id) anti-join;
        FILTER predicates into ONE semi-join — per-query joins never
        multiply with batch size;
      * ONE exchange folds partials: per-slot sums are pivoted inside the
        same aggregate (the single-query dismax lesson — a slot-then-doc
        chain would be two exchanges over the partial stream), giving both
        Σ (BooleanQuery) and max+tie·rest (DisMax) per (query, doc), plus
        MUST coverage via count_distinct over must slots.

    Not carried over from the latency path: the rare-MUST candidate
    broadcast (per-query driver state that doesn't compose across a
    batch; MUST coverage still guarantees correctness, it's purely a
    pruning loss) and θ/block-max pruning (unsound under MUST coverage,
    same as boolean_topk).

    `max_partial_rows` bounds the (query, slot, doc) partial stream a
    single plan may carry: per-query stream sizes are estimated from the
    dictionary's df column (zero posting reads — Σ df over each term
    clause's expansion, min df over a positional clause's terms), and
    when the batch total exceeds the bound it is greedily packed into
    sub-batches that each fit, run independently, and unioned — exact,
    because per-query results never interact. This is the single-node
    safety valve for the fold documented in BENCH/BASELINE.md's 64M-doc
    probe (unpruned MUST coverage × heavy terms × 100 queries exceeded
    RAM): on a cluster the fold exchange distributes and the bound can
    stay None."""
    if combine not in ("sum", "dismax"):
        raise ValueError(f"combine must be sum|dismax, got {combine!r}")
    parsed: dict[int, list[Clause]] = {
        int(qid): (parse_query(q) if isinstance(q, str) else list(q))
        for qid, q in queries.items()
    }
    if not parsed:
        return spark.createDataFrame([], _BATCH_SCHEMA)
    # per-query minimum_should_match (Lucene setMinimumNumberShouldMatch):
    # an int applies to every query, a dict maps query_id → msm
    msm: dict[int, int] = (
        {int(q): int(min_should_match.get(q, 0)) for q in parsed}
        if isinstance(min_should_match, dict)
        else {int(q): int(min_should_match) for q in parsed}
    )
    if any(v < 0 for v in msm.values()):
        raise ValueError("min_should_match must be ≥ 0")
    any_msm = any(v > 0 for v in msm.values())
    stats = load_stats(index_dir)
    n_partitions = int(stats["n_partitions"])
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    # ---- per-query clause partition + slot assignment
    scoring: dict[int, list[tuple[int, Clause]]] = {}  # qid -> [(slot, c)]
    nots: dict[int, list[Clause]] = {}
    filters: dict[int, list[Clause]] = {}
    for qid, cls in parsed.items():
        if qid < 0 or qid >= 2**20:
            raise ValueError(f"query_id out of range [0, 2^20): {qid}")
        sc = [c for c in cls if c.occur in (MUST, SHOULD)]
        if not sc:
            raise ValueError(f"query {qid}: needs ≥1 scoring clause")
        if any(c.kind == "predicate" and c.const_score is None for c in sc):
            raise ValueError(
                f"query {qid}: predicate clauses are FILTER/MUST_NOT only "
                "(add ^=v for a scoring ConstantScore filter)"
            )
        if len(sc) > _SLOT_BASE:
            raise ValueError(f"query {qid}: >{_SLOT_BASE} scoring clauses")
        scoring[qid] = list(enumerate(sc))
        nots[qid] = [c for c in cls if c.occur == MUST_NOT]
        filters[qid] = [c for c in cls if c.occur == FILTER]
    m_slots = max(len(v) for v in scoring.values())

    # ---- expansion + ONE dictionary probe over the union
    cl_terms: dict[tuple[int, int], list[str]] = {}
    for qid, slots in scoring.items():
        for slot, c in slots:
            if c.kind in ("term", "prefix", "wildcard", "fuzzy", "regexp"):
                cl_terms[(qid, slot)] = _clause_terms(spark, index_dir, c, max_expansions)
    not_terms: dict[int, list[str]] = {}
    for qid, cs in nots.items():
        ts: list[str] = []
        for c in cs:
            if c.kind in ("term", "prefix", "wildcard", "fuzzy", "regexp"):
                ts.extend(_clause_terms(spark, index_dir, c, max_expansions))
        if ts:
            not_terms[qid] = sorted(set(ts))
    all_terms = sorted(
        {t for ts in cl_terms.values() for t in ts}
        | {t for ts in not_terms.values() for t in ts}
    )
    info = probe_dictionary(spark, index_dir, all_terms, n_partitions) if all_terms else {}
    idf = {t: _idf(float(info[t]["df"]), n_docs) for t in info}

    # a MUST term-group with no indexed expansion ⇒ that query is empty
    dead = {
        qid
        for qid, slots in scoring.items()
        for slot, c in slots
        if c.occur == MUST
        and c.kind in ("term", "prefix", "wildcard", "fuzzy", "regexp")
        and not any(t in info for t in cl_terms[(qid, slot)])
    }
    live = sorted(set(scoring) - dead)
    if not live:
        return spark.createDataFrame([], _BATCH_SCHEMA)
    live_set = set(live)

    # ---- optional stream bound: estimate per-query partial rows from the
    # dictionary (metadata only) and sub-batch greedily when over
    if max_partial_rows is not None and len(live) > 1:
        pos_terms = sorted(
            {
                t
                for qid in live
                for _slot, c in scoring[qid]
                if c.kind in ("phrase", "near", "phrase_prefix")
                for t in c.terms
            }
        )
        pos_info = (
            probe_dictionary(spark, index_dir, pos_terms, n_partitions)
            if pos_terms
            else {}
        )
        est: dict[int, int] = {}
        for qid in live:
            rows = 0
            for slot, c in scoring[qid]:
                if c.kind in ("phrase", "near", "phrase_prefix"):
                    # estimate from the EXACT terms' dfs (sound row bound:
                    # matches ⊆ any exact term's postings; phrase_prefix
                    # always carries ≥1 exact head term by the parser)
                    dfs = [
                        int(pos_info[t]["df"]) for t in c.terms if t in pos_info
                    ]
                    rows += min(dfs) if dfs else 0
                elif c.kind == "predicate":
                    # ConstantScore(filter): selectivity unknown without a
                    # scan, so budget the worst case (every doc matches)
                    rows += int(n_docs)
                else:
                    rows += sum(
                        int(info[t]["df"])
                        for t in cl_terms.get((qid, slot), ())
                        if t in info
                    )
            est[qid] = rows
        if sum(est.values()) > max_partial_rows:
            groups: list[list[int]] = []
            cur: list[int] = []
            cur_rows = 0
            for qid in live:
                if cur and cur_rows + est[qid] > max_partial_rows:
                    groups.append(cur)
                    cur, cur_rows = [], 0
                cur.append(qid)
                cur_rows += est[qid]
            if cur:
                groups.append(cur)
            # sub-batches run EAGERLY (collect per group, ≤ k rows/query)
            # instead of folding into one lazy union: a lazy union keeps
            # every group's multi-GB shuffle files live until the final
            # collect — on tmpfs scratch that accumulation re-creates the
            # very memory cliff the bound exists to avoid (observed: the
            # 64M-doc 100-query run was OOM-killed by ~53 GB of retained
            # sub-batch shuffle on /dev/shm plus the driver heap). After
            # each group the plan is dropped and a JVM GC nudge lets
            # ContextCleaner reap its shuffle files before the next runs.
            rows: list = []
            for g in groups:
                rows.extend(
                    boolean_topk_multi(
                        spark,
                        index_dir,
                        {qid: parsed[qid] for qid in g},
                        k=k,
                        k1=k1,
                        b=b,
                        max_expansions=max_expansions,
                        combine=combine,
                        tie_breaker=tie_breaker,
                        min_should_match={qid: msm[qid] for qid in g},
                    ).collect()
                )
                spark.sparkContext._jvm.System.gc()
            return spark.createDataFrame(rows, _BATCH_SCHEMA)

    tomb_bc, tomb_over = _tombstones(spark, index_dir)
    parts: list[DataFrame] = []

    # ---- term-clause partial stream: decode once, fan out per (qid, slot).
    # For a ConstantScore clause the weight IS the per-doc partial (const
    # flag set); for BM25 clauses it is idf·boost, multiplied by tf_norm.
    any_const = any(
        c.const_score is not None
        for qid in live
        for _s, c in scoring[qid]
    )
    fan: dict[str, tuple] = {}
    for (qid, slot), ts in cl_terms.items():
        if qid not in live_set:
            continue
        c = scoring[qid][slot][1]
        is_m = c.occur == MUST
        for t in ts:
            if t in info:
                fan.setdefault(t, []).append(
                    (qid, slot, is_m,
                     float(c.const_score) if c.const_score is not None
                     else idf[t] * float(c.boost),
                     c.const_score is not None)
                )
    if fan:
        fan_arr = {
            t: (
                np.asarray([e[0] for e in v], np.int32),
                np.asarray([e[1] for e in v], np.int32),
                np.asarray([e[2] for e in v], bool),
                np.asarray([e[3] for e in v], np.float64),
                np.asarray([e[4] for e in v], bool),
            )
            for t, v in fan.items()
        }
        pids = sorted({info[t]["partition_id"] for t in fan})
        seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("partition_id").isin(pids) & F.col("term").isin(sorted(fan))
        )
        seg = _spread_slices(seg, spark, sum(int(info[t]["df"]) for t in fan))

        from .bm25_segments import _OUT_CHUNK_ROWS

        def score_slices(pdf_iter):
            oq, os_, om, od, op, ok, n_out = [], [], [], [], [], [], 0

            def flush():
                return pd.DataFrame(
                    {
                        "query_id": np.concatenate(oq),
                        "slot": np.concatenate(os_),
                        "is_must": np.concatenate(om),
                        "doc_id": np.concatenate(od),
                        "partial": np.concatenate(op),
                        "is_const": np.concatenate(ok),
                    }
                )

            for pdf in pdf_iter:
                for term, blob in zip(pdf["term"], pdf["blob"]):
                    doc_ids, tfs, dls = decode_postings(bytes(blob))
                    if tomb_bc is not None and doc_ids.size:
                        mliv = live_mask(doc_ids, tomb_bc.value)
                        if not mliv.all():
                            doc_ids, tfs, dls = doc_ids[mliv], tfs[mliv], dls[mliv]
                    if doc_ids.size == 0:
                        continue
                    qa, sa, ma, wa, ka = fan_arr[term]
                    tfn = (
                        None
                        if ka.all()  # const-only term: skip the BM25 math
                        else _tf_norm(
                            tfs.astype(np.float64), dls.astype(np.float64),
                            avgdl, k1, b,
                        )
                    )
                    for i in range(qa.size):
                        oq.append(np.full(doc_ids.size, qa[i], np.int32))
                        os_.append(np.full(doc_ids.size, sa[i], np.int32))
                        om.append(np.full(doc_ids.size, ma[i], bool))
                        od.append(doc_ids)
                        op.append(
                            np.full(doc_ids.size, wa[i], np.float64)
                            if ka[i]
                            else tfn * wa[i]
                        )
                        ok.append(np.full(doc_ids.size, ka[i], bool))
                        n_out += doc_ids.size
                        if n_out >= _OUT_CHUNK_ROWS:
                            yield flush()
                            oq, os_, om, od, op, ok, n_out = (
                                [], [], [], [], [], [], 0,
                            )
            if od:
                yield flush()

        parts.append(
            seg.mapInPandas(
                score_slices,
                schema="query_id int, slot int, is_must boolean, doc_id long, "
                       "partial double, is_const boolean",
            )
        )

    # ---- positional clauses (scoring AND MUST_NOT) in ONE matcher pass
    pos_spec: dict[int, tuple[list, int | None]] = {}
    # key, qid, slot, is_must, boost, const (null = BM25-scored)
    pos_meta: list[tuple[int, int, int, bool, float, float | None]] = []
    not_pos_keys: dict[int, int] = {}  # key -> qid (exclusion matches)
    for qid in live:
        for slot, c in scoring[qid]:
            if c.kind in ("phrase", "near", "phrase_prefix"):
                slots = _positional_slots(spark, index_dir, c, max_expansions)
                if slots is None:
                    continue  # unexpandable prefix: n_must coverage empties
                key = qid * _SLOT_BASE + slot
                pos_spec[key] = (slots, c.window)
                pos_meta.append(
                    (key, qid, slot, c.occur == MUST, float(c.boost),
                     c.const_score)
                )
        for j, c in enumerate(nots[qid]):
            if c.kind in ("phrase", "near", "phrase_prefix"):
                slots = _positional_slots(spark, index_dir, c, max_expansions)
                if slots is None:
                    continue  # unexpandable -"a b*" excludes nothing
                key = -(qid * _SLOT_BASE + j + 1)
                pos_spec[key] = (slots, c.window)
                not_pos_keys[key] = qid
    excl: list[DataFrame] = []
    if pos_spec:
        from .phrase import positional_matches_multi

        matched, _pstats = positional_matches_multi(spark, index_dir, pos_spec)
        matched = matched.persist()
        if pos_meta:
            meta_df = spark.createDataFrame(
                pos_meta,
                "query_id_key int, qid int, slot int, is_must boolean, "
                "boost double, const double",
            )
            sc_m = matched.withColumnRenamed("query_id", "query_id_key").join(
                F.broadcast(meta_df), "query_id_key"
            )
            dfp = sc_m.groupBy("query_id_key").agg(
                F.count(F.lit(1)).cast("double").alias("df_phrase")
            )
            parts.append(
                sc_m.join(F.broadcast(dfp), "query_id_key").select(
                    F.col("qid").alias("query_id"),
                    "slot",
                    "is_must",
                    "doc_id",
                    F.coalesce(
                        F.col("const"),
                        idf_expr(F.col("df_phrase"), F.lit(n_docs))
                        * tf_norm_expr(
                            F.col("phrase_tf").cast("double"),
                            F.col("doc_len").cast("double"),
                            F.lit(avgdl),
                            k1,
                            b,
                        )
                        * F.col("boost"),
                    ).alias("partial"),
                    F.col("const").isNotNull().alias("is_const"),
                )
            )
        if not_pos_keys:
            nk = spark.createDataFrame(
                list(not_pos_keys.items()), "query_id_key int, qid int"
            )
            excl.append(
                matched.withColumnRenamed("query_id", "query_id_key")
                .join(F.broadcast(nk), "query_id_key")
                .select(F.col("qid").alias("query_id"), "doc_id")
            )

    # ---- scoring-predicate streams (ConstantScore over metadata filters):
    # doc_meta scans (metadata-scale), tombstone-masked like the single path
    for qid in live:
        for slot, c in scoring[qid]:
            if c.kind != "predicate":
                continue
            pm = (
                spark.read.parquet(os.path.join(index_dir, "doc_meta"))
                .filter(c.predicate)
                .select(
                    F.lit(qid).cast("int").alias("query_id"),
                    F.lit(slot).cast("int").alias("slot"),
                    F.lit(c.occur == MUST).alias("is_must"),
                    "doc_id",
                    F.lit(float(c.const_score)).alias("partial"),
                    F.lit(True).alias("is_const"),
                )
            )
            if tomb_bc is not None and tomb_bc.value.size:
                dead = spark.createDataFrame(
                    [(int(d),) for d in tomb_bc.value], "doc_id long"
                )
                pm = pm.join(F.broadcast(dead), "doc_id", "left_anti")
            parts.append(pm)

    if not parts:
        return spark.createDataFrame([], _BATCH_SCHEMA)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    if tomb_over is not None:
        allp = allp.join(tomb_over, "doc_id", "left_anti")

    # ---- ONE exchange: per-slot pivot + MUST coverage per (query, doc).
    # Const slots fold with MAX (v once per doc, expansion-term dupes all
    # equal v); a (query, slot) is either const or BM25, so exactly one of
    # the two legs is non-null per group — their coalesced sum is the slot.
    if any_const:
        aggs = [
            (
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("slot") == j) & ~F.col("is_const"),
                            F.col("partial"),
                        )
                    ),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.max(
                        F.when(
                            (F.col("slot") == j) & F.col("is_const"),
                            F.col("partial"),
                        )
                    ),
                    F.lit(0.0),
                )
            ).alias(f"_s{j}")
            for j in range(m_slots)
        ]
    else:
        aggs = [
            F.coalesce(
                F.sum(F.when(F.col("slot") == j, F.col("partial"))), F.lit(0.0)
            ).alias(f"_s{j}")
            for j in range(m_slots)
        ]
    aggs.append(
        F.count_distinct(F.when(F.col("is_must"), F.col("slot"))).alias("n_cov")
    )
    if any_msm:
        # SHOULD coverage (minimum_should_match): distinct non-MUST slots
        aggs.append(
            F.count_distinct(
                F.when(~F.col("is_must"), F.col("slot"))
            ).alias("n_scov")
        )
    scored = allp.groupBy("query_id", "doc_id").agg(*aggs)
    qmeta = spark.createDataFrame(
        [
            (
                qid,
                sum(1 for _s, c in scoring[qid] if c.occur == MUST),
                msm[qid],
            )
            for qid in live
        ],
        "query_id int, n_must int, msm int",
    )
    scored = scored.join(F.broadcast(qmeta), "query_id").filter(
        F.col("n_cov") == F.col("n_must")
    )
    if any_msm:
        scored = scored.filter(F.col("n_scov") >= F.col("msm"))
    cols = [F.col(f"_s{j}") for j in range(m_slots)]
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    if combine == "dismax":
        best = F.greatest(*cols) if m_slots > 1 else cols[0]
        expr = best + F.lit(float(tie_breaker)) * (total - best)
    else:
        expr = total
    scored = scored.withColumn(
        "score", F.round(expr, SCORE_ROUND_DECIMALS)
    ).select("query_id", "doc_id", "score")

    # ---- MUST_NOT: term-ish sets via one pruned scan; + positional above;
    # + negated predicates — ONE (query_id, doc_id) anti-join for all
    nf: dict[str, list[int]] = {}
    for qid, ts in not_terms.items():
        if qid not in live_set:
            continue
        for t in ts:
            if t in info:
                nf.setdefault(t, []).append(qid)
    if nf:
        pids = sorted({info[t]["partition_id"] for t in nf})
        nseg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("partition_id").isin(pids) & F.col("term").isin(sorted(nf))
        )
        nf_arr = {t: np.asarray(v, np.int32) for t, v in nf.items()}

        def excl_docs(pdf_iter):
            for pdf in pdf_iter:
                oq, od = [], []
                for term, blob in zip(pdf["term"], pdf["blob"]):
                    ids = decode_postings(bytes(blob))[0]
                    if ids.size == 0:
                        continue
                    for qid in nf_arr[term]:
                        oq.append(np.full(ids.size, qid, np.int32))
                        od.append(ids)
                if od:
                    yield pd.DataFrame(
                        {"query_id": np.concatenate(oq), "doc_id": np.concatenate(od)}
                    )

        excl.append(nseg.mapInPandas(excl_docs, schema="query_id int, doc_id long"))
    meta_path = os.path.join(index_dir, "doc_meta")
    for qid in live:
        for c in nots[qid]:
            if c.kind == "predicate":
                excl.append(
                    spark.read.parquet(meta_path)
                    .filter(c.predicate)
                    .select(F.lit(qid).cast("int").alias("query_id"), "doc_id")
                )
    if excl:
        ex = excl[0]
        for e in excl[1:]:
            ex = ex.unionByName(e)
        scored = scored.join(ex.distinct(), ["query_id", "doc_id"], "left_anti")

    # ---- FILTER: ONE (query_id, doc_id) semi-join over all predicates
    flt: list[DataFrame] = []
    for qid in live:
        for c in filters[qid]:
            flt.append(
                spark.read.parquet(meta_path)
                .filter(c.predicate)
                .select(F.lit(qid).cast("int").alias("query_id"), "doc_id")
            )
    if flt:
        # a doc must satisfy EVERY filter of its query: count matches
        fu = flt[0]
        for f2 in flt[1:]:
            fu = fu.unionByName(f2)
        need = spark.createDataFrame(
            [(qid, len(filters[qid])) for qid in live if filters[qid]],
            "query_id int, n_flt int",
        )
        ok = (
            fu.groupBy("query_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .join(F.broadcast(need), "query_id")
            .filter(F.col("n_hit") == F.col("n_flt"))
            .select("query_id", "doc_id")
        )
        has_flt = {qid for qid in live if filters[qid]}
        no_flt = scored.filter(~F.col("query_id").isin(sorted(has_flt)))
        scored = (
            scored.filter(F.col("query_id").isin(sorted(has_flt)))
            .join(ok, ["query_id", "doc_id"], "left_semi")
            .unionByName(no_flt)
        )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
