"""Multi-field search: ES multi_match (best_fields) and BM25F (cross_fields).

The engine's segment store indexes ONE text field per directory
(segments.write_index over any (doc_id, content) corpus), so a multi-field
index is simply several sibling stores over the same doc_id space — e.g.
`content` (full text) and `title` (a short derived field). This module
combines per-field stores into the two canonical multi-field scoring
contracts (ES `multi_match` modes; reference analog: Contextinator scores a
single enriched-content field, `chroma_ops.py` — multi-field ranking is
beyond-reference surface):

best_fields (multi_match_topk)
    Each field ranks independently with its OWN statistics (df_f, avgdl_f)
    — exactly the per-store exact BM25 fold (`_exact_scored_matches`, the
    unpruned rank-identical kernel) times the field weight — and a doc's
    combined score is

        max_f(w_f · s_f)  +  tie_breaker · (Σ_f w_f · s_f − max_f)

    the Lucene DisjunctionMaxQuery combiner over per-field sub-queries
    (ES multi_match type=best_fields). Per-field scores are rounded to
    SCORE_ROUND_DECIMALS before the combine (they are the same numbers the
    per-field executors return), the combined score rounded once more.

cross_fields / BM25F (bm25f_topk)
    Term-centric blending (Robertson & Zaragoza, "Simple BM25 extension to
    multiple weighted fields", CIKM 2004): per-field term frequencies are
    length-normalized and weight-combined BEFORE saturation,

        tf̃(t, d)  =  Σ_f  w_f · tf_{t,f,d} / B_f(d)
        B_f(d)    =  1 − b + b · dl_f(d) / avgdl_f
        score(d)  =  Σ_t  idf(t) · tf̃ / (k1 + tf̃)

    with a BLENDED document frequency df(t) = max_f df_f(t) (the ES
    cross_fields / BlendedTermQuery convention — a term that is rare in
    every field is rare, a term common in any field is common) and
    n_docs shared across stores (same corpus). Saturating after the
    cross-field sum is what makes two fields each matching once score like
    ONE field matching twice — the property best_fields cannot express.

    Single-field reduction: with one field at weight 1, tf̃ = tf/B and
    idf·tf̃/(k1+tf̃) = idf·tf/(k1·B+tf) — standard BM25 without the
    constant (k1+1) numerator, i.e. rank-identical to topk_segments with
    scores scaled by exactly 1/(k1+1) (tested).

Plan shape (both): per-field dictionary probe (partition+term pruned scan,
slice-spread, tombstone-masked) → decode-once kernel emits primitive
(doc_id, contribution) rows — no token strings — → union across fields →
fold. best_fields folds per (field, doc) then per doc (the per-field fold
happens inside _exact_scored_matches' single groupBy, so the union adds ONE
more doc_id exchange); BM25F folds per (term, doc) then per doc. Fields are
few (2–3); every exchange is match-set-sized, never corpus-sized. Group
collectors cannot use doc-level θ/block-max bounds here for the same
soundness reason as collapse_topk: a doc's combined score depends on rows
from stores a single-field bound knows nothing about.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import BM25_B, BM25_K1, DEFAULT_TOP_K, SCORE_ROUND_DECIMALS
from .bm25_segments import (
    INDEX_PARTITIONS,
    _exact_scored_matches,
    _idf,
    _spread_slices,
    _tombstones,
    load_stats,
    probe_dictionary,
)
from .deletes import live_mask

_RESULT_SCHEMA = "rank int, doc_id long, score double"


def term_tf_stream(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict] | None:
    """(doc_id, term, tf, doc_len) rows for the query terms' live postings.

    The shared raw-partial stream under every term-centric multi-field
    combiner: partition+term pruned scan, slice-spread, decode-once,
    tombstone-masked kernel-side (over-cap tombstone sets via a
    distributed anti-join, same as every executor). Returns
    (stream, dictionary_info) or None when no query term is indexed.
    """
    stats = load_stats(index_dir)
    if n_partitions is None:
        n_partitions = int(stats.get("n_partitions", INDEX_PARTITIONS))
    info = probe_dictionary(spark, index_dir, sorted(set(terms)), n_partitions)
    matched = sorted(info)
    if not matched:
        return None
    tomb_bc, tomb_over = _tombstones(spark, index_dir)
    pids = sorted({info[t]["partition_id"] for t in matched})
    seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
        F.col("partition_id").isin(pids) & F.col("term").isin(matched)
    )
    seg = _spread_slices(seg, spark, sum(int(info[t]["df"]) for t in matched))

    def emit_rows(pdf_iter):
        from .compress import decode_postings

        for pdf in pdf_iter:
            out = {"doc_id": [], "term": [], "tf": [], "doc_len": []}
            for term, blob in zip(pdf["term"], pdf["blob"]):
                doc_ids, tfs, dls = decode_postings(bytes(blob))
                if tomb_bc is not None and doc_ids.size:
                    m = live_mask(doc_ids, tomb_bc.value)
                    if not m.all():
                        doc_ids, tfs, dls = doc_ids[m], tfs[m], dls[m]
                if doc_ids.size == 0:
                    continue
                out["doc_id"].append(doc_ids)
                out["term"].append(np.full(doc_ids.size, term, dtype=object))
                out["tf"].append(tfs.astype(np.int64))
                out["doc_len"].append(dls.astype(np.int64))
            if out["doc_id"]:
                yield pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    stream = seg.mapInPandas(
        emit_rows, schema="doc_id long, term string, tf long, doc_len long"
    )
    if tomb_over is not None:
        stream = stream.join(tomb_over, "doc_id", "left_anti")
    return stream, info


def _norm_weights(
    field_dirs: dict[str, str], weights: dict[str, float] | None
) -> dict[str, float]:
    if not field_dirs:
        raise ValueError("field_dirs must name at least one field store")
    for f in field_dirs:
        if "|" in f:
            raise ValueError(f"field name must not contain '|': {f!r}")
    w = dict.fromkeys(field_dirs, 1.0)
    for f, v in (weights or {}).items():
        if f not in w:
            raise ValueError(f"weight for unknown field {f!r}")
        if v < 0:
            raise ValueError(f"field weight must be >= 0, got {f}={v}")
        w[f] = float(v)
    return w


def _ranked(combined: DataFrame, k: int) -> DataFrame:
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        combined.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "score")
    )


def multi_match_topk(
    spark: SparkSession,
    field_dirs: dict[str, str],
    terms: list[str],
    k: int = DEFAULT_TOP_K,
    weights: dict[str, float] | None = None,
    tie_breaker: float = 0.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """ES multi_match type=best_fields over per-field segment stores.

    Combined score = best field + tie_breaker × (sum of the others), each
    field scored by its own store's exact BM25 fold × its weight. With one
    field, weight 1 and any tie_breaker this IS topk_segments (tested).
    tie_breaker ∈ [0, 1] (Lucene DisjunctionMaxQuery tieBreakerMultiplier).
    """
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    w = _norm_weights(field_dirs, weights)
    parts = []
    for field, d in field_dirs.items():
        scored = _exact_scored_matches(spark, d, terms, k1, b)
        if scored is None:
            continue
        parts.append(scored.select("doc_id", (F.col("score") * F.lit(w[field])).alias("ws")))
    if not parts:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    combined = allp.groupBy("doc_id").agg(
        F.round(
            F.max("ws") + F.lit(float(tie_breaker)) * (F.sum("ws") - F.max("ws")),
            SCORE_ROUND_DECIMALS,
        ).alias("score")
    )
    return _ranked(combined, k)


def bm25f_topk(
    spark: SparkSession,
    field_dirs: dict[str, str],
    terms: list[str],
    k: int = DEFAULT_TOP_K,
    weights: dict[str, float] | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25F (ES multi_match type=cross_fields) over per-field stores.

    Term-centric: length-normalized per-field tfs are weight-summed BEFORE
    saturation; idf uses the blended df = max over fields (ES
    BlendedTermQuery) with the shared corpus n_docs. See module docstring
    for the exact pinned formula and the single-field reduction.
    """
    w = _norm_weights(field_dirs, weights)
    qterms = sorted({t.lower() for t in terms})

    streams: list[tuple[str, DataFrame, dict, dict]] = []
    n_docs = None
    for field, d in field_dirs.items():
        stats = load_stats(d)
        if n_docs is None:
            n_docs = float(stats["n_docs"])
        elif float(stats["n_docs"]) != n_docs:
            raise ValueError(
                "field stores disagree on n_docs — not the same corpus: "
                f"{n_docs} vs {stats['n_docs']} ({d})"
            )
        got = term_tf_stream(spark, d, qterms)
        if got is None:
            continue
        streams.append((field, got[0], got[1], stats))
    if not streams:
        return spark.createDataFrame([], _RESULT_SCHEMA)

    # blended df per term: max over the fields where the term is indexed
    df_blend: dict[str, float] = {}
    for _field, _s, info, _stats in streams:
        for t, rec in info.items():
            df_blend[t] = max(df_blend.get(t, 0.0), float(rec["df"]))
    idf_map = F.create_map(
        *[x for t in df_blend for x in (F.lit(t), F.lit(_idf(df_blend[t], n_docs)))]
    )

    parts = []
    for field, stream, _info, stats in streams:
        avgdl = float(stats["avgdl"])
        bf = 1.0 - b + b * F.col("doc_len").cast("double") / F.lit(avgdl)
        parts.append(
            stream.select(
                "doc_id",
                "term",
                (F.lit(w[field]) * F.col("tf").cast("double") / bf).alias("contrib"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)

    per_term = allp.groupBy("doc_id", "term").agg(F.sum("contrib").alias("tfw"))
    scored = per_term.select(
        "doc_id",
        (
            idf_map[F.col("term")]
            * F.col("tfw")
            / (F.lit(float(k1)) + F.col("tfw"))
        ).alias("partial"),
    )
    combined = scored.groupBy("doc_id").agg(
        F.round(F.sum("partial"), SCORE_ROUND_DECIMALS).alias("score")
    )
    return _ranked(combined, k)


def _kernel_batch_topk(
    spark: SparkSession,
    partials: DataFrame,
    per_query,
    k: int,
    key_cols: list[str],
    prepare=None,
) -> DataFrame:
    """Shared batch collector: partials (key_cols…, doc_id, part) — ONE
    row per (key, doc) — are co-located by doc_id (one exchange of the
    TERM-LEVEL stream, which is query-count-independent), then a numpy
    kernel computes EVERY query's per-doc score inside the partition and
    emits only each (partition, query)'s local top-k. The global window
    then ranks ≤ n_partitions × n_queries × k rows.

    This replaces the earlier broadcast fan-out join + (query, doc)
    fold, which materialized Σ_q Σ_t df rows through a shuffle — at 200
    queries × 1M saturated docs that was a 540M-row exchange, and the
    4→16-core pair measured its variable cost scaling at 0.575 (shuffle
    write bandwidth, not CPU). The kernel performs the same Σ adds as
    vectorized in-memory accumulations instead; local-cut exactness is
    the standard argument: a global top-k doc has < k docs above it
    globally, hence < k above it in its own partition.

    `prepare(groups, inv, parts, udocs)` runs ONCE per partition and
    returns a context (e.g. dense per-term partial vectors — terms are
    shared across queries, so per-term work must not repeat per query);
    each `per_query[qid](ctx)` → (raw scores ndarray over udocs, matched
    mask). `groups` maps the "|"-joined key_cols values to row indices."""
    kk = int(k)
    n_out = spark.sparkContext.defaultParallelism * 2
    rep = partials.repartition(n_out, "doc_id")
    out_schema = "query_id int, doc_id long, score double"

    def kernel(pdf_iter):
        frames = [f for f in pdf_iter if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(key_cols) == 1:
            keys = pdf[key_cols[0]].to_numpy()
        else:
            # "|" separator: terms are [a-z0-9_]+ by the tokenizer and
            # field names are validated in _norm_weights; NUL is NOT safe
            # here — the Arrow->pandas string path strips it (measured:
            # "content" + NUL + "hash" came back "contenthash")
            keys = (pdf[key_cols[0]] + "|" + pdf[key_cols[1]]).to_numpy()
        docs = pdf["doc_id"].to_numpy(np.int64)
        parts = pdf["part"].to_numpy(np.float64)
        udocs, inv = np.unique(docs, return_inverse=True)
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        starts = np.flatnonzero(
            np.concatenate(([True], skeys[1:] != skeys[:-1]))
        )
        groups = {}
        for i, s0 in enumerate(starts):
            e = starts[i + 1] if i + 1 < starts.size else skeys.size
            groups[skeys[s0]] = order[s0:e]
        from decimal import ROUND_HALF_UP, Decimal

        quant = Decimal("0.000001")

        def halfup6(vals):
            # Spark round() = BigDecimal.valueOf(double) HALF_UP — i.e.
            # HALF_UP on the SHORTEST decimal repr; np.round is banker's
            # and visibly diverges here because tie_breaker × (6-decimal
            # per-field scores) manufactures exact half-quantum values
            # (measured: 3/30 graded rows off by 1e-6 before this)
            return np.array(
                [
                    float(Decimal(repr(float(v))).quantize(quant, ROUND_HALF_UP))
                    for v in vals
                ]
            )

        ctx = (
            prepare(groups, inv, parts, udocs)
            if prepare is not None
            else (groups, inv, parts, udocs)
        )
        out_q, out_d, out_s = [], [], []
        for qid in sorted(per_query):
            raw, matched = per_query[qid](ctx)
            nz = np.flatnonzero(matched)
            if nz.size == 0:
                continue
            prelim = np.round(raw[nz], SCORE_ROUND_DECIMALS)
            # one-quantum margin before the exact-rounding correction:
            # a doc whose banker's-rounded score sits 1e-6 below the kth
            # could round HALF_UP to a tie — keep it for the re-rank
            if nz.size > kk:
                kth_val = -np.partition(-prelim, kk - 1)[kk - 1]
                keep = np.flatnonzero(prelim >= kth_val - 1.5e-6)
            else:
                keep = np.arange(nz.size)
            cand = nz[keep]
            sc = halfup6(raw[cand])
            order = np.lexsort((udocs[cand], -sc))[:kk]
            out_q.append(np.full(order.size, qid, dtype=np.int32))
            out_d.append(udocs[cand][order])
            out_s.append(sc[order])
        if out_q:
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "score": np.concatenate(out_s),
                }
            )

    local = rep.mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= kk)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _estimate_rows(
    spark: SparkSession, field_dirs: dict[str, str], queries: dict[int, list[str]]
) -> dict[int, int]:
    """Per-query partial-stream row estimate: Σ over fields and query
    terms of the dictionary df — zero posting reads (the same
    metadata-only discipline as boolean_topk_multi's stream bound)."""
    union_terms = sorted({t.lower() for ts in queries.values() for t in ts})
    dfs: dict[str, int] = {}
    for d in field_dirs.values():
        stats = load_stats(d)
        info = probe_dictionary(
            spark, d, union_terms, int(stats.get("n_partitions", INDEX_PARTITIONS))
        )
        for t, rec in info.items():
            dfs[t] = dfs.get(t, 0) + int(rec["df"])
    return {
        qid: sum(dfs.get(t.lower(), 0) for t in set(ts))
        for qid, ts in queries.items()
    }


def _pack_subbatches(
    queries: dict[int, list[str]], est: dict[int, int], bound: int
) -> list[dict[int, list[str]]]:
    """Greedy qid-ordered packing under the row bound (a single query over
    the bound still runs alone — the bound is a batching knob, not a
    refusal)."""
    batches: list[dict[int, list[str]]] = []
    cur: dict[int, list[str]] = {}
    rows = 0
    for qid in sorted(queries):
        e = est[qid]
        if cur and rows + e > bound:
            batches.append(cur)
            cur, rows = {}, 0
        cur[qid] = queries[qid]
        rows += e
    if cur:
        batches.append(cur)
    return batches


def multi_match_topk_multi(
    spark: SparkSession,
    field_dirs: dict[str, str],
    queries: dict[int, list[str]],
    k: int = DEFAULT_TOP_K,
    weights: dict[str, float] | None = None,
    tie_breaker: float = 0.0,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_partial_rows: int | None = None,
) -> DataFrame:
    """Batch best_fields: many multi_match queries in ONE plan →
    (query_id, rank, doc_id, score), batch ≡ single per query (tested).

    The saving is structural: per-field term partials idf_f(t)·tfnorm_f
    are QUERY-INDEPENDENT, so each field's store is probed and decoded
    once over the union of every query's terms (term_tf_stream — decode
    each term once no matter how many queries share it) and the per-query
    attribution happens at the end through a broadcast (term, query_id)
    fan-out join. Exchanges: (query, field, doc) fold → (query, doc)
    DisMax combine → per-query top-k window; all match-set-scale."""
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    w = _norm_weights(field_dirs, weights)
    union_terms = sorted({t.lower() for ts in queries.values() for t in ts})
    if not queries or not union_terms:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")
    if max_partial_rows is not None and len(queries) > 1:
        est = _estimate_rows(spark, field_dirs, queries)
        if sum(est.values()) > max_partial_rows:
            parts_out = [
                multi_match_topk_multi(
                    spark, field_dirs, sub, k, weights, tie_breaker, k1, b
                )
                for sub in _pack_subbatches(queries, est, max_partial_rows)
            ]
            out = parts_out[0]
            for p in parts_out[1:]:
                out = out.unionByName(p)
            return out
    parts = []
    field_names = []
    for field, d in field_dirs.items():
        stats = load_stats(d)
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
        got = term_tf_stream(spark, d, union_terms)
        if got is None:
            continue
        stream, info = got
        idf_map = F.create_map(
            *[x for t in info for x in (F.lit(t), F.lit(_idf(float(info[t]["df"]), n)))]
        )
        tfn = (
            F.col("tf").cast("double") * (k1 + 1.0)
        ) / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / F.lit(avgdl))
        )
        field_names.append(field)
        parts.append(
            stream.select(
                F.lit(field).alias("field"),
                "term",
                "doc_id",
                (idf_map[F.col("term")] * tfn).alias("part"),
            )
        )
    if not parts:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)

    # per-query combine inside the doc-co-located kernel: per-field sums
    # (one (field, term) group is a unique-doc posting set, so direct
    # indexed adds — no scatter conflicts), per-field round, weight,
    # DisMax. Absent field contributes ws = 0, inert in max and sum
    # because BM25 partials are strictly positive.
    tbf = float(tie_breaker)
    fws = [(f_, w[f_]) for f_ in field_names]

    def prepare(groups, inv, partv, udocs):
        # dense per-(field, term) partial vectors, built once — terms are
        # shared across queries, so this work must not repeat per query
        vecs = {}
        for f_, _fw in fws:
            for t in union_terms:
                rows = groups.get(f_ + "|" + t)
                if rows is not None:
                    acc = np.zeros(udocs.size)
                    acc[inv[rows]] = partv[rows]
                    vecs[(f_, t)] = acc
        return vecs, udocs.size

    def make_fn(terms):
        ts = sorted({t.lower() for t in terms})

        def fn(ctx):
            vecs, n = ctx
            ws_list = []
            matched = np.zeros(n, dtype=bool)
            for f_, fw in fws:
                acc = None
                for t in ts:
                    v = vecs.get((f_, t))
                    if v is not None:
                        acc = v.copy() if acc is None else acc + v
                if acc is None:
                    ws_list.append(np.zeros(n))
                    continue
                matched |= acc > 0
                ws_list.append(np.round(acc, SCORE_ROUND_DECIMALS) * fw)
            stack = np.vstack(ws_list)
            best = stack.max(axis=0)
            return best + tbf * (stack.sum(axis=0) - best), matched

        return fn

    per_query = {int(qid): make_fn(ts) for qid, ts in queries.items()}
    return _kernel_batch_topk(
        spark, allp, per_query, k, ["field", "term"], prepare=prepare
    )


def bm25f_topk_multi(
    spark: SparkSession,
    field_dirs: dict[str, str],
    queries: dict[int, list[str]],
    k: int = DEFAULT_TOP_K,
    weights: dict[str, float] | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_partial_rows: int | None = None,
) -> DataFrame:
    """Batch BM25F: many cross_fields queries in ONE plan, batch ≡ single
    per query (tested). Even more shares than best_fields: the whole
    term-level chain — per-field contributions, the (term, doc) tfw fold
    AND the saturated partial idf·tfw/(k1+tfw) — is query-independent, so
    it is computed once over the term union and only the final
    (query, doc) sum is per-query (broadcast fan-out join). Exchanges:
    (term, doc) blend fold → (query, doc) fold → per-query window."""
    w = _norm_weights(field_dirs, weights)
    union_terms = sorted({t.lower() for ts in queries.values() for t in ts})
    if not queries or not union_terms:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")
    if max_partial_rows is not None and len(queries) > 1:
        est = _estimate_rows(spark, field_dirs, queries)
        if sum(est.values()) > max_partial_rows:
            parts_out = [
                bm25f_topk_multi(spark, field_dirs, sub, k, weights, k1, b)
                for sub in _pack_subbatches(queries, est, max_partial_rows)
            ]
            out = parts_out[0]
            for p in parts_out[1:]:
                out = out.unionByName(p)
            return out
    streams = []
    n_docs = None
    for field, d in field_dirs.items():
        stats = load_stats(d)
        if n_docs is None:
            n_docs = float(stats["n_docs"])
        elif float(stats["n_docs"]) != n_docs:
            raise ValueError(
                "field stores disagree on n_docs — not the same corpus: "
                f"{n_docs} vs {stats['n_docs']} ({d})"
            )
        got = term_tf_stream(spark, d, union_terms)
        if got is None:
            continue
        streams.append((field, got[0], got[1], stats))
    if not streams:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")

    df_blend: dict[str, float] = {}
    for _field, _s, info, _stats in streams:
        for t, rec in info.items():
            df_blend[t] = max(df_blend.get(t, 0.0), float(rec["df"]))

    parts = []
    field_names = []
    for field, stream, _info, stats in streams:
        avgdl = float(stats["avgdl"])
        bf = 1.0 - b + b * F.col("doc_len").cast("double") / F.lit(avgdl)
        field_names.append(field)
        parts.append(
            stream.select(
                F.lit(field).alias("field"),
                "term",
                "doc_id",
                (F.lit(w[field]) * F.col("tf").cast("double") / bf).alias("part"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)

    # no (term, doc) pre-fold exchange: the cross-field tfw blend and the
    # saturation fold INSIDE the kernel (each field's rows for a term are
    # a unique-doc posting set — one direct indexed add per field), so
    # the only exchange left is the doc co-location of the raw term-level
    # stream. The 4→16 pair attributed the residual batch cost to the
    # 25M-group hash aggregate this removes.
    idf_py = {t: _idf(df_blend[t], n_docs) for t in df_blend}
    k1f = float(k1)

    def prepare(groups, inv, partv, udocs):
        vecs = {}
        for t in union_terms:
            tfw = None
            for f_ in field_names:
                rows = groups.get(f_ + "|" + t)
                if rows is not None:
                    if tfw is None:
                        tfw = np.zeros(udocs.size)
                    tfw[inv[rows]] += partv[rows]
            if tfw is not None:
                vecs[t] = idf_py[t] * tfw / (k1f + tfw)
        return vecs, udocs.size

    def make_fn(terms):
        ts = sorted({t.lower() for t in terms})

        def fn(ctx):
            vecs, n = ctx
            acc = None
            for t in ts:
                v = vecs.get(t)
                if v is not None:
                    acc = v.copy() if acc is None else acc + v
            if acc is None:
                z = np.zeros(n)
                return z, np.zeros(n, dtype=bool)
            return acc, acc > 0

        return fn

    per_query = {int(qid): make_fn(ts) for qid, ts in queries.items()}
    return _kernel_batch_topk(
        spark, allp, per_query, k, ["field", "term"], prepare=prepare
    )
