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

Plan shape: the DEFAULT path for both single queries (impl="kernel" =
batch of one) and batches is the bucket-packed kernel — per-field
dictionary probe (partition+term pruned, slice-spread, tombstone-masked)
→ decode kernel packs postings as (field, term, doc-range bucket)
primitive-array rows → ONE bucket co-location exchange (query-count-
independent) → a numpy kernel builds dense per-term partial vectors once
per bucket (BM25F's cross-field tfw blend + saturation fold in-kernel)
and scores every query as dense vector adds, emitting local per-query
top-k with a one-quantum margin + exact HALF_UP correction → a tiny rank
window. impl="fold" keeps the independent Catalyst-fold reference
(per-field folds → union → combine) the equivalence tests pin the kernel
against. Group collectors cannot use doc-level θ/block-max bounds here
for the same soundness reason as collapse_topk: a doc's combined score
depends on rows from stores a single-field bound knows nothing about.
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
    impl: str = "kernel",
) -> DataFrame:
    """ES multi_match type=best_fields over per-field segment stores.

    Combined score = best field + tie_breaker × (sum of the others), each
    field scored by its own store's exact BM25 fold × its weight. With one
    field, weight 1 and any tie_breaker this IS topk_segments (tested).
    tie_breaker ∈ [0, 1] (Lucene DisjunctionMaxQuery tieBreakerMultiplier).

    impl="kernel" (default) routes through the bucketed batch executor as
    a batch of one — measured 1.4× faster warm at 8M docs (3.80 → 2.79 s)
    because the per-field fold + union + combine exchanges collapse into
    the single doc-co-location shuffle. impl="fold" keeps the independent
    Catalyst-fold reference implementation the equivalence tests pin the
    kernel against.
    """
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    w = _norm_weights(field_dirs, weights)
    if impl == "kernel":
        return multi_match_topk_multi(
            spark, field_dirs, {0: list(terms)}, k, weights, tie_breaker, k1, b
        ).select("rank", "doc_id", "score")
    if impl != "fold":
        raise ValueError(f"impl must be 'kernel' or 'fold', got {impl!r}")
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
    impl: str = "kernel",
) -> DataFrame:
    """BM25F (ES multi_match type=cross_fields) over per-field stores.

    Term-centric: length-normalized per-field tfs are weight-summed BEFORE
    saturation; idf uses the blended df = max over fields (ES
    BlendedTermQuery) with the shared corpus n_docs. See module docstring
    for the exact pinned formula and the single-field reduction.

    impl="kernel" (default) = bucketed batch executor as a batch of one —
    2.2× faster warm at 8M docs (6.30 → 2.84 s; the (doc,term) tfw fold
    and (doc) combine exchanges move into the kernel). impl="fold" keeps
    the Catalyst-fold reference the equivalence tests pin against.
    """
    w = _norm_weights(field_dirs, weights)
    if impl == "kernel":
        return bm25f_topk_multi(
            spark, field_dirs, {0: list(terms)}, k, weights, k1, b
        ).select("rank", "doc_id", "score")
    if impl != "fold":
        raise ValueError(f"impl must be 'kernel' or 'fold', got {impl!r}")
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


def _bucketed_term_arrays(
    spark: SparkSession,
    field_dirs: dict[str, str],
    union_terms: list[str],
    n_buckets: int,
):
    """Per-field pruned scans packed as ARRAY rows for the batch kernel:
    (field, term, bucket, docs, tfs, dls) with one row per
    (field, term, doc-range bucket, slice) and docs RELATIVE to the
    bucket start (int32). The doc-range bucketing is the same layout the
    positional batch executor uses (phrase._bucketed_matches): the
    exchange then moves ~10³ primitive-array rows instead of one row per
    posting — the 4→16 pair measured the per-posting row stream (27M
    rows through decode → Arrow → shuffle) as the non-scaling residual
    after the fan-out fix.

    Returns (stream_df | None, width, fields_meta, dels_df | None) where
    fields_meta = {field: (stats, info)} and dels_df carries over-cap
    tombstones re-packed as per-bucket relative-id arrays (under-cap
    tombstones are masked kernel-side during decode, as everywhere)."""
    metas = {}
    max_id = -1
    for field, d in field_dirs.items():
        stats = load_stats(d)
        info = probe_dictionary(
            spark, d, union_terms, int(stats.get("n_partitions", INDEX_PARTITIONS))
        )
        metas[field] = (stats, info)
        max_id = max(max_id, int(stats.get("max_doc_id", 0)))
    if all(not info for _st, info in metas.values()):
        return None, 0, metas, None
    width = max_id // int(n_buckets) + 1

    parts = []
    dels_parts = []
    for field, d in field_dirs.items():
        stats, info = metas[field]
        matched = sorted(info)
        if not matched:
            continue
        tomb_bc, tomb_over = _tombstones(spark, d)
        pids = sorted({info[t]["partition_id"] for t in matched})
        seg = spark.read.parquet(os.path.join(d, "segments")).filter(
            F.col("partition_id").isin(pids) & F.col("term").isin(matched)
        )
        seg = _spread_slices(
            seg, spark, sum(int(info[t]["df"]) for t in matched)
        )

        def make_pack(tomb_bc=tomb_bc, field=field):
            def pack(pdf_iter):
                from .compress import decode_postings

                for pdf in pdf_iter:
                    out = {
                        "field": [], "term": [], "bucket": [],
                        "docs": [], "tfs": [], "dls": [],
                    }
                    for term, blob in zip(pdf["term"], pdf["blob"]):
                        doc_ids, tfs, dls = decode_postings(bytes(blob))
                        if tomb_bc is not None and doc_ids.size:
                            m = live_mask(doc_ids, tomb_bc.value)
                            if not m.all():
                                doc_ids, tfs, dls = doc_ids[m], tfs[m], dls[m]
                        if doc_ids.size == 0:
                            continue
                        # slices are doc-sorted: one searchsorted splits
                        # the whole posting run into its buckets
                        bks = doc_ids // width
                        cuts = np.flatnonzero(
                            np.concatenate(([True], bks[1:] != bks[:-1]))
                        )
                        ends = np.concatenate((cuts[1:], [doc_ids.size]))
                        for s0, e0 in zip(cuts, ends):
                            bk = int(bks[s0])
                            out["field"].append(field)
                            out["term"].append(term)
                            out["bucket"].append(bk)
                            out["docs"].append(
                                (doc_ids[s0:e0] - bk * width).astype(np.int32)
                            )
                            out["tfs"].append(tfs[s0:e0].astype(np.int32))
                            out["dls"].append(dls[s0:e0].astype(np.int32))
                    if out["field"]:
                        yield pd.DataFrame(out)

            return pack

        parts.append(
            seg.mapInPandas(
                make_pack(),
                schema=(
                    "field string, term string, bucket int, docs array<int>, "
                    "tfs array<int>, dls array<int>"
                ),
            )
        )
        if tomb_over is not None:
            dels_parts.append(tomb_over.select("doc_id"))
    if not parts:
        return None, width, metas, None
    stream = parts[0]
    for p in parts[1:]:
        stream = stream.unionByName(p)
    dels = None
    if dels_parts:
        alld = dels_parts[0]
        for p in dels_parts[1:]:
            alld = alld.unionByName(p)
        dels = (
            alld.distinct()
            .withColumn("bucket", (F.col("doc_id") / F.lit(width)).cast("int"))
            .withColumn(
                "rel", (F.col("doc_id") - F.col("bucket") * F.lit(width)).cast("int")
            )
            .groupBy("bucket")
            .agg(F.sort_array(F.collect_list("rel")).alias("dels"))
        )
    return stream, width, metas, dels


def _kernel_batch_topk(
    spark: SparkSession,
    stream: DataFrame,
    width: int,
    per_query,
    k: int,
    prepare,
    dels: DataFrame | None = None,
) -> DataFrame:
    """Shared batch collector over bucket-packed array rows: ONE exchange
    co-locates each doc-range bucket's (field, term) posting arrays
    (query-count-independent, ~10³ rows), a numpy kernel builds dense
    per-term partial vectors of the bucket width once (prepare — terms
    are shared across queries) and scores EVERY query as dense vector
    adds, emitting only local per-query top-k per bucket. The global
    window then ranks ≤ n_buckets × n_queries × k rows.

    Local-cut exactness is the standard argument: a global top-k doc has
    < k docs above it globally, hence < k above it in its own bucket.
    Final scores go through the one-quantum margin + exact HALF_UP
    correction (np.round is banker's; tie_breaker × 6-decimal per-field
    scores manufacture exact half-quantum values — measured 3/30 graded
    rows off by 1e-6 before this).

    `prepare(groups, width)` → context; groups maps "field|term" →
    (docs_rel, tfs, dls) concatenated int arrays, docs unique per key
    within a bucket. `per_query[qid](ctx)` → (raw scores over the bucket
    range, matched mask)."""
    kk = int(k)
    rep = stream.repartition(
        min(64, 2 * spark.sparkContext.defaultParallelism), "bucket"
    )
    if dels is not None:
        rep = rep.join(F.broadcast(dels), "bucket", "left")
    has_dels = dels is not None
    out_schema = "query_id int, doc_id long, score double"

    def kernel(pdf_iter):
        from decimal import ROUND_HALF_UP, Decimal

        quant = Decimal("0.000001")

        def halfup6(vals):
            # decimal per DISTINCT value only: margin sets are tie-heavy
            # (duplicate docs share exact doubles), and the 64M probe
            # measured per-value decimal as the dominant batch cost
            uniq, inv_ = np.unique(vals, return_inverse=True)
            corr = np.array(
                [
                    float(Decimal(repr(float(v))).quantize(quant, ROUND_HALF_UP))
                    for v in uniq
                ]
            )
            return corr[inv_]

        frames = [f for f in pdf_iter if len(f)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        out_q, out_d, out_s = [], [], []
        for bk, grp in pdf.groupby("bucket", sort=False):
            groups = {}
            for key, sub in grp.groupby(
                grp["field"] + "|" + grp["term"], sort=False
            ):
                docs = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in sub["docs"]]
                )
                tfs = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in sub["tfs"]]
                )
                dls = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in sub["dls"]]
                )
                groups[key] = (docs, tfs, dls)
            ctx = prepare(groups, width)
            del_rel = None
            if has_dels:
                first = grp["dels"].iloc[0]
                # buckets with no deletes carry null from the left join —
                # surfaced as None or NaN depending on the Arrow path
                if isinstance(first, (list, np.ndarray)) and len(first):
                    del_rel = np.asarray(first, dtype=np.int64)
            base = int(bk) * width
            for qid in sorted(per_query):
                raw, matched = per_query[qid](ctx)
                if del_rel is not None:
                    matched = matched.copy()
                    matched[del_rel[del_rel < matched.size]] = False
                nz = np.flatnonzero(matched)
                if nz.size == 0:
                    continue
                prelim = np.round(raw[nz], SCORE_ROUND_DECIMALS)
                if nz.size > kk:
                    kth_val = -np.partition(-prelim, kk - 1)[kk - 1]
                    keep = np.flatnonzero(prelim >= kth_val - 1.5e-6)
                else:
                    keep = np.arange(nz.size)
                cand = nz[keep]
                sc = halfup6(raw[cand])
                order = np.lexsort((cand, -sc))[:kk]
                out_q.append(np.full(order.size, qid, dtype=np.int32))
                out_d.append(base + cand[order])
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
    """Per-query posting-row estimate: Σ over fields and query terms of
    the dictionary df — zero posting reads (the same metadata-only
    discipline as boolean_topk_multi's stream bound). Under the bucketed
    kernel this bounds per-sub-batch decode volume and the number of
    live per-term dense vectors each bucket holds, not a shuffled row
    count — the knob's meaning is "how much term-level data one batch
    may touch"."""
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
    n_buckets = min(64, 2 * spark.sparkContext.defaultParallelism)
    stream, width, metas, dels = _bucketed_term_arrays(
        spark, field_dirs, union_terms, n_buckets
    )
    if stream is None:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")

    from .bm25_segments import _tf_norm

    params = {}
    field_names = []
    for field, (stats, info) in metas.items():
        if not info:
            continue
        n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
        field_names.append(field)
        params[field] = (
            {t: _idf(float(info[t]["df"]), n) for t in info},
            avgdl,
            w[field],
        )
    tbf = float(tie_breaker)
    k1f, bf_ = float(k1), float(b)

    def prepare(groups, width_):
        # dense per-(field, term) partial vectors idf·tfnorm, built once —
        # terms are shared across queries
        vecs = {}
        for f_, (idf_f, avgdl_f, _fw) in params.items():
            for t in union_terms:
                g = groups.get(f_ + "|" + t)
                if g is None or t not in idf_f:
                    continue
                docs, tfs, dls = g
                vec = np.zeros(width_)
                vec[docs] = idf_f[t] * _tf_norm(
                    tfs.astype(np.float64), dls.astype(np.float64),
                    avgdl_f, k1f, bf_,
                )
                vecs[(f_, t)] = vec
        return vecs, width_

    def make_fn(terms):
        ts = sorted({t.lower() for t in terms})

        def fn(ctx):
            vecs, n_ = ctx
            ws_list = []
            matched = np.zeros(n_, dtype=bool)
            for f_ in field_names:
                fw = params[f_][2]
                acc = None
                for t in ts:
                    v = vecs.get((f_, t))
                    if v is not None:
                        acc = v.copy() if acc is None else acc + v
                if acc is None:
                    ws_list.append(np.zeros(n_))
                    continue
                matched |= acc > 0
                ws_list.append(np.round(acc, SCORE_ROUND_DECIMALS) * fw)
            stack = np.vstack(ws_list)
            best = stack.max(axis=0)
            return best + tbf * (stack.sum(axis=0) - best), matched

        return fn

    per_query = {int(qid): make_fn(ts) for qid, ts in queries.items()}
    return _kernel_batch_topk(spark, stream, width, per_query, k, prepare, dels)


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
    # stats consistency + blended df from the dictionaries (metadata only)
    n_docs = None
    n_buckets = min(64, 2 * spark.sparkContext.defaultParallelism)
    stream, width, metas, dels = _bucketed_term_arrays(
        spark, field_dirs, union_terms, n_buckets
    )
    for field, (stats, _info) in metas.items():
        if n_docs is None:
            n_docs = float(stats["n_docs"])
        elif float(stats["n_docs"]) != n_docs:
            raise ValueError(
                "field stores disagree on n_docs — not the same corpus: "
                f"{n_docs} vs {stats['n_docs']} ({field_dirs[field]})"
            )
    if stream is None:
        return spark.createDataFrame([], "query_id int, rank int, doc_id long, score double")

    df_blend: dict[str, float] = {}
    field_params = {}
    for field, (stats, info) in metas.items():
        if not info:
            continue
        field_params[field] = (float(stats["avgdl"]), w[field])
        for t, rec in info.items():
            df_blend[t] = max(df_blend.get(t, 0.0), float(rec["df"]))
    idf_py = {t: _idf(df_blend[t], n_docs) for t in df_blend}
    k1f, bf_ = float(k1), float(b)

    # no (term, doc) pre-fold exchange and no per-posting rows at all:
    # the cross-field tfw blend and the saturation fold INSIDE the kernel
    # (each field's arrays for a term are a unique-doc posting set — one
    # direct indexed add per field); the 4→16 pair attributed the
    # residual batch cost first to the fan-out shuffle, then to the
    # per-posting row stream both of which this layout removes
    def prepare(groups, width_):
        vecs = {}
        for t in union_terms:
            tfw = None
            for f_, (avgdl_f, fw) in field_params.items():
                g = groups.get(f_ + "|" + t)
                if g is None:
                    continue
                docs, tfs, dls = g
                if tfw is None:
                    tfw = np.zeros(width_)
                tfw[docs] += fw * tfs.astype(np.float64) / (
                    1.0 - bf_ + bf_ * dls.astype(np.float64) / avgdl_f
                )
            if tfw is not None:
                vecs[t] = idf_py[t] * tfw / (k1f + tfw)
        return vecs, width_

    def make_fn(terms):
        ts = sorted({t.lower() for t in terms})

        def fn(ctx):
            vecs, n_ = ctx
            acc = None
            for t in ts:
                v = vecs.get(t)
                if v is not None:
                    acc = v.copy() if acc is None else acc + v
            if acc is None:
                z = np.zeros(n_)
                return z, np.zeros(n_, dtype=bool)
            return acc, acc > 0

        return fn

    per_query = {int(qid): make_fn(ts) for qid, ts in queries.items()}
    return _kernel_batch_topk(spark, stream, width, per_query, k, prepare, dels)
