"""Segment store: compressed posting slices + term dictionary + catalog.

Build topology (SURVEY.md §4 item 2, north_star skew requirement) —
default "fused" path (SPARK_GRAFT_SLICE_IMPL selects legacy variants):

  pass A  corpus → (sha2, byte-level count UDF) → doc_meta + stats
          [observe() rides the write; no token strings materialized]
  pass B  heavy-hitter fan-outs: ingest-time hints or deterministic
          hash-mod sample (sampled_heavy_fanout)
          → ONE fused Arrow kernel: tokenize + per-doc tf + salt + local
            (term, slice)-grouping → primitive-array partial rows
          → groupBy(term, slice_id) collect_list of arrays [the only
            full shuffle; bounded per-group by df-scaled salting]
          → batched merge UDF: k-way concat + sort + delta+varbyte blob
            + block-max metadata
          → write parquet partitioned by partition_id = pmod(xxhash64(term), P)
            [query-side partition pruning on the dictionary probe]
  post    exact term dictionary (df/cf = sums over slices) + catalog
          counters derived from the WRITTEN slice rows in one read

  salt: heavy terms (df > HEAVY_DF_FRACTION·N) split into doc_id RANGE
  slices, fan-out scaling with df, light terms → single slice 0. Range
  (not hash) salting keeps slices internally sorted AND mutually ordered,
  so multi-slice posting lists are the concatenation of slices in
  slice_id order — the two-phase merge is embarrassingly parallel and
  query-side reads need no re-sort.

Heavy terms stay as MULTIPLE slice rows in storage (they are re-merged
logically at query time and physically by compact_segments) — a single
10^11-posting blob row would be unreadable by one task; slices keep both
build and query parallel. Per-partition lineage/counters land in catalog/.

Resumability: each epoch writes only partitions missing from catalog/;
crash between epochs → rerun skips committed partitions (anti-join).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..config import (
    BLOCK_SIZE,
    HEAVY_DF_FRACTION,
    HEAVY_SALT_FANOUT,
    INDEX_PARTITIONS,
    MAX_SALT_FANOUT,
    SLICE_TARGET_POSTINGS,
)
from .compress import block_max, encode_postings

_ENC_TYPE = T.StructType(
    [
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "block_max",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("upper_doc", T.LongType()),
                        T.StructField("max_tf", T.IntegerType()),
                        T.StructField("min_dl", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_ENC_TYPE)
def _encode_udf(docs: pd.Series, tfs_col: pd.Series, dls_col: pd.Series) -> pd.DataFrame:
    """Three primitive arrays (sorted by doc_id) → (blob, block_max)."""
    blobs, bms = [], []
    for d, t, l in zip(docs, tfs_col, dls_col):
        doc_ids = np.asarray(d, dtype=np.int64)
        tfs = np.asarray(t, dtype=np.int64)
        dls = np.asarray(l, dtype=np.int64)
        blobs.append(encode_postings(doc_ids, tfs, dls))
        bms.append(block_max(doc_ids, tfs, dls, BLOCK_SIZE))
    return pd.DataFrame({"blob": blobs, "block_max": bms})


_SLICE_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("slice_id", T.IntegerType()),
        T.StructField("df_slice", T.LongType()),
        T.StructField("cf_slice", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        _ENC_TYPE["block_max"],
        T.StructField("kth_tfnorm", T.DoubleType()),
        T.StructField("partition_id", T.IntegerType()),
    ]
)


def _make_encode_stream(n_partitions: int):
    """Streaming slice encoder over (term, slice_id, doc_id)-sorted input.

    Receives one shuffle partition as a sequence of Arrow batches; all rows
    of a (term, slice_id) group are contiguous (repartition on the group
    key + sortWithinPartitions), so the encoder emits a finished
    (blob, block_max) row at every group boundary and carries the trailing
    partial group across batches. Memory = one group's primitive arrays in
    the Python worker, never a JVM-side list."""

    def _encode_stream(pdf_iter):
        from ..functions.xxhash import term_partition

        carry = None  # (term, slice_id, [docs...], [tfs...], [dls...])
        out: list[dict] = []

        def _emit(term, slice_id, docs, tfs, dls):
            d = np.concatenate(docs).astype(np.int64, copy=False)
            t = np.concatenate(tfs).astype(np.int64, copy=False)
            l = np.concatenate(dls).astype(np.int64, copy=False)
            out.append(
                {
                    "term": term,
                    "slice_id": int(slice_id),
                    "df_slice": int(d.size),
                    "cf_slice": int(t.sum()),
                    "blob": encode_postings(d, t, l),
                    "block_max": block_max(d, t, l, BLOCK_SIZE),
                    "kth_tfnorm": None,  # impact metadata: fused path only
                    "partition_id": term_partition(str(term), n_partitions),
                }
            )

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            terms = pdf["term"].to_numpy()
            slices = pdf["slice_id"].to_numpy()
            docs = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            # group boundaries within the batch
            change = (terms[1:] != terms[:-1]) | (slices[1:] != slices[:-1])
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            ends = np.concatenate((starts[1:], [len(pdf)]))
            for s, e in zip(starts, ends):
                key = (terms[s], slices[s])
                if carry is not None and (carry[0], carry[1]) == key:
                    carry[2].append(docs[s:e])
                    carry[3].append(tfs[s:e])
                    carry[4].append(dls[s:e])
                    continue
                if carry is not None:
                    _emit(*carry)
                carry = [terms[s], slices[s], [docs[s:e]], [tfs[s:e]], [dls[s:e]]]
            if len(out) >= 256:
                yield pd.DataFrame(out)
                out = []
        if carry is not None:
            _emit(*carry)
        if out:
            yield pd.DataFrame(out)

    return _encode_stream


def postings_with_dl(corpus: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, doc_id, tf, dl) with ZERO shuffle: the (doc, term) aggregation
    happens inside the Arrow UDF (doc-local by definition), so the plan is
    scan → project → explode — postings stream straight into the slice
    shuffle."""
    from ..functions.tokenize import termfreq_udf

    tf = termfreq_udf(F.col("content"))
    return (
        corpus.select(F.col(id_col).alias("doc_id"), tf.alias("_tf"))
        .select(
            "doc_id",
            F.col("_tf.dl").alias("dl"),
            F.explode(F.arrays_zip("_tf.terms", "_tf.tfs")).alias("p"),
        )
        .select("doc_id", "dl", F.col("p.terms").alias("term"), F.col("p.tfs").alias("tf"))
    )


def term_dictionary(postings_dl: DataFrame, n_partitions: int = INDEX_PARTITIONS) -> DataFrame:
    return postings_dl.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    ).withColumn("partition_id", F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int"))


def _make_map_combine(heavy_fanout: dict, max_doc_id: int):
    """Map-side combine: doc-major (doc_id, dl, terms[], tfs[]) batches →
    term-major (term, slice_id, docs[], tfs[], dls[]) partial posting rows.

    All vectorized: one factorize + one lexsort per Arrow batch. Heavy-term
    salt fan-outs arrive as a closure dict (bounded: df > 5%·N admits at
    most avg_dl/0.05 terms, ~2k for code corpora), so slice assignment
    needs no join. Emitting ARRAYS instead of exploded rows keeps the
    shuffle free of per-posting row overhead and the reduce side free of
    JVM collect_list object churn (measured: the old reduce spent 17s in
    GC per stage at 8 cores)."""

    def map_combine(pdf_iter):
        for pdf in pdf_iter:
            toks = pdf["terms"]
            lens = toks.str.len().fillna(0).astype("int64").to_numpy()
            if lens.sum() == 0:
                continue
            docs = np.repeat(pdf["doc_id"].to_numpy(), lens)
            dls = np.repeat(pdf["dl"].to_numpy(), lens)
            nonempty = lens > 0  # mask (not truthiness) — null rows are NaN
            flat_terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks[nonempty]]
            )
            tfs = np.concatenate([np.asarray(t) for t in pdf["tfs"][nonempty]])
            codes, uniq = pd.factorize(flat_terms)
            fan = np.fromiter(
                (heavy_fanout.get(u, 1) for u in uniq), dtype=np.int64, count=len(uniq)
            )
            f_per = fan[codes]
            slc = np.zeros(docs.size, dtype=np.int64)
            hv = f_per > 1
            if hv.any():
                slc[hv] = np.minimum(
                    f_per[hv] - 1,
                    (docs[hv].astype(np.float64) / float(max_doc_id + 1) * f_per[hv]).astype(
                        np.int64
                    ),
                )
            order = np.lexsort((docs, slc, codes))
            c_s, s_s = codes[order], slc[order]
            d_s, t_s, l_s = docs[order], tfs[order], dls[order]
            change = (c_s[1:] != c_s[:-1]) | (s_s[1:] != s_s[:-1])
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            ends = np.concatenate((starts[1:], [c_s.size]))
            yield pd.DataFrame(
                {
                    "term": uniq[c_s[starts]],
                    "slice_id": s_s[starts].astype("int32"),
                    "docs": [d_s[s:e] for s, e in zip(starts, ends)],
                    "tfs": [t_s[s:e].astype("int32") for s, e in zip(starts, ends)],
                    "dls": [l_s[s:e].astype("int32") for s, e in zip(starts, ends)],
                }
            )

    return map_combine


def _make_fused_combine(
    heavy_fanout: dict, max_doc_id: int, id_col: str = "doc_id", positions: bool = False
):
    """Fused tokenize + map-side combine: (doc_id, content) Arrow batches →
    term-major (term, slice_id, docs[], tfs[], dls[]) partial posting rows.

    One kernel replaces the old termfreq-UDF → persist → combine chain:
    token arrays never cross the Arrow boundary, never sit in an
    InMemoryRelation, and are never re-read — per-batch the flow is one
    findall, one factorize, one lexsort, one run-length pass. Profiled on
    this VM the old chain's tokenize+persist stage moved ~10 GB through
    cache-build + Arrow round-trips and scaled 1.1× from 2→8 cores while
    the raw pandas kernel scales 3.6×; fusing removes the traffic, not the
    math. Salt fan-outs arrive as a closure dict from the sampled
    heavy-hitter pre-pass (see sampled_heavy_fanout).

    Partial groups leave the map task as PRIMITIVE ARRAYS, not pre-encoded
    varbyte blobs. Measured head-to-head (interleaved 3×, 8 cores, 2M
    docs): blob partials 28-33s vs array partials 14-15s for the identical
    pipeline — shuffle bytes through tmpfs are near-free memcpy while the
    per-batch group encode + per-group bytes slicing and the merge-side
    decode are pure CPU. Compression earns its cost only in the FINAL
    stored blob (network-shuffled clusters may tip the other way; the
    varbyte group kernel lives in compress.encode_posting_groups).

    positions=True additionally emits `poss`: per (term, slice) group, the
    FLAT concatenation of each posting's ascending 0-based token positions
    (lexsort is stable, so a (term, doc) run keeps its original — ascending
    — token order; positions inherit it for free). The positions store thus
    rides the exact same salting + shuffle + merge machinery as the base
    index — no separate skew-blind build path (round-3 VERDICT item 1)."""
    from ..functions.tokenize import TOKEN_PATTERN as _PAT

    def fused(pdf_iter):
        for pdf in pdf_iter:
            # null content tokenizes to [] — the corpus schema declares
            # content non-null, but `cli build` accepts arbitrary parquet
            toks = pdf["content"].fillna("").str.lower().str.findall(_PAT)
            lens = toks.str.len().fillna(0).astype("int64").to_numpy()
            if lens.sum() == 0:
                continue
            docs = np.repeat(pdf[id_col].to_numpy(), lens)
            dls = np.repeat(lens, lens)
            flat_terms = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)]
            )
            codes, uniq = pd.factorize(flat_terms)
            fan = np.fromiter(
                (heavy_fanout.get(u, 1) for u in uniq), dtype=np.int64, count=len(uniq)
            )
            f_per = fan[codes]
            slc = np.zeros(docs.size, dtype=np.int64)
            hv = f_per > 1
            if hv.any():
                slc[hv] = np.minimum(
                    f_per[hv] - 1,
                    (docs[hv].astype(np.float64) / float(max_doc_id + 1) * f_per[hv]).astype(
                        np.int64
                    ),
                )
            order = np.lexsort((docs, slc, codes))
            c_s, s_s = codes[order], slc[order]
            d_s, l_s = docs[order], dls[order]
            if positions:
                # 0-based token position within its doc, aligned to the
                # flat token stream: arange minus each doc's start offset
                doc_starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
                tok_pos = np.arange(docs.size, dtype=np.int64) - np.repeat(
                    doc_starts, lens
                )
                pos_s = tok_pos[order]
            # run-length over (code, doc) = per-doc term frequency (a term's
            # repeats within one doc are adjacent after the sort; slc is a
            # function of (code, doc) so it can't split a run)
            same = (c_s[1:] == c_s[:-1]) & (d_s[1:] == d_s[:-1])
            p_starts = np.concatenate(([0], np.flatnonzero(~same) + 1))
            tf = np.diff(np.concatenate((p_starts, [c_s.size]))).astype("int32")
            pc, ps = c_s[p_starts], s_s[p_starts]
            pd_docs, pd_dls = d_s[p_starts], l_s[p_starts]
            change = (pc[1:] != pc[:-1]) | (ps[1:] != ps[:-1])
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            ends = np.concatenate((starts[1:], [pc.size]))
            out = {
                "term": uniq[pc[starts]],
                "slice_id": ps[starts].astype("int32"),
                "docs": [pd_docs[s:e] for s, e in zip(starts, ends)],
                "tfs": [tf[s:e] for s, e in zip(starts, ends)],
                "dls": [pd_dls[s:e].astype("int32") for s, e in zip(starts, ends)],
            }
            if positions:
                # a group's positions are one CONTIGUOUS span of the sorted
                # token stream (postings in a group are adjacent, and each
                # posting's occurrences are adjacent within its (code, doc)
                # run), so group poss = pos_s[token-start of first posting :
                # token-start past last posting] — pure slicing, no gather
                tok_bounds = np.concatenate((p_starts, [c_s.size]))
                out["poss"] = [
                    pos_s[tok_bounds[s] : tok_bounds[e]].astype("int32")
                    for s, e in zip(starts, ends)
                ]
            yield pd.DataFrame(out)

    return fused


def sampled_heavy_fanout(
    corpus: DataFrame,
    id_col: str,
    n_docs: int,
    heavy_df_fraction: float = HEAVY_DF_FRACTION,
    fanout: int = HEAVY_SALT_FANOUT,
    df_multiplier: int = 1,
) -> dict:
    """Heavy-hitter terms → salt fan-out, from a deterministic hash-mod
    sample (pmod(xxhash64(doc_id), k) == 0, k = n_docs // HEAVY_SAMPLE_TARGET).

    Detection needs only approximate df (it steers slicing, never results),
    so sampling replaces the full explode→groupBy dictionary pass the old
    build ran before it could salt. Distinct terms come from the Arrow
    tokenizer UDF, NOT tokens_expr: the JVM split+filter chain measured
    7-25× slower than the pandas kernel on this corpus (75s vs 10s for a
    2M-doc count at 2 cores) — split materializes a per-row object array
    that defeats codegen. Deterministic across runs AND parallelism levels
    — rebuilds slice identically. k=1 (small corpora) = exact pre-pass.

    `df_multiplier` supports callers whose corpus is a known replication of
    this table (bench amplification): df_est and the threshold both scale,
    so detection runs on the small base instead of re-scanning the blow-up.

    Scale note: row-hash sampling still READS the full content column (no
    format can prune by hash), so at 100 TB this pre-pass is one extra
    column scan. The production path is to pass `heavy_fanout` into
    write_index from vocabulary stats maintained at ingest time (the corpus
    writer sees every document once anyway); this pre-pass is the
    self-contained fallback that needs no side infrastructure."""
    from ..config import HEAVY_SAMPLE_TARGET
    from ..functions.tokenize import tokens_udf

    n_table = max(1, n_docs // max(1, df_multiplier))
    k = max(1, n_table // HEAVY_SAMPLE_TARGET)
    sample = corpus
    if k > 1:
        sample = corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(k)) == 0)
    threshold = max(1, int(heavy_df_fraction * n_docs))
    rows = (
        sample.select(
            F.explode(F.array_distinct(tokens_udf(F.col("content")))).alias("term")
        )
        .groupBy("term")
        .agg((F.count(F.lit(1)) * k * df_multiplier).alias("df_est"))
        .filter(F.col("df_est") > threshold)
        .select(
            "term",
            F.least(
                F.lit(MAX_SALT_FANOUT),
                F.greatest(
                    F.lit(fanout), F.ceil(F.col("df_est") / F.lit(SLICE_TARGET_POSTINGS))
                ),
            ).cast("int").alias("fanout_t"),
        )
        .collect()
    )
    return {r["term"]: int(r["fanout_t"]) for r in rows}


_COMBINE_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("slice_id", T.IntegerType()),
        T.StructField("docs", T.ArrayType(T.LongType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("dls", T.ArrayType(T.IntegerType())),
    ]
)

# positions variant: poss = flat per-group concatenation of each posting's
# ascending token positions (sum(tfs) elements)
_COMBINE_SCHEMA_POS = T.StructType(
    _COMBINE_SCHEMA.fields + [T.StructField("poss", T.ArrayType(T.IntegerType()))]
)


_MERGE_TYPE = T.StructType(
    [
        T.StructField("df_slice", T.LongType()),
        T.StructField("cf_slice", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        _ENC_TYPE["block_max"],
        T.StructField("kth_tfnorm", T.DoubleType()),
    ]
)


def _make_merge_udf(
    n_partitions: int,
    avgdl: float | None = None,
    impact_k: int | None = None,
    k1: float | None = None,
    b: float | None = None,
    positions: bool = False,
):
    """Batched reduce: each input ROW is one (term, slice) group carrying
    the list of partial arrays collected from map tasks; merge+sort+encode
    per row, one output batch per Arrow batch (≈512 groups) — no per-group
    DataFrame construction overhead. JVM agg state is lists of primitive
    ARRAYS (UnsafeArrayData), not per-posting objects.

    With `avgdl` set, each slice also records IMPACT METADATA: the
    impact_k-th largest tf-normalized score within the slice (the
    Lucene/block-max-WAND "max impact" idea, shifted to build time). The
    query executor derives its pruning threshold θ from these values with
    ZERO extra jobs — per-slice k-th ≤ global k-th ≤ k-th best total score,
    so θ stays a conservative lower bound (see bm25_segments θ proof).
    avgdl=None (legacy/delta paths) → null, executor falls back to the
    job-based θ pass."""
    from ..config import BM25_B, BM25_K1, DEFAULT_TOP_K

    kk = impact_k or DEFAULT_TOP_K
    k1v = BM25_K1 if k1 is None else k1
    bv = BM25_B if b is None else b

    def _merge_group(docs, tfs, dls, poss=None):
        """One (term, slice) group: k-way concat + doc-order sort (+ aligned
        positions segment-gather) → (d, t, l, p)."""
        d = np.concatenate([np.asarray(x, dtype=np.int64) for x in docs])
        t = np.concatenate([np.asarray(x, dtype=np.int64) for x in tfs])
        l = np.concatenate([np.asarray(x, dtype=np.int64) for x in dls])
        p = (
            np.concatenate([np.asarray(x, dtype=np.int64) for x in poss])
            if poss is not None
            else None
        )
        if d.size > 1 and not (np.diff(d) > 0).all():
            order = np.argsort(d, kind="stable")
            if p is not None:
                # gather each posting's positions segment to its new slot —
                # vectorized (np.repeat offsets + arange), no per-posting loop
                old_starts = np.concatenate(([0], np.cumsum(t)))[:-1]
                seg_lens = t[order]
                new_off = np.concatenate(([0], np.cumsum(seg_lens)))
                idx = np.repeat(old_starts[order] - new_off[:-1], seg_lens) + np.arange(
                    p.size, dtype=np.int64
                )
                p = p[idx]
            d, t, l = d[order], t[order], l[order]
        return d, t, l, p

    def _encode(d, t, l, p):
        if p is None:
            return encode_postings(d, t, l)
        from .positions import encode_postings_with_positions_flat

        return encode_postings_with_positions_flat(d, t, l, p)

    def fn_base(docs_ll, tfs_ll, dls_ll, poss_ll=None) -> pd.DataFrame:
        out = {"df_slice": [], "cf_slice": [], "blob": [], "block_max": [], "kth_tfnorm": []}
        for i, (docs, tfs, dls) in enumerate(zip(docs_ll, tfs_ll, dls_ll)):
            d, t, l, p = _merge_group(
                docs, tfs, dls, poss_ll.iloc[i] if poss_ll is not None else None
            )
            out["df_slice"].append(int(d.size))
            out["cf_slice"].append(int(t.sum()))
            out["blob"].append(_encode(d, t, l, p))
            out["block_max"].append(block_max(d, t, l, BLOCK_SIZE))
            if avgdl is not None and d.size >= kk:
                tf = t.astype(np.float64)
                sc = (tf * (k1v + 1.0)) / (
                    tf + k1v * (1.0 - bv + bv * l.astype(np.float64) / avgdl)
                )
                out["kth_tfnorm"].append(float(np.partition(sc, sc.size - kk)[sc.size - kk]))
            else:
                out["kth_tfnorm"].append(None)
        return pd.DataFrame(out)

    if positions:
        def fn_pos(docs_ll: pd.Series, tfs_ll: pd.Series, dls_ll: pd.Series,
                   poss_ll: pd.Series) -> pd.DataFrame:
            return fn_base(docs_ll, tfs_ll, dls_ll, poss_ll)

        return F.pandas_udf(fn_pos, returnType=_MERGE_TYPE)

    def fn(docs_ll: pd.Series, tfs_ll: pd.Series, dls_ll: pd.Series) -> pd.DataFrame:
        return fn_base(docs_ll, tfs_ll, dls_ll)

    return F.pandas_udf(fn, returnType=_MERGE_TYPE)


def build_slices_combine(
    enriched: DataFrame,
    term_dict: DataFrame,
    n_docs: int,
    max_doc_id: int,
    heavy_df_fraction: float = HEAVY_DF_FRACTION,
    fanout: int = HEAVY_SALT_FANOUT,
    n_partitions: int = INDEX_PARTITIONS,
) -> DataFrame:
    """Two-phase slice build from doc-major `enriched` rows
    (doc_id, dl, terms[], tfs[]): map-side combine → array shuffle →
    per-(term, slice) merge+encode."""
    threshold = max(1, int(heavy_df_fraction * n_docs))
    heavy_rows = (
        term_dict.filter(F.col("df") > threshold)
        .select(
            "term",
            F.least(
                F.lit(MAX_SALT_FANOUT),
                F.greatest(F.lit(fanout), F.ceil(F.col("df") / F.lit(SLICE_TARGET_POSTINGS))),
            ).cast("int").alias("fanout_t"),
        )
        .collect()
    )
    heavy_fanout = {r["term"]: int(r["fanout_t"]) for r in heavy_rows}
    partial = enriched.select("doc_id", "dl", "terms", "tfs").mapInPandas(
        _make_map_combine(heavy_fanout, max_doc_id), schema=_COMBINE_SCHEMA
    )
    grouped = partial.groupBy("term", "slice_id").agg(
        F.collect_list("docs").alias("docs_ll"),
        F.collect_list("tfs").alias("tfs_ll"),
        F.collect_list("dls").alias("dls_ll"),
    )
    enc = _make_merge_udf(n_partitions)(
        F.col("docs_ll"), F.col("tfs_ll"), F.col("dls_ll")
    )
    return grouped.select(
        "term",
        "slice_id",
        enc["df_slice"].alias("df_slice"),
        enc["cf_slice"].alias("cf_slice"),
        enc["blob"].alias("blob"),
        enc["block_max"].alias("block_max"),
        enc["kth_tfnorm"].alias("kth_tfnorm"),
        F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int").alias("partition_id"),
    )


def build_slices(
    postings_dl: DataFrame,
    term_dict: DataFrame,
    n_docs: int,
    max_doc_id: int,
    heavy_df_fraction: float = HEAVY_DF_FRACTION,
    fanout: int = HEAVY_SALT_FANOUT,
    n_partitions: int = INDEX_PARTITIONS,
) -> DataFrame:
    """Salted slice build → (term, slice_id, df_slice, cf_slice, blob, block_max, partition_id)."""
    threshold = max(1, int(heavy_df_fraction * n_docs))
    # per-term salt factor scales with df (north_star): floor `fanout` for
    # any heavy term, growing as df/SLICE_TARGET_POSTINGS so no slice group
    # exceeds ~64k postings regardless of corpus size
    heavy = term_dict.filter(F.col("df") > threshold).select(
        "term",
        F.least(
            F.lit(MAX_SALT_FANOUT),
            F.greatest(
                F.lit(fanout),
                F.ceil(F.col("df") / F.lit(SLICE_TARGET_POSTINGS)),
            ),
        ).cast("int").alias("fanout_t"),
    )
    salted = (
        postings_dl.join(F.broadcast(heavy), "term", "left")
        .withColumn(
            # doc_id RANGE slice via double math (monotone ⇒ ranges disjoint;
            # int64 multiply would overflow for hash-derived doc_ids).
            # Engine invariant: doc_id ∈ [0, 2^62).
            "slice_id",
            F.when(
                F.col("fanout_t").isNotNull(),
                F.least(
                    F.col("fanout_t") - 1,
                    F.floor(
                        F.col("doc_id").cast("double")
                        / F.lit(float(max_doc_id + 1))
                        * F.col("fanout_t")
                    ).cast("int"),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("fanout_t")
    )
    impl = os.environ.get("SPARK_GRAFT_SLICE_IMPL", "agg")
    if impl == "sort":
        # shuffle + EXTERNAL SORT + streaming encode: Tungsten's spillable
        # sort handles arbitrarily large partitions and the Arrow encoder
        # streams group-by-group in Python worker memory — no JVM buffer
        # proportional to group size anywhere. Costs a string-keyed sort +
        # per-posting Arrow transfer; kept as the fallback for corpora
        # whose largest groups would not fit an agg buffer.
        # numeric leading sort key: UnsafeRow radix-prefix on the hash long
        # beats string comparisons; ties (hash collisions) break on term.
        # partition_id is recomputed per GROUP in Python via the
        # Spark-identical XXH64 twin — 4 fewer bytes per POSTING in Arrow.
        spread = (
            salted.withColumn("thash", F.xxhash64("term"))
            .repartition("term", "slice_id")
            .sortWithinPartitions("thash", "term", "slice_id", "doc_id")
            .drop("thash")
        )
        return spread.mapInPandas(_make_encode_stream(n_partitions), schema=_SLICE_SCHEMA)

    # default: JVM hash-agg collects each (term, slice) group — groups are
    # bounded (≤ SLICE_TARGET_POSTINGS·2) by the df-scaled salt, so agg
    # state stays small; struct fields are extracted JVM-side and the
    # encode UDF receives primitive arrays per group.
    slices = salted.groupBy("term", "slice_id").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("plist"),
        F.count(F.lit(1)).alias("df_slice"),
        F.sum("tf").alias("cf_slice"),
    )
    enc = _encode_udf(F.col("plist.doc_id"), F.col("plist.tf"), F.col("plist.dl"))
    return slices.select(
        "term",
        "slice_id",
        "df_slice",
        "cf_slice",
        enc["blob"].alias("blob"),
        enc["block_max"].alias("block_max"),
        F.lit(None).cast("double").alias("kth_tfnorm"),
        F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int").alias("partition_id"),
    )


def build_slices_fused(
    corpus: DataFrame,
    heavy_fanout: dict,
    max_doc_id: int,
    avgdl: float | None,
    n_partitions: int = INDEX_PARTITIONS,
    id_col: str = "doc_id",
    positions: bool = False,
) -> DataFrame:
    """Slice rows straight from raw (doc_id, content) via the fused
    tokenize+combine kernel — the ONE slice-build path shared by
    write_index and streaming ingest, so format-2 (positions) delta blobs
    ride the identical salting + array-shuffle + merge machinery as a
    batch build. Returns (term, slice_id, df_slice, cf_slice, blob,
    block_max, kth_tfnorm, partition_id) for ALL partitions; callers
    filter/shift as needed."""
    partial = corpus.select(F.col(id_col), "content").mapInPandas(
        _make_fused_combine(heavy_fanout, max_doc_id, id_col, positions),
        schema=_COMBINE_SCHEMA_POS if positions else _COMBINE_SCHEMA,
    )
    agg_cols = [
        F.collect_list("docs").alias("docs_ll"),
        F.collect_list("tfs").alias("tfs_ll"),
        F.collect_list("dls").alias("dls_ll"),
    ]
    if positions:
        agg_cols.append(F.collect_list("poss").alias("poss_ll"))
    grouped = partial.groupBy("term", "slice_id").agg(*agg_cols)
    merge_cols = [F.col("docs_ll"), F.col("tfs_ll"), F.col("dls_ll")]
    if positions:
        merge_cols.append(F.col("poss_ll"))
    enc = _make_merge_udf(n_partitions, avgdl=avgdl, positions=positions)(*merge_cols)
    return grouped.select(
        "term",
        "slice_id",
        enc["df_slice"].alias("df_slice"),
        enc["cf_slice"].alias("cf_slice"),
        enc["blob"].alias("blob"),
        enc["block_max"].alias("block_max"),
        enc["kth_tfnorm"].alias("kth_tfnorm"),
        F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int").alias("partition_id"),
    )


def collection_stats_row(doc_meta: DataFrame) -> dict:
    r = doc_meta.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("doc_len").alias("total_terms"),
    ).collect()[0]
    return {
        "n_docs": int(r["n_docs"]),
        "avgdl": float(r["avgdl"]),
        "max_doc_id": int(r["max_doc_id"]),
        "total_terms": int(r["total_terms"]),
    }


# ---------------------------------------------------------------------------
# persistent index with per-partition catalog + resume
# ---------------------------------------------------------------------------

def _catalog_path(index_dir: str) -> str:
    return os.path.join(index_dir, "catalog")


def committed_partitions(spark: SparkSession, index_dir: str) -> set[int]:
    path = _catalog_path(index_dir)
    try:
        cat = spark.read.parquet(path)
    except Exception:
        return set()
    return {r["partition_id"] for r in cat.select("partition_id").distinct().collect()}


def _clean_uncommitted(index_dir: str, done: set[int]) -> list[str]:
    """Remove segments/ and terms/ partition directories whose partition_id
    is NOT in the catalog. The build appends slice rows in a job that
    commits BEFORE catalog/ is written; a crash in that window leaves data
    for partitions the catalog doesn't know about, and a blind resume would
    re-append them — double-counted postings and inflated df/cf. The
    catalog is the single source of commit truth, so anything outside it is
    garbage by definition — EXCEPT streaming-delta files (named
    ingest-b{batch}-*.parquet by streaming/ingest.py), which commit through
    stats.json's last_batch_id rather than the catalog and must survive a
    base-build resume. (Posix/HDFS form; an Iceberg store gets this from
    snapshot atomicity instead.)"""
    import re

    removed: list[str] = []
    for sub in ("segments", "terms"):
        base = os.path.join(index_dir, sub)
        if not os.path.isdir(base):
            continue
        for entry in os.listdir(base):
            m = re.fullmatch(r"partition_id=(\d+)", entry)
            if not (m and int(m.group(1)) not in done):
                continue
            pdir = os.path.join(base, entry)
            kept = 0
            for fn in os.listdir(pdir):
                # ingest deltas commit via stats.json, tiered-merge units
                # via the tiered.inprogress protocol — not the catalog
                if fn.startswith(("ingest-b", "tiered-t")):
                    kept += 1
                else:
                    os.remove(os.path.join(pdir, fn))
                    removed.append(f"{sub}/{entry}/{fn}")
            if not kept:
                os.rmdir(pdir)
    return removed


def write_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    n_partitions: int = INDEX_PARTITIONS,
    only_partitions: set[int] | None = None,
    epoch: int = 0,
    heavy_fanout: dict | None = None,
    positions: bool = False,
) -> dict:
    """Build (or resume) the segment index at index_dir.

    `heavy_fanout` ({term: salt_fanout}) injects precomputed heavy-hitter
    stats (e.g. vocabulary counters maintained at corpus-ingest time — the
    scalable source at 100 TB, where the fallback sample pre-pass would
    cost a second content-column scan). None → sampled_heavy_fanout.

    `positions=True` writes posting_format=2 blobs (positions.py layout:
    the standard blob + per-occurrence token positions) through the SAME
    fused kernel, df-scaled salting, array shuffle, merge, catalog and
    resume machinery — one store then serves BM25, phrase and NEAR
    queries (phrase.py probes it partition-pruned). A format-1 reader
    still decodes these blobs (trailing positions bytes are ignored by
    count-bounded section reads), so BM25 executors work unchanged on a
    positions index.

    Layout:
      index_dir/terms/      term dictionary (partitioned by partition_id)
      index_dir/segments/   compressed slices (partitioned by partition_id)
      index_dir/doc_meta/   doc_id, doc_len, sha256 (+repo/path/lang)
      index_dir/stats.json  n_docs, avgdl, max_doc_id
      index_dir/catalog/    per-partition lineage + counters (append-only)

    Resume: partitions already in catalog/ are skipped; `only_partitions`
    restricts an epoch (used by tests to simulate a mid-build crash).

    Default topology ("fused", SPARK_GRAFT_SLICE_IMPL to override):

      pass A  corpus → (sha2, count-only token UDF) → doc_meta + stats
              [observe() rides the write job — no second scan; no token
               STRINGS are ever materialized in this pass]
      pass B  sampled heavy-hitter pre-pass (columnar, ~5% of a tokenize)
              → fused tokenize+combine mapInPandas → array shuffle →
              per-(term, slice) merge+encode → segments/
      post    terms/ + catalog/ derived from the WRITTEN slice rows
              (exact df/cf = sum over slices; tiny post-encode data)

    vs the previous topology this removes: the multi-GB persist of per-doc
    token arrays (and its Arrow round-trip into the combine), the full
    explode→groupBy dictionary shuffle, and one full corpus re-scan — the
    three pieces profiling showed don't scale with cores.
    """
    impl = os.environ.get("SPARK_GRAFT_SLICE_IMPL", "fused")
    if impl != "fused":
        if positions:
            raise ValueError("positions=True requires the fused build path")
        return _write_index_legacy(
            spark, corpus, index_dir, id_col, n_partitions, only_partitions, epoch, impl
        )

    done = committed_partitions(spark, index_dir)
    all_parts = set(range(n_partitions))
    todo = sorted((all_parts - done) & (only_partitions or all_parts))
    if done:  # resuming: scrub data from the append-before-commit window
        _clean_uncommitted(index_dir, done)
    t0 = time.perf_counter()

    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(2 * par)

    extra = [c for c in ("repo", "path", "lang") if c in corpus.columns]
    if not done:  # first epoch writes doc_meta + stats
        from pyspark.sql import Observation

        from ..functions.tokenize import token_count_udf

        obs = Observation("collection_stats")
        meta = corpus.select(
            F.col(id_col).alias("doc_id"),
            token_count_udf(F.col("content")).alias("doc_len"),
            *extra,
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_len").alias("total_terms"),
        )
        meta.write.mode("overwrite").parquet(os.path.join(index_dir, "doc_meta"))
        g = obs.get
        from ..config import BM25_B, BM25_K1, DEFAULT_TOP_K

        stats = {
            "n_docs": int(g["n_docs"]),
            "avgdl": float(g["avgdl"]),
            "max_doc_id": int(g["max_doc_id"]),
            "total_terms": int(g["total_terms"]),
            "n_partitions": n_partitions,
            "block_size": BLOCK_SIZE,
            # blob layout version (operators/positions.py): 1 = standard
            # [df][deltas][tfs][doc_lens]; 2 carries the trailing positions
            # section — readers can tell without sniffing blobs
            "posting_format": 2 if positions else 1,
            # impact-metadata stamp: per-slice kth_tfnorm values below are
            # valid pruning bounds ONLY under these exact params; a
            # streaming delta changes avgdl, which auto-invalidates the
            # stamp (executor compares and falls back to the θ job)
            "impact": {
                "k": DEFAULT_TOP_K,
                "k1": BM25_K1,
                "b": BM25_B,
                "avgdl": float(g["avgdl"]),
            },
        }
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
    else:
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        want = 2 if positions else 1
        if int(stats.get("posting_format", 1)) != want:
            raise ValueError(
                f"resume posting_format mismatch: index has "
                f"{stats.get('posting_format')}, build requested {want}"
            )
    phases = {"meta_sec": round(time.perf_counter() - t0, 2)}

    if todo:
        tp = time.perf_counter()
        if heavy_fanout is None:
            heavy_fanout = sampled_heavy_fanout(
                corpus.select(F.col(id_col), "content"), id_col, stats["n_docs"]
            )
        phases["sample_sec"] = round(time.perf_counter() - tp, 2)
        tp = time.perf_counter()
        slices = build_slices_fused(
            corpus,
            heavy_fanout,
            stats["max_doc_id"],
            avgdl=float(stats["avgdl"]),
            n_partitions=n_partitions,
            id_col=id_col,
            positions=positions,
        ).filter(F.col("partition_id").isin(todo))
        slices.repartition(len(todo), "partition_id").write.mode("append").partitionBy(
            "partition_id"
        ).parquet(os.path.join(index_dir, "segments"))
        phases["slices_sec"] = round(time.perf_counter() - tp, 2)
        tp = time.perf_counter()

        # dictionary + catalog derive from the WRITTEN slices in one read:
        # df/cf are exact sums over slices (test_postings_invariants), and
        # reading back committed bytes makes the counters ground truth
        seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("partition_id").isin(todo)
        )
        seg.groupBy("term", "partition_id").agg(
            F.sum("df_slice").alias("df"),
            F.sum("cf_slice").alias("cf"),
            # impact metadata: max over slices is the tightest of the
            # per-slice k-th lower bounds — still ≤ the term's global k-th
            F.max("kth_tfnorm").alias("kth_tfnorm"),
        ).select("term", "df", "cf", "kth_tfnorm", "partition_id").repartition(
            len(todo), "partition_id"
        ).write.mode("append").partitionBy("partition_id").parquet(
            os.path.join(index_dir, "terms")
        )
        cat = seg.groupBy("partition_id").agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("df_slice").alias("n_postings"),
            F.sum(F.length("blob")).alias("bytes"),
        ).select(
            F.concat(F.lit("seg-"), F.col("partition_id").cast("string")).alias("segment_id"),
            "partition_id",
            "n_terms",
            "n_postings",
            "bytes",
            F.lit(epoch).cast("int").alias("checkpoint_epoch"),
            F.lit(f"build@epoch={epoch};src=corpus").alias("lineage"),
        )
        cat.write.mode("append").parquet(_catalog_path(index_dir))
        phases["dict_cat_sec"] = round(time.perf_counter() - tp, 2)

    return {
        "built_partitions": todo,
        "skipped_partitions": sorted(done),
        "elapsed_sec": time.perf_counter() - t0,
        "phases": phases,
        **stats,
    }


def _write_index_legacy(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    n_partitions: int = INDEX_PARTITIONS,
    only_partitions: set[int] | None = None,
    epoch: int = 0,
    impl: str = "combine",
) -> dict:
    """Pre-fusion topology (impl = combine | agg | sort), kept for A/B
    profiling and as the fallback for corpora whose vocabulary would make
    the fused kernel's per-batch factorize state too large."""

    done = committed_partitions(spark, index_dir)
    all_parts = set(range(n_partitions))
    todo = sorted((all_parts - done) & (only_partitions or all_parts))
    if done:  # resuming: scrub data from the append-before-commit window
        _clean_uncommitted(index_dir, done)
    t0 = time.perf_counter()

    # ONE tokenize+termfreq pass feeds doc_meta, dictionary and slices.
    # (At 100 TB, persisting the per-doc term-frequency pairs trades
    # memory/disk for not running the Arrow UDF three times.)
    from pyspark.storagelevel import StorageLevel
    from ..functions.tokenize import termfreq_udf

    # guard against under-partitioned inputs (a single small parquet file
    # would otherwise serialize the whole tokenize stage on 1-2 tasks)
    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(2 * par)

    extra = [c for c in ("repo", "path", "lang") if c in corpus.columns]
    enriched = (
        corpus.withColumn("_tf", termfreq_udf(F.col("content")))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .select(
            F.col(id_col).alias("doc_id"),
            *extra,
            "content_sha256",
            F.col("_tf.dl").alias("dl"),
            F.col("_tf.terms").alias("terms"),
            F.col("_tf.tfs").alias("tfs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    pdl = tdict = None
    if todo:
        pdl = (
            enriched.select(
                "doc_id", "dl", F.explode(F.arrays_zip("terms", "tfs")).alias("p")
            )
            .select("doc_id", "dl", F.col("p.terms").alias("term"), F.col("p.tfs").alias("tf"))
        )
        if impl != "combine":
            # the row-explode slice impls scan pdl a second time; persisted
            # so the slice build's agg pressure can't force re-tokenization
            pdl = pdl.persist(StorageLevel.MEMORY_AND_DISK)
        tdict = term_dictionary(pdl, n_partitions).persist()

    if not done:  # first epoch also writes doc_meta + stats
        import threading

        from pyspark.sql import Observation

        obs = Observation("collection_stats")
        meta = enriched.select(
            "doc_id", F.col("dl").alias("doc_len"), *extra, "content_sha256"
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_len").alias("total_terms"),
        )

        # overlap two independent jobs: doc_meta write (+observed stats)
        # and the dictionary write — both consume the persisted `enriched`;
        # the slice build needs BOTH (stats for salting, tdict for heavy
        # detection), so this is the only overlappable pair
        def _write_terms():
            if todo:
                # repartition onto partition_id before partitionBy: each
                # write task then emits one directory (32 clean files)
                # instead of shuffle_partitions × |todo| fragments
                tdict.filter(F.col("partition_id").isin(todo)).repartition(
                    len(todo), "partition_id"
                ).write.mode("append").partitionBy("partition_id").parquet(
                    os.path.join(index_dir, "terms")
                )

        th = threading.Thread(target=_write_terms)
        th.start()
        # observe(): stats ride the write job — no second scan
        meta.write.mode("overwrite").parquet(os.path.join(index_dir, "doc_meta"))
        th.join()
        g = obs.get
        stats = {
            "n_docs": int(g["n_docs"]),
            "avgdl": float(g["avgdl"]),
            "max_doc_id": int(g["max_doc_id"]),
            "total_terms": int(g["total_terms"]),
            # the index self-describes its layout: query executors read
            # n_partitions from here, so an index built under a different
            # INDEX_PARTITIONS default stays readable forever
            "n_partitions": n_partitions,
            "block_size": BLOCK_SIZE,
            "posting_format": 1,
        }
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
    else:
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        if todo:
            tdict.filter(F.col("partition_id").isin(todo)).repartition(
                len(todo), "partition_id"
            ).write.mode("append").partitionBy("partition_id").parquet(
                os.path.join(index_dir, "terms")
            )

    if todo:
        part_filter = F.col("partition_id").isin(todo)
        if impl == "combine":
            slices = build_slices_combine(
                enriched, tdict, stats["n_docs"], stats["max_doc_id"], n_partitions=n_partitions
            ).filter(part_filter)
        else:
            slices = build_slices(
                pdl, tdict, stats["n_docs"], stats["max_doc_id"], n_partitions=n_partitions
            ).filter(part_filter)
        # blobs are compact post-encode; one extra small shuffle buys a
        # clean one-file-per-storage-partition layout for query pruning
        slices.repartition(len(todo), "partition_id").write.mode("append").partitionBy(
            "partition_id"
        ).parquet(os.path.join(index_dir, "segments"))
        if impl != "combine":
            pdl.unpersist()
        tdict.unpersist()
        # per-partition counters from the committed data (ground truth)
        seg = spark.read.parquet(os.path.join(index_dir, "segments")).filter(
            F.col("partition_id").isin(todo)
        )
        cat = seg.groupBy("partition_id").agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("df_slice").alias("n_postings"),
            F.sum(F.length("blob")).alias("bytes"),
        ).select(
            F.concat(F.lit("seg-"), F.col("partition_id").cast("string")).alias("segment_id"),
            "partition_id",
            "n_terms",
            "n_postings",
            "bytes",
            F.lit(epoch).cast("int").alias("checkpoint_epoch"),
            F.lit(f"build@epoch={epoch};src=corpus").alias("lineage"),
        )
        cat.write.mode("append").parquet(_catalog_path(index_dir))
    enriched.unpersist()

    return {
        "built_partitions": todo,
        "skipped_partitions": sorted(done),
        "elapsed_sec": time.perf_counter() - t0,
        **stats,
    }


def compact_segments(
    spark: SparkSession,
    index_dir: str,
    tomb: "np.ndarray | None" = None,
    avgdl_override: float | None = None,
) -> DataFrame:
    """Two-phase merge demonstrator: fold each term's range slices into one
    blob (slice ranges are disjoint & ordered ⇒ decode-concat-encode, no
    re-sort). Returns the compacted slices DataFrame (one row per term).

    `tomb` (sorted deleted doc_ids, from operators/deletes.py) PURGES
    tombstoned postings during the merge — Lucene's reclaim-deletes-on-
    merge. df_slice/cf_slice/block_max/kth_tfnorm are then recomputed over
    live postings only, and `avgdl_override` (the post-purge collection
    avgdl, computed by compact_index BEFORE the merge) makes the refreshed
    impact metadata valid for the post-purge stats stamp. Terms whose
    postings are all deleted emit no row — they leave the store entirely."""
    seg = spark.read.parquet(os.path.join(index_dir, "segments"))
    has_impact = "kth_tfnorm" in seg.columns
    # recompute impact metadata over the WHOLE merged list (now exact, not
    # per-slice) when the index carries a still-valid impact stamp; a
    # posting_format=2 store decodes + re-encodes WITH its positions section
    imp = None
    positions = False
    try:
        with open(os.path.join(index_dir, "stats.json")) as f:
            st = json.load(f)
        if st.get("impact") and float(st["avgdl"]) == float(st["impact"]["avgdl"]):
            imp = st["impact"]
        positions = int(st.get("posting_format", 1)) == 2
    except OSError:
        pass
    if imp is not None and avgdl_override is not None:
        imp = {**imp, "avgdl": float(avgdl_override)}
    if tomb is not None and tomb.size == 0:
        tomb = None

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from .compress import decode_postings
        from .deletes import live_mask
        from .positions import (
            decode_postings_with_positions_flat,
            encode_postings_with_positions_flat,
        )

        grp = pdf.sort_values("slice_id")
        ds, ts, ls, ps = [], [], [], []
        for blob in grp["blob"]:
            if positions:
                d, t, l, p = decode_postings_with_positions_flat(bytes(blob))
                ps.append(p)
            else:
                d, t, l = decode_postings(bytes(blob))
            ds.append(d), ts.append(t), ls.append(l)
        d = np.concatenate(ds)
        t = np.concatenate(ts).astype(np.int64)
        l = np.concatenate(ls)
        p = np.concatenate(ps) if positions else None
        # base-build slices are range-disjoint in slice_id order, but
        # streaming-ingest deltas (ingest.py) may interleave doc ranges —
        # re-sort when needed so the merged blob stays strictly increasing
        if d.size > 1 and not (np.diff(d) > 0).all():
            order = np.argsort(d, kind="stable")
            if positions:
                old_starts = np.concatenate(([0], np.cumsum(t)))[:-1]
                seg_lens = t[order]
                new_off = np.concatenate(([0], np.cumsum(seg_lens)))
                idx = np.repeat(old_starts[order] - new_off[:-1], seg_lens) + np.arange(
                    p.size, dtype=np.int64
                )
                p = p[idx]
            d, t, l = d[order], t[order], l[order]
        if tomb is not None and d.size:
            # purge: drop tombstoned postings before re-encoding; the flat
            # positions buffer filters with np.repeat of the posting mask
            keep = live_mask(d, tomb)
            if not keep.all():
                if positions:
                    p = p[np.repeat(keep, t.astype(np.int64))]
                d, t, l = d[keep], t[keep], l[keep]
        if d.size == 0:  # fully-deleted term: no output row
            return pdf.iloc[0:0]
        kth = None
        if imp is not None and d.size >= int(imp["k"]):
            tf = t.astype(np.float64)
            k1v, bv, av, kk = float(imp["k1"]), float(imp["b"]), float(imp["avgdl"]), int(imp["k"])
            sc = (tf * (k1v + 1.0)) / (tf + k1v * (1.0 - bv + bv * l.astype(np.float64) / av))
            kth = float(np.partition(sc, sc.size - kk)[sc.size - kk])
        row = {
            "term": [grp["term"].iloc[0]],
            "slice_id": [0],
            "df_slice": [int(d.size)],
            "cf_slice": [int(t.sum())],
            "blob": [
                encode_postings_with_positions_flat(d, t, l, p)
                if positions
                else encode_postings(d, t, l)
            ],
            "block_max": [block_max(d, t, l)],
            "partition_id": [int(grp["partition_id"].iloc[0])],
        }
        if has_impact:
            row["kth_tfnorm"] = [kth]
        return pd.DataFrame(row)

    # groupBy(term).applyInPandas guarantees all of a term's slices arrive in
    # one group regardless of Arrow batch splits (unlike mapInPandas)
    return seg.groupBy("term").applyInPandas(merge, schema=seg.schema)


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Full compaction maintenance op (the CLI `compact` verb): fold every
    term's slices into one blob, PURGE tombstoned postings (deletes.py),
    atomically swap segments/, and refresh every derived artifact the purge
    invalidates — catalog counters, the terms/ dictionary (df/cf/impact
    change when postings vanish), doc_meta/, and stats.json (n_docs, avgdl,
    total_terms, max_doc_id, impact stamp). After a purge the store answers
    queries bit-identically to an index freshly built on the live corpus
    (tested) — Lucene's reclaim-deletes-on-merge contract.

    Driver state is ONE sorted int64 array of deleted ids (Lucene holds the
    same information as a liveDocs bitset per segment); everything else is
    distributed. Swap discipline: each rewritten directory (segments/,
    catalog/, terms/, doc_meta/) goes to `<name>.compact.tmp` then renames
    over — a crash mid-swap leaves either the old or new artifact fully
    intact under one of the two names.

    Crash window: a purge commit touches five artifacts in sequence
    (segments → catalog → terms → doc_meta → stats.json); a crash between
    any two leaves mixed pre/post-purge statistics. The commit is made
    DETECTABLE and SELF-HEALING by (a) a `compact.inprogress` marker
    written before the first mutation and removed only after the last,
    and (b) keeping tombstones until the very end — every individual step
    is idempotent under re-run with tombstones present (purged postings
    are already absent, anti-joins are no-ops), so the recovery protocol
    is simply: marker present ⇒ re-run compact_index."""
    import shutil

    from .deletes import clear_tombstones, tombstone_state, tombstones_df

    tomb = tombstone_state(spark, index_dir)
    if tomb is not None and not isinstance(tomb, np.ndarray):
        # over-cap set: compaction is the offline op that RESOLVES this
        # state, so collecting once here (vs never on the query path) is
        # the intended cost; a bitmap (roaring) upgrade slots in here
        rows = tomb.collect()
        tomb = np.sort(
            np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
        )
    if tomb is not None and tomb.size == 0:
        tomb = None
    purge = tomb is not None

    def _swap(final: str, write_fn) -> None:
        tmp, old = final + ".compact.tmp", final + ".compact.old"
        write_fn(tmp)
        os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old)
        # Spark's shared FileStatusCache keeps the pre-swap listing for
        # this path for the life of the session — a later read would serve
        # the replaced files. refreshByPath is the documented invalidation
        # for in-place rewrites.
        spark.catalog.refreshByPath(final)

    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)

    new_stats = None
    if purge:
        # post-purge collection statistics BEFORE the merge so the merge
        # kernel recomputes impact metadata under the NEW avgdl (keeps the
        # zero-job θ fast path valid after compaction)
        live_meta = spark.read.parquet(os.path.join(index_dir, "doc_meta")).join(
            tombstones_df(spark, index_dir), "doc_id", "left_anti"
        )
        new_stats = collection_stats_row(live_meta)
        if new_stats["n_docs"] == 0:
            raise ValueError("compact_index: purge would delete every document")

    # commit marker: present ⇒ a compact/purge commit is (or was) in
    # flight; removed only after the LAST artifact lands. Recovery = re-run.
    marker = os.path.join(index_dir, "compact.inprogress")
    with open(marker, "w") as f:
        json.dump({"purge": purge, "n_tomb": 0 if tomb is None else int(tomb.size)}, f)

    compacted = compact_segments(
        spark,
        index_dir,
        tomb=tomb,
        avgdl_override=new_stats["avgdl"] if purge else None,
    )
    seg_final = os.path.join(index_dir, "segments")
    _swap(
        seg_final,
        lambda tmp: compacted.repartition("partition_id")
        .write.mode("overwrite")
        .partitionBy("partition_id")
        .parquet(tmp),
    )

    seg = spark.read.parquet(seg_final)
    cat = seg.groupBy("partition_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("df_slice").alias("n_postings"),
        F.sum(F.length("blob")).alias("bytes"),
    ).select(
        F.concat(F.lit("seg-"), F.col("partition_id").cast("string")).alias("segment_id"),
        "partition_id",
        "n_terms",
        "n_postings",
        "bytes",
        F.lit(0).cast("int").alias("checkpoint_epoch"),
        F.lit("compact" + (";purge" if purge else "")).alias("lineage"),
    )
    # catalog rides the same stage-then-rename discipline as segments/ —
    # a plain overwrite would delete-then-write, leaving no catalog at all
    # on a mid-write crash
    cat_rows = cat.persist()
    cat_rows.count()
    _swap(
        _catalog_path(index_dir),
        lambda tmp: cat_rows.write.mode("overwrite").parquet(tmp),
    )

    n_purged = 0
    if purge:
        n_purged = int(tomb.size)
        # dictionary: df/cf/kth changed wherever postings were purged —
        # re-derive from the committed slices, same as the build does
        has_impact = "kth_tfnorm" in seg.columns
        aggs = [F.sum("df_slice").alias("df"), F.sum("cf_slice").alias("cf")]
        cols = ["term", "df", "cf", "partition_id"]
        if has_impact:
            aggs.append(F.max("kth_tfnorm").alias("kth_tfnorm"))
            cols = ["term", "df", "cf", "kth_tfnorm", "partition_id"]
        tdict = seg.groupBy("term", "partition_id").agg(*aggs).select(*cols)
        _swap(
            os.path.join(index_dir, "terms"),
            lambda tmp: tdict.repartition("partition_id")
            .write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(tmp),
        )
        delta = os.path.join(index_dir, "terms_delta")
        if os.path.isdir(delta):  # folded into terms/ by the rewrite above
            shutil.rmtree(delta)
        live_meta = spark.read.parquet(os.path.join(index_dir, "doc_meta")).join(
            tombstones_df(spark, index_dir), "doc_id", "left_anti"
        )
        _swap(
            os.path.join(index_dir, "doc_meta"),
            lambda tmp: live_meta.write.mode("overwrite").parquet(tmp),
        )
        stats.update(new_stats)
        if stats.get("impact"):
            stats["impact"]["avgdl"] = float(new_stats["avgdl"])
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        clear_tombstones(index_dir)

    counters = cat_rows.agg(
        F.sum("n_terms").alias("terms"),
        F.sum("n_postings").alias("postings"),
        F.sum("bytes").alias("bytes"),
    ).collect()[0]
    cat_rows.unpersist()
    os.remove(marker)  # commit complete — LAST mutation, see docstring
    return {
        "compacted": True,
        "purged_docs": n_purged,
        **{k: int(v) for k, v in counters.asDict().items()},
    }


# ---------------------------------------------------------------------------
# size-tiered slice merging (bounded-write-amplification maintenance)
# ---------------------------------------------------------------------------


def _segment_units(index_dir: str) -> dict[str, list[str]]:
    """Group segments/ data files into merge UNITS (the Lucene-segment
    analog): 'base' = the batch build's catalog-committed files,
    'b{N}' = one streaming-ingest epoch, 't{G}' = one prior tiered-merge
    output. Paths are relative to segments/ (partition dirs preserved)."""
    import re as _re

    units: dict[str, list[str]] = {}
    seg = os.path.join(index_dir, "segments")
    for root, _dirs, files in os.walk(seg):
        rel = os.path.relpath(root, seg)
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            m = _re.match(r"ingest-b(\d+)-", fn)
            t = _re.match(r"tiered-t(\d+)-", fn)
            key = f"b{m.group(1)}" if m else (f"t{t.group(1)}" if t else "base")
            units.setdefault(key, []).append(
                fn if rel == "." else os.path.join(rel, fn)
            )
    return units


def tiered_compact(
    spark: SparkSession,
    index_dir: str,
    tier_fanout: int = 4,
    min_unit_bytes: int = 1 << 20,
) -> dict:
    """Size-tiered slice merging — the bounded-write-amplification
    maintenance op between full compactions (Lucene TieredMergePolicy /
    LSM size-tiered compaction, at the granularity this store actually
    accumulates garbage: one delta UNIT per streaming-ingest epoch).

    compact_index rewrites the WHOLE store (O(store) bytes per cycle) —
    correct as the deep-maintenance/purge op, but ruinous as the per-epoch
    policy when ingest runs continuously. This op instead:

      * groups segments/ files into units (base build / ingest epoch /
        prior tiered output — _segment_units) and assigns each unit a size
        tier = floor(log2(bytes / min_unit_bytes));
      * merges ONLY tiers holding ≥ tier_fanout non-base units: their
        same-term slices decode-concat-encode into one slice (doc-order
        re-sort handles interleaved delta ranges; positions sections ride
        along in a posting_format=2 store), written as a new `tiered-t{G}`
        unit; the merged slice keeps the smallest constituent slice_id, so
        (term, slice_id) stays unique;
      * never touches the base unit, terms/terms_delta (df/cf totals are
        invariant under slice merging), the catalog (base-only by
        contract), doc_meta, or stats.json.

    Bounds: each posting is rewritten at most O(log(store/min_unit_bytes))
    times over its lifetime, a cycle rewrites only the merged tiers'
    bytes, and steady-state unit count is O(tier_fanout · #tiers). Query
    results are bit-identical before/after (readers union slice rows per
    term; tested under a repeated ingest→compact loop).

    Purge is intentionally NOT done here: a partial purge would desync
    df/cf/stats from the surviving postings — tombstone masking stays
    active at query time and compact_index remains the purge op.

    Crash safety: merged files stage under .tiered_staging, then a
    `tiered.inprogress` marker records the new unit's expected file names
    and the old files to delete; recovery (run at next call) rolls FORWARD
    when every new file landed (finish the deletes) and BACK otherwise
    (scrub the new unit) — either way the store is never double-counted.

    Impact metadata: merged slices carry kth_tfnorm=NULL (a delta-bearing
    store's impact stamp is already invalidated by the ingest avgdl drift;
    the executor's θ-job fallback covers it, and the next full
    compact_index re-stamps everything)."""
    import re as _re

    seg_dir = os.path.join(index_dir, "segments")
    marker = os.path.join(index_dir, "tiered.inprogress")
    # ---- recovery from a prior crash (roll forward or back; see docstring)
    if os.path.exists(marker):
        with open(marker) as f:
            st = json.load(f)
        new_done = all(
            os.path.exists(os.path.join(seg_dir, p)) for p in st["new_files"]
        )
        for p in (st["old_files"] if new_done else st["new_files"]):
            fp = os.path.join(seg_dir, p)
            if os.path.exists(fp):
                os.remove(fp)
        os.remove(marker)
        spark.catalog.refreshByPath(seg_dir)

    units = _segment_units(index_dir)
    sizes = {
        u: sum(os.path.getsize(os.path.join(seg_dir, p)) for p in ps)
        for u, ps in units.items()
    }
    tiers: dict[int, list[str]] = {}
    for u, sz in sizes.items():
        if u == "base":
            continue  # the giant segment; full compact_index folds it
        tier = max(0, int(np.log2(max(sz, 1) / min_unit_bytes))) if sz >= min_unit_bytes else 0
        tiers.setdefault(tier, []).append(u)
    merge_units = sorted(
        u for t, us in tiers.items() if len(us) >= tier_fanout for u in us
    )
    if not merge_units:
        return {"merged_units": [], "bytes_rewritten": 0,
                "n_units_before": len(units), "n_units_after": len(units)}

    gens = [
        int(m.group(1))
        for u in units
        for m in [_re.fullmatch(r"t(\d+)", u)]
        if m
    ]
    gen = (max(gens) + 1) if gens else 0
    old_files = sorted(p for u in merge_units for p in units[u])
    bytes_rewritten = sum(sizes[u] for u in merge_units)

    # ---- merge the selected units' slices per term (decode-once kernel)
    src = spark.read.option("basePath", seg_dir).parquet(
        *[os.path.join(seg_dir, p) for p in old_files]
    )
    has_impact = "kth_tfnorm" in src.columns
    positions = False
    with open(os.path.join(index_dir, "stats.json")) as f:
        positions = int(json.load(f).get("posting_format", 1)) == 2

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from .compress import decode_postings as _dec
        from .positions import (
            decode_postings_with_positions_flat,
            encode_postings_with_positions_flat,
        )

        grp = pdf.sort_values("slice_id")
        if len(grp) == 1:  # nothing to fold for this term in these units
            return grp
        ds, ts, ls, ps = [], [], [], []
        for blob in grp["blob"]:
            if positions:
                d, t, l, p = decode_postings_with_positions_flat(bytes(blob))
                ps.append(p)
            else:
                d, t, l = _dec(bytes(blob))
            ds.append(d), ts.append(t), ls.append(l)
        d = np.concatenate(ds)
        t = np.concatenate(ts).astype(np.int64)
        l = np.concatenate(ls)
        p = np.concatenate(ps) if positions else None
        if d.size > 1 and not (np.diff(d) > 0).all():
            order = np.argsort(d, kind="stable")
            if positions:
                old_starts = np.concatenate(([0], np.cumsum(t)))[:-1]
                seg_lens = t[order]
                new_off = np.concatenate(([0], np.cumsum(seg_lens)))
                idx = np.repeat(
                    old_starts[order] - new_off[:-1], seg_lens
                ) + np.arange(p.size, dtype=np.int64)
                p = p[idx]
            d, t, l = d[order], t[order], l[order]
        row = {
            "term": [grp["term"].iloc[0]],
            "slice_id": [int(grp["slice_id"].iloc[0])],  # min id survives
            "df_slice": [int(d.size)],
            "cf_slice": [int(t.sum())],
            "blob": [
                encode_postings_with_positions_flat(d, t, l, p)
                if positions
                else encode_postings(d, t, l)
            ],
            "block_max": [block_max(d, t, l)],
            "partition_id": [int(grp["partition_id"].iloc[0])],
        }
        if has_impact:
            row["kth_tfnorm"] = [None]
        return pd.DataFrame(row)[list(pdf.columns)]

    import shutil

    staging = os.path.join(index_dir, ".tiered_staging")
    shutil.rmtree(staging, ignore_errors=True)
    src.groupBy("term").applyInPandas(merge, schema=src.schema).write.mode(
        "overwrite"
    ).partitionBy("partition_id").parquet(staging)

    # ---- publish: move staged files in under the new unit's names, with a
    # marker-guarded delete of the merged inputs
    new_files: list[str] = []
    moves: list[tuple[str, str]] = []
    i = 0
    for root, _dirs, files in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            dest_rel = (
                f"tiered-t{gen}-{i}.parquet"
                if rel == "."
                else os.path.join(rel, f"tiered-t{gen}-{i}.parquet")
            )
            new_files.append(dest_rel)
            moves.append((os.path.join(root, fn), os.path.join(seg_dir, dest_rel)))
            i += 1
    with open(marker, "w") as f:
        json.dump({"gen": gen, "new_files": new_files, "old_files": old_files}, f)
    for src_p, dst_p in moves:
        os.makedirs(os.path.dirname(dst_p), exist_ok=True)
        os.rename(src_p, dst_p)
    for p in old_files:
        os.remove(os.path.join(seg_dir, p))
    os.remove(marker)
    shutil.rmtree(staging, ignore_errors=True)
    spark.catalog.refreshByPath(seg_dir)
    return {
        "merged_units": merge_units,
        "new_unit": f"t{gen}",
        "bytes_rewritten": int(bytes_rewritten),
        "n_units_before": len(units),
        "n_units_after": len(units) - len(merge_units) + 1,
    }
