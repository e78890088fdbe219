from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from contextinator_spark.operators.grep import (
    facets,
    grep_by_file,
    grep_lines,
    grep_with_context,
    line_range,
    lines_view,
    listing,
    symbol_filter,
)
from contextinator_spark.operators.similarity import knn_brute, knn_lsh


@pytest.fixture(scope="module")
def ided(spark, corpus):
    return corpus.withColumn("doc_id", F.pmod(F.xxhash64("repo", "path"), F.lit(2**61)))


# --- grep: mirrors the reference Rust test fixture (search.rs:95-117) -------

def test_grep_context_matches_reference_fixture(spark):
    content = "line 1\nTODO: fix this\nline 3\nline 4\nTODO: also this"
    df = spark.createDataFrame([(1, content)], "doc_id long, content string")
    rows = grep_with_context(df, "TODO", n_context=1).orderBy("line_no").collect()
    assert [(r["line_no"], r["line"]) for r in rows] == [
        (2, "TODO: fix this"),
        (5, "TODO: also this"),
    ]
    assert rows[0]["context_before"] == ["line 1"]
    assert rows[0]["context_after"] == ["line 3"]
    assert rows[1]["context_before"] == ["line 4"]
    assert rows[1]["context_after"] == []


def test_grep_whole_word_and_case(spark):
    df = spark.createDataFrame(
        [(1, "route out\nout\nabout")], "doc_id long, content string"
    )
    ww = grep_lines(df, "out", whole_word=True).collect()
    assert sorted(r["line_no"] for r in ww) == [1, 2]  # 'about' excluded
    ci = grep_lines(
        spark.createDataFrame([(1, "TODO\ntodo")], "doc_id long, content string"),
        "todo",
        case_insensitive=True,
    ).collect()
    assert len(ci) == 2


def test_grep_by_file_counts(spark, ided):
    out = grep_by_file(ided, "def ")
    assert out.count() > 0
    r = out.first()
    assert r["n_matches"] == len(r["matches"])


# --- line_range: mirrors line.rs:88-109 cases -------------------------------

def test_line_range_reference_cases(spark):
    content = "\n".join(f"L{i}" for i in range(1, 101))
    df = spark.createDataFrame([(1, content)], "doc_id long, content string")

    def run(s, e):
        r = line_range(df, s, e).collect()[0]
        return r["content"].split("\n"), r["total_lines"], r["lines_returned"]

    lines, total, n = run(1, 10)
    assert lines == [f"L{i}" for i in range(1, 11)] and total == 100 and n == 10
    lines, _, n = run(-10, -1)  # negative from EOF
    assert lines == [f"L{i}" for i in range(91, 101)] and n == 10
    lines, _, n = run(None, 50)
    assert lines[0] == "L1" and lines[-1] == "L50" and n == 50
    lines, _, n = run(95, 200)  # clamp end
    assert lines == [f"L{i}" for i in range(95, 101)] and n == 6


def test_lines_view_roundtrip(spark, ided):
    # reconstruction invariant: group lines back → original content
    lv = lines_view(ided.limit(50))
    rebuilt = lv.groupBy("doc_id").agg(
        F.concat_ws("\n", F.transform(F.sort_array(F.collect_list(F.struct("line_no", "line"))), lambda s: s["line"])).alias("content2")
    )
    orig = ided.limit(50).select("doc_id", "content")
    bad = orig.join(rebuilt, "doc_id").filter(F.col("content") != F.col("content2")).count()
    assert bad == 0


def test_symbol_filter_and_facets(spark, ided):
    out = symbol_filter(ided, contains="def ", equals={"lang": "python"})
    assert out.count() > 0
    assert out.filter(F.col("lang") != "python").count() == 0
    f = facets(out, ["lang", "repo"]).collect()[0]
    assert f["langs"] == ["python"]
    assert f["n_results"] == out.count()
    assert f["repos"] == sorted(f["repos"])


def test_listing_dirs_first(spark, ided):
    rows = listing(ided).collect()
    assert rows[0]["is_dir"]  # dirs first


# --- similarity --------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    df.count()
    return df


def test_knn_brute_self_is_top1(spark, emb):
    q = emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]
    top = knn_brute(emb, [float(x) for x in q], k=5).collect()
    assert top[0]["vec_id"] == 5
    assert top[0]["cos"] == pytest.approx(1.0, abs=1e-5)
    # ranks are dense, scores non-increasing
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    assert all(top[i]["cos"] >= top[i + 1]["cos"] for i in range(4))


def test_knn_lsh_recall(spark, emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in knn_brute(emb, q, k=10).collect()}
    # this dataset's true neighbors are weak (cos≈0.3 ⇒ P(bit agree)≈0.6) so
    # recall needs shallow buckets + many tables; near-dup workloads
    # (cos≥0.9) keep high recall with deep buckets (real pruning)
    approx = {r["vec_id"] for r in knn_lsh(emb, q, k=10, n_bits=3, n_tables=12).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"
    assert 5 in approx  # self must land in its own bucket


# --- bucketed cosine near-dup (similarity.cosine_pairs_lsh) -------------------

@pytest.fixture(scope="module")
def planted_emb(spark):
    """Deterministic embeddings with PLANTED near-duplicates: 40 base
    vectors, each with one slightly-perturbed twin (cos > 0.97), plus 120
    unrelated vectors — the workload cosine near-dup dedup exists for."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.standard_normal((40, dim))
    twins = base + 0.1 * rng.standard_normal((40, dim))
    noise = rng.standard_normal((120, dim))
    M = np.vstack([base, twins, noise])
    rows = [(i, [float(x) for x in M[i]]) for i in range(len(M))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    df.count()
    return df


def test_lsh_pairs_recall(spark, planted_emb):
    """cosine_pairs_lsh ⊆ brute pairs, with recall ≥ 0.9 on planted
    near-dups at the pinned (8 bits × 4 tables) parameters."""
    from contextinator_spark.operators.dedup import cosine_dup_pairs
    from contextinator_spark.operators.similarity import cosine_pairs_lsh

    thr = 0.9
    brute = {(r["id_a"], r["id_b"]) for r in cosine_dup_pairs(planted_emb, thr).collect()}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_lsh(planted_emb, thr, dim=64, n_bits=8, n_tables=4).collect()
    }
    assert len(brute) >= 30, "fixture should plant ≥30 near-dup pairs"
    assert lsh <= brute, "LSH-verified pairs must be a subset of brute"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"recall {recall} over {len(brute)} planted pairs"


def test_lsh_candidates_prune(spark, planted_emb):
    """The candidate set must be materially smaller than all-pairs — the
    whole point of bucketing (no cartesian anywhere in the plan)."""
    from contextinator_spark.operators.similarity import lsh_buckets, lsh_candidate_pairs

    n = planted_emb.count()
    cands = lsh_candidate_pairs(lsh_buckets(planted_emb, dim=64, n_bits=8, n_tables=4))
    n_cand = cands.count()
    assert n_cand < 0.25 * n * (n - 1) / 2, f"{n_cand} candidates of {n*(n-1)//2} pairs"
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_knn_lsh_indexed_matches_inline(spark, planted_emb, tmp_path):
    """Persisted signature table (partition-pruned probe) must return the
    same top-k as recomputing signatures inline."""
    from contextinator_spark.operators.similarity import (
        knn_lsh_indexed, lsh_buckets, query_buckets, write_signature_table, knn_brute,
    )

    sig_path = str(tmp_path / "sig")
    write_signature_table(planted_emb, sig_path, dim=64, n_bits=8, n_tables=4)
    qv = [float(x) for x in planted_emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]

    got = [tuple(r) for r in knn_lsh_indexed(spark, sig_path, qv, k=10, dim=64).collect()]

    # inline reference: same buckets computed on the fly
    cells = set(query_buckets(qv, 64, 8, 4))
    bk = lsh_buckets(planted_emb, dim=64, n_bits=8, n_tables=4)
    pool_ids = {
        r["vec_id"]
        for r in bk.collect()
        if (r["table_id"], r["bucket"]) in cells
    }
    pool = planted_emb.filter(F.col("vec_id").isin(list(pool_ids)))
    want = [tuple(r) for r in knn_brute(pool, qv, k=10).collect()]
    assert got == want
    assert got[0][1] == 3  # self is its own nearest neighbor

    # the probe is PARTITION-PRUNED: (table_id, bucket) are directory keys,
    # so the OR-of-equalities lands in PartitionFilters — the scan never
    # lists, let alone reads, the other 4·2^8 bucket directories
    df = knn_lsh_indexed(spark, sig_path, qv, k=10, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scan = plan[plan.index("PartitionFilters"):]
    assert "table_id" in scan[: scan.index("]")] and "bucket" in scan[: scan.index("]")]


def test_tree_listing_reference_order(spark):
    """DFS with dirs-first-then-name at every level — the traversal order
    repo_structure.py:25-90 renders (its sort: repo_structure.py:43)."""
    from contextinator_spark.operators.grep import tree_listing

    paths = [
        "src/app/main.py", "src/app/util.py", "src/readme.md",
        "docs/index.md", "zz.txt", "src/app.txt",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    rows = tree_listing(df).collect()
    got = [(r["node_path"], r["depth"], r["is_dir"], r["n_files"]) for r in rows]
    want = [
        ("docs", 1, True, 1),
        ("docs/index.md", 2, False, 1),
        ("src", 1, True, 4),
        ("src/app", 2, True, 2),
        ("src/app/main.py", 3, False, 1),
        ("src/app/util.py", 3, False, 1),
        ("src/app.txt", 2, False, 1),
        ("src/readme.md", 2, False, 1),
        ("zz.txt", 1, False, 1),
    ]
    assert got == want
    # max_depth prunes the walk like the reference's depth parameter
    shallow = [r["node_path"] for r in tree_listing(df, max_depth=1).collect()]
    assert shallow == ["docs", "src", "zz.txt"]


def test_grep_prefilter_keeps_anchored_patterns(spark):
    """The (?m) whole-content prefilter must not drop docs whose match is
    line-anchored (^/$) on a non-first line."""
    from contextinator_spark.operators.grep import grep_lines, grep_with_context

    df = spark.createDataFrame(
        [(1, "x = 1\nimport os\ny"), (2, "no match here"), (3, "import io\nz")],
        "doc_id long, content string",
    )
    got = {(r["doc_id"], r["line_no"]) for r in grep_lines(df, "^import").collect()}
    assert got == {(1, 2), (3, 1)}
    ctx = grep_with_context(df, "^import", n_context=1).collect()
    assert {(r["doc_id"], r["line_no"]) for r in ctx} == {(1, 2), (3, 1)}
    r1 = next(r for r in ctx if r["doc_id"] == 1)
    assert r1["context_before"] == ["x = 1"] and r1["context_after"] == ["y"]


def test_grep_prefilter_skipped_for_line_crossing_assertions(spark):
    """Patterns with \\n inside assertions can match an exploded line while
    FAILING on the whole content — the prefilter must be skipped for them
    (ADVICE round 2): foo(?!\\nbar) matches the line 'foo' in doc 1 even
    though 'foo\\nbar' fails the whole-content probe."""
    from contextinator_spark.operators.grep import _prefilter_safe, grep_lines

    assert _prefilter_safe("^import") and _prefilter_safe("spark.*hash")
    for p in (r"foo(?!\nbar)", r"\Afoo", r"foo\Z", r"foo\z", r"a\rb"):
        assert not _prefilter_safe(p)

    df = spark.createDataFrame(
        [(1, "foo\nbar"), (2, "foo\nqux")], "doc_id long, content string"
    )
    got = {(r["doc_id"], r["line_no"]) for r in grep_lines(df, r"foo(?!\nbar)").collect()}
    # line-level semantics: the exploded line "foo" has no following \nbar,
    # so BOTH docs match — doc 1 must not be dropped by a content prefilter
    assert got == {(1, 1), (2, 1)}


def test_knn_filtered_is_topk_of_filtered_set(spark):
    import numpy as np

    from contextinator_spark.operators.similarity import knn_brute, knn_filtered

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)], i % 3) for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    qv = rows[0][1]
    got = knn_filtered(emb, qv, "label = 1", k=5).collect()
    want = knn_brute(emb.filter("label = 1"), qv, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    labels = {r[2] for r in rows if r[0] in {x["vec_id"] for x in got}}
    assert labels == {1}


def test_knn_lsh_indexed_filtered_matches_inline(spark, tmp_path):
    import numpy as np

    from contextinator_spark.operators.similarity import (
        knn_lsh_indexed,
        knn_lsh_indexed_filtered,
        write_signature_table,
    )

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)], i % 2) for i in range(80)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    p = str(tmp_path / "sigs")
    write_signature_table(emb, p, dim=8, n_bits=4, n_tables=2)
    qv = rows[3][1]
    meta = emb.select("vec_id", "label")
    got = knn_lsh_indexed_filtered(
        spark, p, qv, meta, "label = 0", k=5, dim=8, n_bits=4, n_tables=2
    ).collect()
    # an RHP signature depends only on the vector itself, so filtering
    # commutes with bucketing: probing the FULL table then filtering
    # candidates equals a signature table built from the pre-filtered
    # frame (same md5-±1 hyperplane family)
    p2 = str(tmp_path / "sigs_filtered")
    write_signature_table(emb.filter("label = 0"), p2, dim=8, n_bits=4, n_tables=2)
    want = knn_lsh_indexed(spark, p2, qv, k=5, dim=8, n_bits=4, n_tables=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got, "filtered probe returned no candidates"
