"""Self-verification for the rows-only registry entries (the checks
the DuckDB oracle can't express — SURVEY.md §5)."""

from __future__ import annotations

from movievectorsearch_spark.plans import queries as Q


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = Q.QUERIES["approx_distinct_users"]["spark"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0, r
        assert r["approx_within_15pct"] is True, r


def test_ann_entries_subset_of_exact(spark, sf_dir):
    exact = {
        r["vec_id"]
        for r in Q.QUERIES["knn_topk"]["spark"](spark, sf_dir).collect()
    }
    # top-20 exact is the superset floor for both approximate top-10s
    for name in ("ann_srp_topk", "ann_ivf_topk"):
        got = Q.QUERIES[name]["spark"](spark, sf_dir).collect()
        assert len(got) == 10, name
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True), name


def test_chunk_documents_full_coverage(spark, sf_dir):
    """Every token of every doc lands in some chunk: the last chunk's
    window must reach the end, and all non-final chunks are full."""
    from pyspark.sql import functions as F

    df = Q.QUERIES["chunk_documents"]["spark"](spark, sf_dir)
    per_doc = df.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("last_idx"),
        F.count("*").alias("n_chunks"),
        F.min("n_chunk_tokens").alias("min_len"),
        F.max("n_chunk_tokens").alias("max_len"),
    ).collect()
    from movievectorsearch_spark.catalog import load_table
    from movievectorsearch_spark.functions.text import token_count

    n_tok = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", token_count(F.col("text")).alias("n"))
        .collect()
    }
    for r in per_doc:
        assert r["n_chunks"] == r["last_idx"] + 1
        assert r["max_len"] <= 32
        # coverage: (nc-1)*stride + window >= n_tokens
        assert r["last_idx"] * 24 + 32 >= n_tok[r["doc_id"]], r


def test_hashed_tfidf_knn_self_first(spark, sf_dir):
    """The query vector is the lowest-doc_id vector, so that doc must
    rank first with cosine exactly 1.0."""
    rows = Q.QUERIES["hashed_tfidf_knn"]["spark"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert rows[0]["score"] == 1.0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ingest_pipeline_excludes_seen_titles(spark, sf_dir):
    rows = Q.QUERIES["ingest_pipeline"]["spark"](spark, sf_dir).collect()
    titles = {r["title"] for r in rows}
    # 'Doc 3'/'Doc 7' collide with the seeded existing set ('doc 3' 1903,
    # 'doc 7' 1907) through the case-insensitive exact-key anti-join
    assert "Doc 3" not in titles and "Doc 7" not in titles
    assert all(r["dim"] == 64 for r in rows)


def test_multimodal_decode_entry(spark, sf_dir):
    rows = Q.QUERIES["multimodal_decode"]["spark"](spark, sf_dir).collect()
    assert len(rows) == 500
    assert all(r["dim"] == 16 for r in rows)


def test_stratified_sample_deterministic_and_in_tolerance(spark, sf_dir):
    """The deterministic hash gate: identical across runs, and each
    stratum's realized fraction tracks the requested one."""
    from movievectorsearch_spark.plans import queries as Q

    a = Q.QUERIES["stratified_sample"]["spark"](spark, sf_dir)
    b = Q.QUERIES["stratified_sample"]["spark"](spark, sf_dir)
    ra = sorted(r.event_id for r in a.collect())
    rb = sorted(r.event_id for r in b.collect())
    assert ra == rb

    from movievectorsearch_spark.catalog import load_table
    from pyspark.sql import functions as F

    totals = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r.event_type: r.n
        for r in a.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    want = {"click": 0.25, "view": 0.25, "purchase": 1.0, "signup": 1.0, "error": 0.5}
    for t, frac in want.items():
        realized = got.get(t, 0) / totals[t]
        if frac == 1.0:
            assert realized == 1.0, t  # keep-whole strata are exact
        else:
            assert abs(realized - frac) < 0.15, (t, realized)


def test_snapshot_diff_classification(spark):
    from movievectorsearch_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "k INT, s STRING, v INT",
    )
    new = spark.createDataFrame(
        [(2, "b", 21), (3, "c", None), (4, "d", 40)],
        "k INT, s STRING, v INT",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # null-safe compare: (3, c, NULL) vs (3, c, NULL) is unchanged
    assert got == {1: "delete", 2: "update", 3: "unchanged", 4: "insert"}


def test_train_test_split_is_deterministic_partition(spark, sf_dir):
    """The hash split must (a) partition the corpus exactly, (b) be
    reproducible run-to-run, (c) land near 80/20."""
    from movievectorsearch_spark.catalog import load_table

    rows = {r["split"]: r for r in
            Q.QUERIES["train_test_split"]["spark"](spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "documents").count()
    assert rows["train"]["n_docs"] + rows["test"]["n_docs"] == total
    again = {r["split"]: r["n_docs"] for r in
             Q.QUERIES["train_test_split"]["spark"](spark, sf_dir).collect()}
    assert again == {k: v["n_docs"] for k, v in rows.items()}
    assert 0.6 * total <= rows["train"]["n_docs"] <= 0.95 * total


def test_corr_matches_spark_builtin_loosely(spark, sf_dir):
    """The exact-sums Pearson formula must agree with F.corr to float
    tolerance (the builtin is order-dependent in low bits, which is WHY
    the registry entry doesn't use it — but they estimate the same
    statistic)."""
    import pyspark.sql.functions as F
    from movievectorsearch_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    builtin = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr(F.round("l_quantity", 0), F.round(F.col("l_discount") * 100, 0)).alias("c"))
        .collect()
    }
    for r in Q.QUERIES["corr_qty_discount"]["spark"](spark, sf_dir).collect():
        assert abs(r["corr"] - builtin[r["l_returnflag"]]) < 1e-6, r
