"""Invariant tests for the hybrid-retrieval tier
(operators/retrieval.py): BM25 integer-math model parity, RRF fusion
semantics, maxsim vs a NumPy brute-force model, PageRank-step mass
conservation, rolling-WAU window correctness."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators.retrieval import (
    PPM,
    bm25_scores_ppm,
    maxsim_scores,
    rank_topn,
    rrf_fuse,
)


def _bm25_model(docs: list[tuple[int, str]], terms: list[str]) -> dict[int, int]:
    """Pure-Python integer mirror of bm25_scores_ppm."""
    toks = {i: t.lower().split() for i, t in docs}
    dl_c = {i: len(ts) * 100 for i, ts in toks.items()}
    n_docs = len(docs)
    avgdl_c = sum(dl_c.values()) // n_docs
    tf = {
        (i, w): toks[i].count(w)
        for i in toks
        for w in terms
        if toks[i].count(w) > 0
    }
    df = {w: sum(1 for (i, t) in tf if t == w) for w in terms}
    out: dict[int, int] = {}
    for (i, w), f in tf.items():
        idf = (PPM * (n_docs - df[w])) // n_docs
        sat = (PPM * 44 * avgdl_c * f) // (
            20 * avgdl_c * f + 6 * avgdl_c + 18 * dl_c[i]
        )
        out[i] = out.get(i, 0) + (idf * sat) // PPM
    return out


def test_bm25_matches_integer_model(spark):
    docs = [
        (1, "spark spark spark window"),
        (2, "spark window hash join sort"),
        (3, "hash hash hash hash hash hash hash hash"),
        (4, "nothing relevant here at all"),
        (5, "window"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: r.bm25_ppm
        for r in bm25_scores_ppm(df, "doc_id", "text", ["spark", "window", "hash"]).collect()
    }
    assert got == _bm25_model(docs, ["spark", "window", "hash"])


def test_rrf_fusion_semantics(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank int")
    rows = {r.id: r for r in rrf_fuse(a, b, k=60, top=10).collect()}
    # doc in both lists outranks any single-list doc here
    assert rows[20].rrf_ppm == PPM // 62 + PPM // 61
    assert rows[10].rrf_ppm == PPM // 61
    assert rows[40].rrf_ppm == PPM // 62
    assert rows[30].rrf_ppm == PPM // 63
    order = sorted(rows.values(), key=lambda r: (-r.rrf_ppm, r.id))
    assert [r.id for r in order][0] == 20


def test_rank_topn_is_bounded_and_dense(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.size("embedding").alias("s")
    )
    ranks = rank_topn(e, "id", "s", 10).collect()
    assert [r.rank for r in sorted(ranks, key=lambda r: r.rank)] == list(
        range(1, 11)
    )


def test_maxsim_matches_numpy(spark, sf_dir):
    from movievectorsearch_spark.plans.queries import QVECS

    e = load_table(spark, sf_dir, "embeddings")
    got = {r.grp: r.maxsim for r in maxsim_scores(e, "label", "embedding", QVECS).collect()}
    rows = e.select("label", "embedding").collect()
    qs = [np.array(q) for q in QVECS]
    best: dict[int, list[float]] = {}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        nv = np.linalg.norm(v)
        for j, qv in enumerate(qs):
            c = float(v @ qv / (np.linalg.norm(qv) * nv)) if nv else None
            if c is None:
                continue
            best.setdefault(r.label, [-2.0] * len(qs))
            if c > best[r.label][j]:
                best[r.label][j] = c
    for lbl, maxes in best.items():
        assert abs(got[lbl] - sum(maxes)) < 1e-4, (lbl, got[lbl], sum(maxes))


def test_pagerank_step_mass_conservation(spark, sf_dir):
    """Each customer emits ≤ 1e6 ppm and ≥ 1e6 - outdeg (integer-div
    floor loss only), so total inflow is bounded tightly."""
    from movievectorsearch_spark.plans.queries import QUERIES

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    n_cust = edges.select("c").distinct().count()
    deg = edges.groupBy("c").agg(F.count("*").alias("deg"))
    contrib = edges.join(deg, "c").withColumn("w", F.expr("1000000 div deg"))
    total = contrib.agg(F.sum("w")).first()[0]
    max_deg = deg.agg(F.max("deg")).first()[0]
    assert total <= n_cust * PPM
    assert total >= n_cust * (PPM - max_deg)
    # and the query's top-20 is well-formed
    top = QUERIES["pagerank_step_suppliers"]["spark"](spark, "/root/testdata/sf0.001").collect()
    n_supp = l.select("l_suppkey").distinct().count()
    assert len(top) == min(20, n_supp)
    assert all(r.rank_ppm >= 150000 for r in top)


def test_rolling_wau_matches_direct_window(spark, sf_dir):
    from movievectorsearch_spark.plans.queries import QUERIES

    out = {
        r.day: (r.dau, r.wau)
        for r in QUERIES["rolling_wau_stickiness"]["spark"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    days = sorted(out)
    for day in (days[0], days[len(days) // 2], days[-1]):
        dau = (
            ev.filter(F.col("d") == F.lit(day).cast("date"))
            .select("user_id")
            .distinct()
            .count()
        )
        wau = (
            ev.filter(
                (F.col("d") <= F.lit(day).cast("date"))
                & (F.col("d") >= F.date_sub(F.lit(day).cast("date"), 6))
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert out[day] == (dau, wau), (day, out[day], (dau, wau))


def test_power_iteration_matches_numpy_quantized(spark, sf_dir):
    """v_raw must equal the exact integer XᵀXv over the quantized
    embedding matrix."""
    import numpy as np

    from movievectorsearch_spark.plans import queries as Q

    out = {r.dim: r.v_raw for r in Q.QUERIES["power_iteration_matvec"]["spark"](spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    X = np.array(
        [
            [int(round(float(x) * 1000)) for x in r.embedding]
            for r in e.select("embedding").collect()
        ],
        dtype=np.int64,
    )
    vq = np.array(Q._PI_VQ, dtype=np.int64)
    expect = X.T @ (X @ vq)
    for d in range(X.shape[1]):
        assert out[d] == expect[d], (d, out[d], int(expect[d]))


def test_table_checksum_detects_single_row_corruption(spark, sf_dir):
    """Flipping one row's value must change the checksum pair."""
    from movievectorsearch_spark.functions.hashing import poly_hash

    o = load_table(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
    )

    def sums(df):
        return df.select(poly_hash(row).alias("h")).agg(
            F.expr("bit_xor(h)").alias("x"), F.sum("h").alias("s")
        ).first()

    base = sums(o)
    corrupted = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == o.select(F.min("o_orderkey")).first()[0],
               F.col("o_totalprice") + 0.01).otherwise(F.col("o_totalprice")),
    )
    got = sums(corrupted)
    assert (base.x, base.s) != (got.x, got.s)
