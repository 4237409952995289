"""ANN correctness policy (SURVEY.md §5): approximate results are a
subset of the exact top-k over an overfetched candidate pool, and
recall against exact top-k clears a floor on the real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators import ann
from movievectorsearch_spark.operators.knn import knn_topk
from movievectorsearch_spark.plans.queries import QVECS


def _exact_ids(spark, sf_dir, q, k):
    emb = load_table(spark, sf_dir, "embeddings")
    return [r["vec_id"] for r in knn_topk(emb, q, k=k).collect()]


def test_srp_results_subset_of_exact_overfetch(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    k = 10
    got = [r["vec_id"] for r in ann.srp_search(emb, QVECS[0], k=k, n_planes=6, max_hamming=2).collect()]
    assert len(got) <= k
    # every ANN hit must be a genuinely-scored corpus vector present in
    # the exact ranking's overfetched superset
    superset = set(_exact_ids(spark, sf_dir, QVECS[0], 200))
    assert set(got) <= superset


def test_srp_self_query_returns_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0)).orderBy(
        "vec_id"
    ).first()
    got = ann.srp_search(emb, list(row["embedding"]), k=1, n_planes=6, max_hamming=1).collect()
    assert got and got[0]["vec_id"] == row["vec_id"]


def test_srp_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    k = 10
    exact = set(_exact_ids(spark, sf_dir, QVECS[2], k))
    got = {
        r["vec_id"]
        for r in ann.srp_search(emb, QVECS[2], k=k, n_planes=6, max_hamming=2).collect()
    }
    # 6 planes + hamming≤2 probes 22/64 buckets — recall floor 0.3 is
    # deliberately loose (ANN is approximate; the gate is the subset
    # check above, this is a sanity floor)
    assert len(got & exact) / k >= 0.3


def test_ivf_pipeline(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ann.seeded_centroids(emb, n_cells=8)
    assert len(cents) == 8
    assigned = ann.ivf_assign(emb, cents)
    # every embedded row lands in exactly one cell
    n_emb = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    ).count()
    assert assigned.count() == n_emb
    assert assigned.filter(F.col("__cell").isNull()).count() == 0

    got = [r["vec_id"] for r in ann.ivf_search(assigned, cents, QVECS[0], k=5, nprobe=4).collect()]
    assert len(got) == 5
    superset = set(_exact_ids(spark, sf_dir, QVECS[0], 200))
    assert set(got) <= superset


def test_ivf_self_query_with_full_probe_is_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ann.seeded_centroids(emb, n_cells=4)
    assigned = ann.ivf_assign(emb, cents)
    # probing ALL cells degenerates to exact KNN
    got = [r["vec_id"] for r in ann.ivf_search(assigned, cents, QVECS[1], k=10, nprobe=4).collect()]
    assert got == _exact_ids(spark, sf_dir, QVECS[1], 10)


def test_srp_bucket_nested_form_bit_equal_to_unrolled(spark, sf_dir):
    """The nested-plane-literal srp_bucket (round 11) must assign every
    corpus vector the exact bucket the original per-plane unrolled
    expression did — same cast + zip_with + sequential left-fold dot,
    same >= 0 sign test, same bit weights."""
    from movievectorsearch_spark.functions.vector import dot, vector_lit

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    planes = ann.random_hyperplanes(8, 64, seed=42)

    def unrolled(vec_col, planes):
        bits = [
            F.when(dot(vec_col, vector_lit(p)) >= 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j, p in enumerate(planes)
        ]
        return sum(bits).cast("int")

    rows = emb.select(
        "vec_id",
        ann.srp_bucket(F.col("embedding"), planes).alias("nested"),
        unrolled(F.col("embedding"), planes).alias("flat"),
    ).collect()
    assert rows and all(r["nested"] == r["flat"] for r in rows)
