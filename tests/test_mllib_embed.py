"""MLlib featurizer tier: deterministic TF-IDF embeddings + KMeans IVF
training feeding the existing KNN/IVF operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from movievectorsearch_spark.catalog import load_table
from movievectorsearch_spark.operators.ann import ivf_assign, ivf_search
from movievectorsearch_spark.operators.knn import knn_topk
from movievectorsearch_spark.pipeline.mllib_embed import (
    embed_documents_mllib,
    fit_embedder,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def embedded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    model = fit_embedder(docs, dim=32)
    return embed_documents_mllib(docs, model, dim=32).select(
        "doc_id", "text", "embedding"
    )


def test_embedding_shape_and_norm(embedded):
    rows = embedded.collect()
    assert len(rows) == 200
    for r in rows:
        assert len(r["embedding"]) == 32
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert n == pytest.approx(1.0, abs=1e-9) or n == 0.0


def test_embedding_deterministic(spark, sf_dir, embedded):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    model = fit_embedder(docs, dim=32)
    again = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents_mllib(docs, model, dim=32)
        .select("doc_id", "embedding")
        .collect()
    }
    for r in embedded.collect():
        assert again[r["doc_id"]] == r["embedding"]


def test_self_query_ranks_self_first(embedded):
    row = embedded.orderBy("doc_id").first()
    top = knn_topk(embedded, list(row["embedding"]), k=3, id_col="doc_id").collect()
    assert top[0]["doc_id"] == row["doc_id"]
    assert top[0]["score"] == pytest.approx(1.0, abs=1e-9)


def test_kmeans_ivf_pipeline(embedded):
    cents = train_ivf_centroids(embedded, n_cells=4)
    assert len(cents) == 4 and all(len(c) == 32 for c in cents)
    assigned = ivf_assign(embedded, cents)
    q = embedded.orderBy("doc_id").first()["embedding"]
    got = ivf_search(assigned, cents, list(q), k=5, nprobe=4, id_col="doc_id").collect()
    exact = knn_topk(embedded, list(q), k=5, id_col="doc_id").collect()
    # full probe == exact
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exact]
