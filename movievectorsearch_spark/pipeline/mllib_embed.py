"""MLlib embedding generation — the production featurizer tier.

The reference embeds per-document through one HTTP call each
(create_embedding, ai_service.py:23-42; movie_generator.py:425-450).
The engine's approach ("MLlib for embedding generation, not ANN
serving"): batch featurization as an MLlib Pipeline — RegexTokenizer →
HashingTF → IDF → L2 Normalizer — which runs distributed over any
corpus size, fits (IDF statistics) in one pass, and transforms at scan
speed. The fitted model is a first-class artifact (save/load), and the
output is converted back to a plain ``array<double>`` column so every
downstream operator (KNN, LSH, dedup) is featurizer-agnostic.

KMeans (seeded) slots in as the IVF coarse-quantizer trainer — the
scale replacement for ann.seeded_centroids.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import IDF, HashingTF, Normalizer, RegexTokenizer
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64


def build_embedding_pipeline(
    text_col: str = "text", dim: int = DEFAULT_DIM
) -> Pipeline:
    """Tokenize → hashed term frequencies → IDF → unit-norm."""
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__toks", pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(inputCol="__toks", outputCol="__tf", numFeatures=dim),
            IDF(inputCol="__tf", outputCol="__tfidf"),
            Normalizer(inputCol="__tfidf", outputCol="__nvec", p=2.0),
        ]
    )


def fit_embedder(
    docs: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM
) -> PipelineModel:
    """One distributed pass to collect IDF statistics."""
    return build_embedding_pipeline(text_col, dim).fit(docs)


def embed_documents_mllib(
    docs: DataFrame,
    model: PipelineModel | None = None,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out_col: str = "embedding",
) -> DataFrame:
    """Attach an MLlib TF-IDF embedding as ``array<double>``. Fitting
    is separated from transforming so a model trained on the full
    corpus embeds incremental batches consistently."""
    if model is None:
        model = fit_embedder(docs, text_col, dim)
    out = model.transform(docs)
    return out.withColumn(out_col, vector_to_array("__nvec", "float64")).drop(
        "__toks", "__tf", "__tfidf", "__nvec"
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """KMeans coarse quantizer for IVF (the scale path replacing
    ann.seeded_centroids): trained once, centroids become plan
    literals; cell assignment stays a pure expression."""
    vecs = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    km = KMeans(k=n_cells, seed=seed, maxIter=20).fit(vecs)
    return [[float(x) for x in c] for c in km.clusterCenters()]
