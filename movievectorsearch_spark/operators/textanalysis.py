"""Text-analysis operators for the training-data pipeline tier:
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; no Python workers) so
they run at parquet-scan speed over 100 TB and mirror exactly into the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import P, poly_hash
from movievectorsearch_spark.functions.text import token_count, tokens

# A tiny per-language n-gram/stopword table (deterministic heuristic —
# the container has no langdetect lib; the POINT is the distributed
# plumbing: per-language score columns → greatest → argmax).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "it", "el", "la", "de", "der", "und"]


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        out[lang] = hits / F.greatest(F.size(toks), F.lit(1))
    return out


def detect_lang(text: Column) -> Column:
    """argmax over marker-hit ratios; deterministic tie-break by lang
    name; 'und' when nothing matches."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(
                (F.lit(-1.0) * s.cast("double")).alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_min(pairs)  # min of (-score, lang) = max score, tie→lang asc
    return F.when(-best["neg"] > 0.0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + stopword ratio +
    alpha ratio (the length/punct/stopword heuristics a pretraining
    filter applies)."""
    n_tok = token_count(text).cast("double")
    stop_ratio = F.size(
        F.filter(tokens(text), lambda t: t.isin(STOPWORDS))
    ) / F.greatest(n_tok, F.lit(1.0))
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
        / F.greatest(F.length(text).cast("double"), F.lit(1.0))
    )
    len_band = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.3)
    return F.round(
        0.4 * len_band + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0)) + 0.3 * alpha_ratio,
        6,
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of
    the token-normalized text (whitespace-canonical)."""
    return poly_hash(F.array_join(tokens(text), " "))


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: lang guess, token count, quality, fingerprint."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        detect_lang(t).alias("lang_guess"),
        token_count(t).alias("n_tokens"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
