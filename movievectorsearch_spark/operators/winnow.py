"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003 — the MOSS algorithm).

The missing tier between whole-document hashing (dedup_exact) and
set-similarity sketches (MinHash/SimHash): position-robust LOCAL
fingerprints. Every window of ``w`` consecutive character ``k``-gram
hashes contributes its minimum (rightmost on ties), which guarantees

- any shared substring of length >= k + w - 1 produces at least one
  IDENTICAL fingerprint in both documents (the detection guarantee
  MinHash cannot give for short local overlaps), and
- expected fingerprint density 2 / (w + 1) — a fixed, tunable fraction
  of the corpus, independent of document length.

Plan shape: the k-gram hash array is computed ONCE per document and
immediately exploded to (doc, pos, hash) rows; the window selection is
``lead()`` columns over a per-document window. An earlier all-array
formulation (transform + element_at over a projected hash column) was
QUADRATIC in practice: Catalyst's project collapsing inlines the
array-building expression into every element_at access inside the
selection lambdas (the same trap functions/text.word_shingles
documents), and 2 documents already took 16 s. The exploded form
evaluates the hash expression exactly once per gram — measured linear.
Shuffles: one per-document window sort, one groupBy on the (uniform)
fingerprint hash, one groupBy back on the doc id — all linear and
partition-count invariant, so the plan survives a 1000-executor 100 TB
corpus unchanged. The reference has no sub-document duplicate
detection at all (its dedup is whole-title exact match,
movie_generator.py:83-94); this is the industry-standard
plagiarism/boilerplate detector a training-data pipeline runs next to
MinHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from movievectorsearch_spark.functions.hashing import P
from movievectorsearch_spark.functions.text import tokens


def rightmost_argmin_case(w: int, at) -> str:
    """SQL CASE choosing the RIGHTMOST argmin position among
    ``at(0)..at(w-1)`` relative to window start ``i`` — the winnowing
    tie-break that makes the selected set identical in both engines.
    ``at(j)`` renders the j-th hash lookup in the host dialect."""
    conds = []
    for j in range(w - 1, 0, -1):
        prior = ", ".join(at(m) for m in range(j))
        least = prior if j == 1 else f"least({prior})"
        conds.append(f"WHEN {at(j)} <= {least} THEN i+{j}")
    return "CASE " + " ".join(conds) + " ELSE i END"


def _argmin_cases(w: int) -> tuple[str, str]:
    """(position CASE, hash CASE) over lead columns h, h1..h{w-1} at a
    window-start row — same rightmost tie-break as
    :func:`rightmost_argmin_case`, expressed over the exploded rows."""
    hcol = lambda m: "h" if m == 0 else f"h{m}"  # noqa: E731
    conds_p, conds_h = [], []
    for j in range(w - 1, 0, -1):
        prior = ", ".join(hcol(m) for m in range(j))
        least = prior if j == 1 else f"least({prior})"
        conds_p.append(f"WHEN {hcol(j)} <= {least} THEN pos + {j}")
        conds_h.append(f"WHEN {hcol(j)} <= {least} THEN {hcol(j)}")
    return (
        "CASE " + " ".join(conds_p) + " ELSE pos END",
        "CASE " + " ".join(conds_h) + " ELSE h END",
    )


def fingerprint_rows(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """(id, n_grams, fp_h, npos): one row per document per DISTINCT
    selected fingerprint hash, with the count of selected positions
    carrying that hash — the shared pipeline under both the census
    (winnow_fingerprints) and the pair miner (winnow_dup_pairs).

    Documents whose normalized text yields fewer than ``w`` k-grams
    (len < k + w - 1) carry no window and are excluded — identically in
    the oracle.
    """
    # per-position k-gram polynomial hashes as a k-level zip_with
    # rolling fold over k shifted slices of the char-code array — one
    # multiply-add per char per level instead of a per-position inner
    # aggregate over a fresh substring split (3x faster measured at
    # sf0.1; identical values: the aggregate's first step (0*31+c1)%P
    # equals the slice's c1 since code points < P). Exploded
    # immediately so the chain is evaluated exactly once per document.
    codes = "transform(split(norm, ''), c -> cast(ascii(c) as bigint))"
    h_arr = f"slice({codes}, 1, n_grams)"
    for j in range(1, k):
        h_arr = (
            f"zip_with({h_arr}, slice({codes}, {j + 1}, n_grams), "
            f"(acc, c) -> (acc * 31 + c) % cast({P} as bigint))"
        )
    g = (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_join(tokens(F.col(text_col)), " ").alias("norm"),
        )
        .withColumn("n_grams", F.length("norm") - F.lit(k - 1))
        .filter(F.col("n_grams") >= w)
        .select(
            "id",
            "n_grams",
            F.posexplode(F.expr(h_arr)).alias("p0", "h"),
        )
        .select("id", "n_grams", (F.col("p0") + 1).alias("pos"), "h")
    )
    ord_w = Window.partitionBy("id").orderBy("pos")
    for j in range(1, w):
        g = g.withColumn(f"h{j}", F.lead("h", j).over(ord_w))
    case_p, case_h = _argmin_cases(w)
    # Winnowing selections are NON-DECREASING in window-start order: if
    # window i's rightmost min p is still inside window i+1, every
    # survivor left of p has a strictly larger hash, so window i+1
    # selects p again or something to its right; if p fell out, all of
    # window i+1 sits right of p. Duplicate selections are therefore
    # CONSECUTIVE, and a lag() filter over the same (id, pos) window —
    # reusing the exchange the lead() columns already built — replaces
    # what would otherwise be a corpus-sized distinct() shuffle (the
    # x16 scaling probe flagged that distinct as the superlinear term).
    sel = (
        g.filter(F.col("pos") <= F.col("n_grams") - (w - 1))
        .select(
            "id",
            "n_grams",
            "pos",
            F.expr(case_p).alias("fp_pos"),
            F.expr(case_h).alias("fp_h"),
        )
        .withColumn("prev_pos", F.lag("fp_pos").over(ord_w))
        .filter(
            F.col("prev_pos").isNull() | (F.col("fp_pos") != F.col("prev_pos"))
        )
        .select("id", "n_grams", "fp_pos", "fp_h")
    )
    return sel.groupBy("id", "n_grams", "fp_h").agg(
        F.count("*").alias("npos")
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    persist=None,
) -> DataFrame:
    """Per-document winnowing fingerprint census.

    Returns (id, n_grams, n_fp, n_shared_fp, density_ppm) where n_fp
    counts distinct selected positions, n_shared_fp counts the
    document's distinct fingerprint hashes that also occur in at least
    one OTHER document (the boilerplate/plagiarism signal), and
    density_ppm = 1e6·n_fp/n_grams (winnowing guarantees ≈ 2/(w+1)).
    """
    # eh feeds BOTH the per-hash doc count and the join probe side —
    # cached via the shared persist registry so the explode+window
    # pipeline runs once (uncached, Spark plans the subtree twice).
    eh = fingerprint_rows(docs, id_col, text_col, k, w)
    if persist is not None:
        eh = persist(eh)
    cnt = eh.groupBy("fp_h").agg(F.countDistinct("id").alias("nd"))
    return (
        eh.join(cnt, "fp_h")
        .groupBy("id", "n_grams")
        .agg(
            F.sum("npos").cast("bigint").alias("n_fp"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_fp"),
        )
        .select(
            "id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            "n_fp",
            "n_shared_fp",
            F.expr("(1000000 * n_fp) div n_grams").cast("bigint").alias(
                "density_ppm"
            ),
        )
        .orderBy("id")
    )


def winnow_dup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_df: int = 16,
    persist=None,
) -> DataFrame:
    """Duplicate CANDIDATE PAIRS from shared winnowing fingerprints —
    the actionable output MOSS reports: (a_id, b_id, n_shared,
    overlap_ppm) for pairs sharing ≥ ``min_shared`` distinct
    fingerprint hashes, overlap_ppm = 1e6·n_shared / min(n_fp_a,
    n_fp_b) (a containment-style score: 1e6 means every fingerprint of
    the smaller doc also appears in the other).

    Fingerprints occurring in more than ``max_df`` documents are
    dropped before pairing — MOSS's stop-fingerprint rule: ubiquitous
    boilerplate carries no pair signal and is exactly the skew that
    would make the self-join quadratic (a hash shared by m docs emits
    m² pairs; the cap bounds that to max_df² — the same no-cartesian
    discipline as the banded-LSH joins)."""
    eh = fingerprint_rows(docs, id_col, text_col, k, w)
    if persist is not None:
        eh = persist(eh)
    nfp = eh.groupBy("id").agg(F.sum("npos").cast("bigint").alias("n_fp"))
    cnt = eh.groupBy("fp_h").agg(F.countDistinct("id").alias("nd"))
    rare = (
        eh.join(
            cnt.filter((F.col("nd") >= 2) & (F.col("nd") <= max_df)), "fp_h"
        )
        .select("fp_h", "id")
    )
    pairs = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.fp_h") == F.col("b.fp_h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    nfp_a = nfp.select(
        F.col("id").alias("a_id"), F.col("n_fp").alias("n_fp_a")
    )
    nfp_b = nfp.select(
        F.col("id").alias("b_id"), F.col("n_fp").alias("n_fp_b")
    )
    return (
        pairs.join(nfp_a, "a_id")
        .join(nfp_b, "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.expr("(1000000 * n_shared) div least(n_fp_a, n_fp_b)")
            .cast("bigint")
            .alias("overlap_ppm"),
        )
        .orderBy("a_id", "b_id")
    )
