"""Winnowing fingerprints (operators/winnow.py) — the SIGMOD 2003
guarantees, checked on constructed corpora: detection of any shared
substring of >= k + w - 1 chars, density ≈ 2/(w+1), short-doc
exclusion, and the rightmost-min tie-break."""

from __future__ import annotations

from pyspark.sql import functions as F

from movievectorsearch_spark.operators.winnow import (
    rightmost_argmin_case,
    winnow_fingerprints,
)

K, W = 8, 4


def _fp_sets(spark, rows):
    """Reference python winnowing: per-doc set of (pos, hash)."""
    P = 2_147_483_647
    out = {}
    for doc_id, text in rows:
        norm = " ".join(text.lower().split())
        grams = [norm[i : i + K] for i in range(len(norm) - K + 1)]
        hs = []
        for g in grams:
            acc = 0
            for c in g:
                acc = (acc * 31 + ord(c)) % P
            hs.append(acc)
        sel = set()
        for i in range(len(hs) - W + 1):
            win = hs[i : i + W]
            m = min(win)
            # rightmost min
            j = max(p for p, h in enumerate(win) if h == m)
            sel.add(i + j)
        out[doc_id] = {(p, hs[p]) for p in sel}
    return out


def test_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs today"),
        (3, "the quick brown fox naps under the old oak tree"),
    ]
    ref = _fp_sets(spark, rows)
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.id: (r.n_grams, r.n_fp)
        for r in winnow_fingerprints(df, "doc_id", "text", K, W).collect()
    }
    for doc_id, text in rows:
        norm = " ".join(text.lower().split())
        assert got[doc_id][0] == len(norm) - K + 1
        assert got[doc_id][1] == len(ref[doc_id])


def test_shared_substring_guarantee(spark):
    # two docs sharing an exact k+w-1 = 11-char span MUST share >= 1
    # fingerprint; a third doc with no 11-char overlap shares none
    shared = "abcdefghijk"  # exactly k + w - 1 chars
    rows = [
        (1, "xxxx" + shared + "yyyyyyyyyyzz"),
        (2, "qqqqqqqwwww" + shared + "ppppppp"),
        (3, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzz1"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.id: r for r in winnow_fingerprints(df, "doc_id", "text", K, W).collect()}
    assert out[1].n_shared_fp >= 1
    assert out[2].n_shared_fp >= 1
    assert out[3].n_shared_fp == 0


def test_density_bound(spark, sf_dir):
    from movievectorsearch_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = winnow_fingerprints(docs, "doc_id", "text", K, W).collect()
    assert len(out) > 0
    for r in out:
        # winnowing selects at least 1/w and at most all windows;
        # expected 2/(w+1) — allow a generous band on real text
        assert 1_000_000 // (W + 1) <= r.density_ppm <= 1_000_000
        assert r.n_shared_fp <= r.n_fp


def test_short_docs_excluded(spark):
    # norm shorter than k + w - 1 yields < w grams -> no window -> excluded
    rows = [(1, "tiny text"), (2, "this one is long enough to fingerprint")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = winnow_fingerprints(df, "doc_id", "text", K, W).collect()
    assert [r.id for r in out] == [2]


def test_rightmost_tiebreak_case_shape():
    case = rightmost_argmin_case(3, lambda j: f"H[i+{j}]")
    assert case == (
        "CASE WHEN H[i+2] <= least(H[i+0], H[i+1]) THEN i+2 "
        "WHEN H[i+1] <= H[i+0] THEN i+1 ELSE i END"
    )
