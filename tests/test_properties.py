"""Property-based checks (hypothesis): the expression builders agree
with their pure-Python models on arbitrary printable-ASCII input, not
just the fixtures. Few examples per property — each example is a full
Spark job."""

from __future__ import annotations

from difflib import SequenceMatcher

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from movievectorsearch_spark.functions.hashing import P, int_mix, int_mix_sql, poly_hash
from movievectorsearch_spark.functions.text import clean_text, tokens, word_shingles
from movievectorsearch_spark.operators.dedup import levenshtein_ratio

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)

FEW = settings(max_examples=8, deadline=None)


def py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def py_int_mix(x: int) -> int:
    h = ((x % P) + P) % P
    h = (h * 1_103_515_245 + 12_345) % P
    return (h * h + h * 31) % P


@FEW
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=20))
def test_int_mix_matches_model_everywhere(spark, xs):
    """int_mix (the integer-domain portable hash behind the Poisson
    bootstrap draws): Spark expression, DuckDB mirror, and the Python
    model agree on arbitrary int64 input, and outputs stay in [0, P)."""
    import duckdb

    df = spark.createDataFrame([(x,) for x in xs], "x BIGINT")
    got = {
        r["x"]: r["h"]
        for r in df.select("x", int_mix(F.col("x")).alias("h")).collect()
    }
    duck = list(
        duckdb.sql(
            "SELECT " + ", ".join(int_mix_sql(str(x)) for x in xs)
        ).fetchall()[0]
    )
    for x, d in zip(xs, duck):
        assert got[x] == py_int_mix(x) == d
        assert 0 <= got[x] < P


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@FEW
@given(st.lists(ASCII, min_size=1, max_size=20))
def test_poly_hash_matches_model(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = [r["h"] for r in df.select(poly_hash(F.col("s")).alias("h")).collect()]
    # row order of createDataFrame is preserved for a local list
    assert got == [py_poly_hash(s) for s in strings]


@FEW
@given(st.lists(ASCII, min_size=1, max_size=20))
def test_clean_text_idempotent(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    once = [r[0] for r in df.select(clean_text(F.col("s"))).collect()]
    df2 = spark.createDataFrame([(s,) for s in once], "s STRING")
    twice = [r[0] for r in df2.select(clean_text(F.col("s"))).collect()]
    assert twice == once


@FEW
@given(st.lists(st.tuples(ASCII, ASCII), min_size=1, max_size=15))
def test_levenshtein_ratio_matches_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a STRING, b STRING")
    got = [
        r["r"]
        for r in df.select(
            levenshtein_ratio(F.col("a"), F.col("b")).alias("r")
        ).collect()
    ]
    for (a, b), r in zip(pairs, got):
        m = max(len(a), len(b))
        expected = 1.0 if m == 0 else 1.0 - _lev(a, b) / m
        assert abs(r - expected) < 1e-9, (a, b)
        assert 0.0 <= r <= 1.0


@FEW
@given(st.lists(ASCII, min_size=1, max_size=15))
def test_shingle_invariants(spark, strings):
    """Shingle count = max(n_tokens - 2, 1 if any tokens else 1);
    every 3-shingle has exactly 3 tokens."""
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    rows = df.select(
        tokens(F.col("s")).alias("t"), word_shingles(F.col("s"), 3).alias("sh")
    ).collect()
    for r in rows:
        nt = len(r["t"])
        if nt >= 3:
            assert len(r["sh"]) == nt - 2
            assert all(len(x.split(" ")) == 3 for x in r["sh"])
        else:
            assert r["sh"] == [" ".join(r["t"])]


def test_sequence_matcher_udf_property(spark):
    """Sampled difflib parity on adversarial near-pairs (the
    non-oracle-able F8 — SURVEY §7 hard parts)."""
    from movievectorsearch_spark.operators.dedup import sequence_matcher_ratio_udf

    pairs = [
        ("abcdef", "abcdef"),
        ("abcdef", "abcdfe"),
        ("aaaa", "aa"),
        ("", ""),
        ("x" * 50, "x" * 49 + "y"),
        ("the quick brown fox", "the quick brown dog"),
    ]
    ratio = sequence_matcher_ratio_udf()
    df = spark.createDataFrame(pairs, "a STRING, b STRING")
    got = df.select("a", "b", ratio("a", "b").alias("r")).collect()
    for r in got:
        assert abs(r["r"] - SequenceMatcher(None, r["a"], r["b"]).ratio()) < 1e-12


ROWS = st.dictionaries(
    st.integers(min_value=0, max_value=15),            # key
    st.tuples(st.integers(min_value=0, max_value=3),   # value v
              st.booleans()),                          # value present?
    max_size=12,
)


@FEW
@given(old_rows=ROWS, new_rows=ROWS)
def test_snapshot_diff_patch_reconstructs_new(spark, old_rows, new_rows):
    """Applying the diff to the old snapshot reproduces the new one:
    keep unchanged, take new values for update/insert, drop deletes —
    for ARBITRARY overlapping keys including null values."""
    from movievectorsearch_spark.operators.diff import snapshot_diff

    def frame(rows):
        data = [(k, v if present else None) for k, (v, present) in rows.items()]
        return spark.createDataFrame(data or [(None, None)], "k INT, v INT").filter(
            F.col("k").isNotNull()
        )

    old, new = frame(old_rows), frame(new_rows)
    d = snapshot_diff(old, new, ["k"], ["v"]).collect()

    # classification is exhaustive and consistent
    reconstructed = {
        r["k"]: (r["old_v"] if r["change"] == "unchanged" else r["new_v"])
        for r in d
        if r["change"] != "delete"
    }
    expected = {k: (v if present else None) for k, (v, present) in new_rows.items()}
    assert reconstructed == expected
    # diff(x, x) is all-unchanged
    assert {r["change"] for r in snapshot_diff(new, new, ["k"], ["v"]).collect()} <= {
        "unchanged"
    }


# ---------------------------------------------------------------------------
# round-2 operators vs pure-Python models on arbitrary corpora
# ---------------------------------------------------------------------------

WORD = st.text(alphabet="abcdef", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=1, max_size=24).map(" ".join)


@FEW
@given(st.lists(DOC, min_size=1, max_size=6))
def test_segment_dedup_model_parity(spark, docs):
    """segment_dedup agrees with a pure-Python first-occurrence model:
    same dup counts and same reassembled text for every doc."""
    from movievectorsearch_spark.operators.dedup import segment_dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in segment_dedup(df, "doc_id", "text", 4).collect()}

    seen: set[str] = set()
    for i, t in rows:
        toks = t.split()
        segs = [" ".join(toks[j:j + 4]) for j in range(0, len(toks), 4)]
        kept, dups = [], 0
        for s in segs:
            if s in seen:
                dups += 1
            else:
                seen.add(s)
                kept.append(s)
        assert got[i].n_segs == len(segs), (i, t)
        assert got[i].n_dup_segs == dups, (i, t)
        assert got[i].clean_text == " ".join(kept), (i, t)


@FEW
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=30, unique=True))
def test_domain_cap_model_parity(spark, ids):
    """domain_cap keeps exactly the hash-smallest ids per domain."""
    from movievectorsearch_spark.operators.curation import domain_cap

    df = spark.createDataFrame(
        [(i, "d" + str(i % 2)) for i in ids], "doc_id long, source string"
    )
    got = {(r.domain, r.id) for r in domain_cap(df, "doc_id", "source", 3).collect()}
    expect = set()
    for dom in {"d" + str(i % 2) for i in ids}:
        members = [i for i in ids if "d" + str(i % 2) == dom]
        ranked = sorted(
            members,
            key=lambda i: (((i % 1000003) * 2654435761 + 40503) % 1000003, i),
        )
        expect |= {(dom, i) for i in ranked[:3]}
    assert got == expect


@FEW
@given(st.lists(DOC, min_size=2, max_size=5))
def test_prefix_containment_model_parity(spark, docs):
    from movievectorsearch_spark.operators.dedup import prefix_containment_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id)
        for r in prefix_containment_pairs(df, "doc_id", "text", 3).collect()
    }
    norm = {i: " ".join(t.lower().split()) for i, t in rows}
    ntok = {i: len(t.split()) for i, t in rows}
    expect = set()
    for a, _ in rows:
        if ntok[a] < 3:
            continue
        for b, _ in rows:
            if a == b or ntok[b] < 3:
                continue
            # token-aligned prefix semantics: strictly shorter + a
            # token-boundary match, or equal text with id tiebreak
            if ntok[a] < ntok[b] and norm[b].startswith(norm[a] + " "):
                expect.add((a, b))
            elif ntok[a] == ntok[b] and a < b and norm[a] == norm[b]:
                expect.add((a, b))
    assert got == expect


@FEW
@given(
    st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4", "w5"]),
                 min_size=1, max_size=12).map(" ".join),
        min_size=1, max_size=6,
    )
)
def test_bm25_model_parity_randomized(spark, docs):
    """bm25_scores_ppm agrees with the pure-Python integer model on
    arbitrary small corpora (the fixture test pins one corpus; this
    samples the space — df/avgdl/tf interactions included)."""
    from movievectorsearch_spark.operators.retrieval import bm25_scores_ppm

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: r.bm25_ppm
        for r in bm25_scores_ppm(df, "doc_id", "text", ["w1", "w3"]).collect()
    }
    # reuse the module-level model from test_retrieval
    from tests.test_retrieval import _bm25_model

    assert got == _bm25_model(rows, ["w1", "w3"])


@FEW
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 4)),  # (user, item)
        min_size=1, max_size=30,
    )
)
def test_covisitation_model_parity(spark, events):
    """covisitation pair counts agree with a brute-force model (cap=30
    never binds at these sizes, so the model is the uncapped one)."""
    from itertools import combinations

    from pyspark.sql import functions as SF
    from pyspark.sql.window import Window as W

    rows = [(u, f'{{"k": {i}}}') for u, i in events]
    df = spark.createDataFrame(rows, "user_id long, props string")
    ui = (
        df.select(
            "user_id",
            SF.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint").alias("item"),
        )
        .groupBy("user_id", "item")
        .agg(SF.count("*").alias("cnt"))
    )
    capped = (
        ui.withColumn(
            "rn",
            SF.row_number().over(
                W.partitionBy("user_id").orderBy(SF.desc("cnt"), SF.asc("item"))
            ),
        )
        .filter(SF.col("rn") <= 30)
        .select("user_id", "item")
    )
    a = capped.select("user_id", SF.col("item").alias("ia"))
    b = capped.select("user_id", SF.col("item").alias("ib"))
    got = {
        (r.ia, r.ib): r.n
        for r in a.join(b, "user_id")
        .filter(SF.col("ia") < SF.col("ib"))
        .groupBy("ia", "ib")
        .agg(SF.count("*").alias("n"))
        .collect()
    }
    per_user: dict[int, set[int]] = {}
    for u, i in events:
        per_user.setdefault(u, set()).add(i)
    expect: dict[tuple[int, int], int] = {}
    for items in per_user.values():
        for x, y in combinations(sorted(items), 2):
            expect[(x, y)] = expect.get((x, y), 0) + 1
    assert got == expect


WORD = st.text(
    alphabet=st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
    min_size=1,
    max_size=12,
)


@FEW
@given(st.lists(WORD, min_size=1, max_size=30, unique=True))
def test_bpe_delimiter_encoding_matches_single_pass_model(spark, words):
    """The '|'-delimited replace chain equals a pure-Python single-pass
    merge over symbol lists for ARBITRARY lowercase words (the registry
    test samples only corpus words)."""
    from movievectorsearch_spark.plans import queries as Q

    def py_encode(word):
        syms = list(word)
        for a, b in Q._BPE_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    enc_expr = "'|' || regexp_replace(word, '(.)', '$1|')"
    for a, b in Q._BPE_MERGES:
        enc_expr = f"replace({enc_expr}, '|{a}|{b}|', '|{a}{b}|')"
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: [s for s in r["enc"].split("|") if s]
        for r in df.select("word", F.expr(enc_expr).alias("enc")).collect()
    }
    for w in words:
        assert got[w] == py_encode(w), w


@FEW
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
    )
)
def test_global_prefix_sum_matches_cumsum(spark, vals):
    """The two-phase decomposition equals a plain Python exclusive
    cumsum in key order, for any value multiset."""
    from movievectorsearch_spark.operators.packing import global_prefix_sum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["off"]
        for r in global_prefix_sum(df, "k", "v", out="off", num_parts=4).collect()
    }
    acc = 0
    for k, v in rows:
        assert out[k] == acc
        acc += v
