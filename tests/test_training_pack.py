"""Round-4c training-pipeline operators: sequence packing
(curation.pack_sequences), Gopher quality rules (textstats.gopher_rules),
and the inverted-index postings sample (textstats.postings_sample).
Semantics pinned against hand-computed cases and invariants; the driver
gates (pack_sequences_docs / gopher_quality_docs / postings_docs) pin
cross-engine value parity at sf0.01 on top."""

import contextlib
import io

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandarus_spark.operators import curation as C
from pandarus_spark.operators import textstats as T


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_pack_sequences_covers_corpus_exactly(spark):
    texts = ["w " * n for n in (1, 5, 130, 128, 129, 300, 64)]
    docs = _mk_docs(spark, [t.strip() for t in texts])
    out = C.pack_sequences(docs, seq_len=128, n_shards=2).collect()
    # every token of every doc lands in exactly one slice, in order
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    total_tokens = {i: len(t.strip().split(" ")) for i, t in enumerate(texts)}
    for did, slices in by_doc.items():
        slices.sort(key=lambda r: r["doc_from"])
        assert slices[0]["doc_from"] == 0
        for a, b in zip(slices, slices[1:]):
            assert a["doc_from"] + a["n_fill"] == b["doc_from"]  # contiguous
        assert sum(r["n_fill"] for r in slices) == total_tokens[did]
    assert set(by_doc) == set(total_tokens)
    # every non-tail sequence is exactly full; nothing exceeds seq_len
    fills = {}
    for r in out:
        fills[(r["shard"], r["seq"])] = fills.get((r["shard"], r["seq"]), 0) + r["n_fill"]
    last = {s: max(q for s2, q in fills if s2 == s) for s, _ in fills}
    for (s, q), f in fills.items():
        assert f <= 128
        if q < last[s]:
            assert f == 128, (s, q, f)


def test_pack_sequences_partitioning_invariant(spark):
    texts = [f"tok{i} " * (7 * i % 50 + 1) for i in range(60)]
    docs = _mk_docs(spark, [t.strip() for t in texts])
    a = sorted(tuple(r) for r in C.pack_sequences(docs, 64, 4).collect())
    b = sorted(tuple(r) for r in
               C.pack_sequences(docs.repartition(13), 64, 4).collect())
    assert a == b


def test_pack_sequences_duckdb_parity(spark):
    texts = ["", "one", "a b c", "x " * 200]
    texts = [t.strip() if t else t for t in texts] + [None]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in C.pack_sequences(docs, 32, 3).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(C.pack_sequences_sql(32, 3)).fetchall())
    assert got == want


def test_pack_sequences_single_window_exchange(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(C.pack_sequences(docs, 128, 8))
    # ONE shard-keyed exchange; explode stays inside the partition
    assert plan.count("- Exchange") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


# ---------------------------------------------------------------------------
# gopher_rules
# ---------------------------------------------------------------------------

_GOOD = "the of " + " ".join(f"word{i % 9}" for i in range(60))


def _gopher_one(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return T.gopher_rules(df, **kw).first()


def test_gopher_rules_passing_doc(spark):
    r = _gopher_one(spark, _GOOD)
    assert r["keep_flag"] == 1
    assert r["n_words"] == 62
    assert r["n_stopwords"] == 2
    assert r["alpha_word_frac"] == 1.0


@pytest.mark.parametrize("mutate,expect_zero_rule", [
    (lambda t: "the of word", "n_words below min"),
    (lambda t: t + " " + "#" * 1 * 40, "symbol ratio"),
    (lambda t: "\n".join("- " + line for line in [t] * 10), "bullet lines"),
    (lambda t: "\n".join(line + "..." for line in [t] * 10), "ellipsis lines"),
    (lambda t: t.replace("word", "1234"), "alpha fraction"),
    (lambda t: t.replace("the of ", "xx yy "), "stopwords"),
    (lambda t: " ".join("supercalifragilistic" for _ in range(60)), "mean word len"),
])
def test_gopher_rules_each_rule_fires(spark, mutate, expect_zero_rule):
    r = _gopher_one(spark, mutate(_GOOD))
    assert r["keep_flag"] == 0, expect_zero_rule


def test_gopher_rules_null_and_unicode(spark):
    rows = [(0, None), (1, "• bullet\n… tail…"), (2, _GOOD)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in T.gopher_rules(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(T.gopher_rules_sql()).fetchall())
    assert [tuple(map(str, r)) for r in got] == [tuple(map(str, r)) for r in want]


def test_gopher_rules_plan_is_narrow(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(T.gopher_rules(docs))
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


# ---------------------------------------------------------------------------
# postings_sample
# ---------------------------------------------------------------------------


def test_postings_sample_hand_case(spark):
    rows = [(10, "apple pear"), (7, "apple"), (3, "apple apple plum"),
            (1, "pear"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: (r["doc_freq"], r["sample_docs"])
           for r in T.postings_sample(df, p=2, n_salts=4).collect()}
    assert got["apple"] == (3, "3,7")      # p smallest ids of {3,7,10}
    assert got["pear"] == (2, "1,10")
    assert got["plum"] == (1, "3")
    assert got[""] == (1, "2")             # NULL text -> [''] convention


def test_postings_sample_salt_invariant_and_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in T.postings_sample(docs, p=3, n_salts=8).collect())
    b = sorted(tuple(r) for r in T.postings_sample(docs, p=3, n_salts=2).collect())
    c = sorted(tuple(r) for r in T.postings_sample(docs, p=3, n_salts=1).collect())
    assert a == b == c  # n_salts=1 IS the unsalted single-window plan
    # hot-only salting (r5): any threshold/sample choice, same result —
    # salting is selection-invariant, only the partitioning moves
    d = sorted(tuple(r) for r in
               T.postings_sample(docs, p=3, n_salts=8, salt_threshold=5,
                                 sample_mod=3).collect())
    e = sorted(tuple(r) for r in
               T.postings_sample(docs, p=3, n_salts=16,
                                 salt_threshold=10_000).collect())
    assert a == d == e


def test_postings_sample_duckdb_parity(spark):
    rows = [(i, f"t{i % 5} t{(i * 3) % 7} common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in T.postings_sample(df, p=3, n_salts=4).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(T.postings_sample_sql(3)).fetchall())
    assert got == want


def test_postings_sample_plan_single_full_shuffle(spark):
    """The exploded token table crosses exactly ONE exchange (the
    (token, salt) window shuffle); the second exchange carries only
    the ≤ p·n_salts survivors per token after a map-side partial agg.
    No Join anywhere, and both window functions share the one sort."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(T.postings_sample(docs, p=3, n_salts=8))
    assert plan.count("- Exchange") == 2, plan
    assert "Join" not in plan, plan
    assert plan.count("- Sort") == 1, plan          # shared by both windows
    assert "partial_collect_set" in plan, plan      # map-side before exch 2


# ---------------------------------------------------------------------------
# composed lm_dataset pipeline (gopher filter -> exact dedup -> pack)
# ---------------------------------------------------------------------------


def test_lm_dataset_composition_semantics(spark):
    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    out = E.queries()["lm_dataset_docs"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # recompute the expected survivor set independently
    kept = {(r["doc_id"], r["text"]) for r in
            docs.filter(T.gopher_keep("text", min_words=40,
                                      stopwords=("the", "a"))).collect()}
    by_text = {}
    for did, text in kept:
        by_text.setdefault(text, []).append(did)
    survivors = {min(v) for v in by_text.values()}
    assert {r["doc_id"] for r in out} == survivors
    # packing invariant: every doc's slices cover its token count
    ntok = {did: len(t.split(" ")) for t, v in by_text.items()
            for did in [min(v)]}
    got = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["n_fill"]
    assert got == ntok


def test_lm_dataset_plan_filter_before_shuffles(spark):
    """The quality predicate must sit directly on the scan (map-side,
    BEFORE the dedup window exchange): 2 exchanges total (dedup window
    + pack window), no Join, no Python."""
    import __spark_entry__ as E
    plan = _plan(E.queries()["lm_dataset_docs"](spark, "/root/testdata/sf0.001"))
    assert plan.count("- Exchange") == 2, plan
    assert "Join" not in plan and "Python" not in plan, plan
    # the first operator above the scan is the quality Filter
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    lines = [ln for ln in tree.splitlines() if "(" in ln]
    scan_idx = next(i for i, ln in enumerate(lines) if "Scan parquet" in ln)
    assert "Filter" in lines[scan_idx - 1], tree


def test_round4c_param_validation(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    from pandarus_spark.operators.dedup import remove_dup_spans
    with pytest.raises(ValueError):
        C.pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        C.pack_sequences(docs, seq_len=32, n_shards=0)
    with pytest.raises(ValueError):
        T.postings_sample(docs, p=0)
    with pytest.raises(ValueError):
        T.postings_sample(docs, p=3, n_salts=0)
    with pytest.raises(ValueError):
        remove_dup_spans(docs, k=1)
