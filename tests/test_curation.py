"""Curation-operator semantics (operators/curation.py): URL
canonicalization edge cases, deterministic sampling, token-window
chunking boundaries, PII redaction, per-source profiles.  Cross-engine
value parity is separately pinned by the driver gates
(url_normalize_docs .. source_profile_docs) — these tests pin the
SEMANTICS against hand-computed expectations."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pandarus_spark.operators import curation as C


def _norm(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(C.normalize_url(F.col("url")).alias("n")).first()["n"]


URL_CASES = [
    # lowercase scheme+host, strip userinfo/www/default port/fragment,
    # drop tracking params, sort survivors, strip trailing slashes
    ("HTTPS://bob@WWW.Ex.COM:443/A/b/?b=2&utm_source=x&a=1#frag",
     "https://ex.com/A/b?a=1&b=2"),
    ("http://ex.com:80/", "http://ex.com"),
    # non-default port survives; http keeps :443 and vice versa
    ("http://ex.com:8080/x", "http://ex.com:8080/x"),
    ("http://ex.com:443/x", "http://ex.com:443/x"),
    ("https://ex.com:80/x", "https://ex.com:80/x"),
    # tracking-only query -> no '?'
    ("https://ex.com/p?utm_campaign=a&fbclid=z&ref=me", "https://ex.com/p"),
    # fragment-with-? never parsed as query
    ("https://ex.com/p#frag?utm_source=x", "https://ex.com/p"),
    # empty query / bare '?'
    ("https://ex.com/p?", "https://ex.com/p"),
    # no scheme -> lower(trim())
    ("  Not A Url  ", "not a url"),
    (None, ""),
    # path case preserved, host case folded
    ("HTTP://A.B/KeepCase", "http://a.b/KeepCase"),
]


@pytest.mark.parametrize("url,expected", URL_CASES)
def test_normalize_url_cases(spark, url, expected):
    assert _norm(spark, url) == expected


def test_url_domain(spark):
    df = spark.createDataFrame(
        [("https://a.b.news.example.co/x",), ("http://WWW.Ex.COM/",)],
        "url string")
    got = [r["d"] for r in df.select(C.url_domain(F.col("url")).alias("d")).collect()]
    assert got == ["example.co", "ex.com"]


def test_domain_stats_counts_canonical_urls(spark):
    # same canonical URL twice (tracking param noise) -> 1 distinct url
    df = spark.createDataFrame(
        [("https://ex.com/a?utm_source=1",), ("https://ex.com/a?utm_source=2",),
         ("https://ex.com/b",), ("https://other.org/c",)], "url string")
    got = {r["domain"]: (r["n_pages"], r["n_urls"])
           for r in C.domain_stats(df).collect()}
    assert got == {"ex.com": (3, 2), "other.org": (1, 1)}


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash_sample_matches_python_recompute(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    kept = {r["doc_id"] for r in C.hash_sample(df, 0.3, salt="s1").collect()}
    thr = int(0.3 * (1 << 60))
    expected = {i for i in range(500) if _py_hash60(f"s1:{i}") < thr}
    assert kept == expected
    # deterministic across invocations and partitionings
    kept2 = {r["doc_id"] for r in
             C.hash_sample(df.repartition(7), 0.3, salt="s1").collect()}
    assert kept2 == kept
    # a different salt gives a (near-certainly) different sample
    kept3 = {r["doc_id"] for r in C.hash_sample(df, 0.3, salt="s2").collect()}
    assert kept3 != kept


def test_stratified_sample_thresholds(spark):
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.6, "de": 0.2}
    kept = {r["doc_id"] for r in
            C.stratified_sample(df, rates, default_rate=0.0).collect()}
    for i, lang in rows:
        thr = int(rates.get(lang, 0.0) * (1 << 60))
        assert (_py_hash60(f"sample:{i}") < thr) == (i in kept)
    # default_rate=0 drops every unknown stratum
    assert not any(i % 3 == 2 for i in kept)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def _chunks(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return (C.chunk_tokens(df, size=size, stride=stride)
            .orderBy("chunk_no").collect())


def test_chunk_tokens_boundaries(spark):
    words = [f"w{i}" for i in range(10)]
    # n=10, size=4, stride=3 -> starts 0,3,6 cover to 9 -> 3 chunks
    got = _chunks(spark, " ".join(words), 4, 3)
    assert [(r["chunk_no"], r["n_tokens"]) for r in got] == [(0, 4), (1, 4), (2, 4)]
    # expected md5 of each window
    for r, start in zip(got, (0, 3, 6)):
        seg = " ".join(words[start:start + 4])
        assert r["chunk_md5"] == hashlib.md5(seg.encode()).hexdigest()


@pytest.mark.parametrize("n,size,stride,expected_counts", [
    (0, 4, 3, [1]),          # empty text -> one chunk of the '' token
    (1, 4, 3, [1]),
    (4, 4, 3, [4]),          # exactly one window
    (5, 4, 3, [4, 2]),       # one extra token -> partial second window
    (7, 4, 3, [4, 4]),       # last window exactly full
    (8, 4, 4, [4, 4]),       # non-overlapping
    (9, 4, 4, [4, 4, 1]),
])
def test_chunk_tokens_window_counts(spark, n, size, stride, expected_counts):
    text = " ".join(f"w{i}" for i in range(n))
    got = _chunks(spark, text, size, stride)
    assert [r["n_tokens"] for r in got] == expected_counts


def test_chunk_tokens_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        C.chunk_tokens(df, size=0)
    with pytest.raises(ValueError):
        C.chunk_tokens(df, stride=0)


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_redact_pii(spark):
    text = ("mail Bob.Smith+x@corp.example.com srv 10.0.255.7 "
            "call +44 20 7946-0958 done")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    red = df.select(C.redact_pii(F.col("text")).alias("r")).first()["r"]
    # the phone pattern consumes "+44 20 7946"; the trailing extension
    # segment survives (two-separator international core)
    assert red == "mail <EMAIL> srv <IP> call <PHONE>-0958 done"
    # counts on the original text
    row = C.pii_stats(df).first()
    assert (row["n_email"], row["n_ipv4"]) == (1, 1)
    assert row["n_phone"] >= 1


def test_pii_stats_clean_text(spark):
    df = spark.createDataFrame([(1, "no pii here at all")],
                               "doc_id long, text string")
    row = C.pii_stats(df).first()
    assert (row["n_email"], row["n_ipv4"], row["n_phone"]) == (0, 0, 0)
    assert row["redacted_md5"] == hashlib.md5(b"no pii here at all").hexdigest()


# ---------------------------------------------------------------------------
# source profile
# ---------------------------------------------------------------------------


def test_source_profile_exact_quantiles(spark):
    # identical text -> quality constant; sizes 1,2,3,10 -> median 2.5,
    # p90 = 3 + 0.7*(10-3) = 7.9 (exact interpolated percentile)
    rows = [(i, "a b c", "s0", n) for i, n in enumerate((1, 2, 3, 10))]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    row = C.source_profile(df).first()
    assert row["n_docs"] == 4
    assert row["median_size"] == 2.5
    assert row["p90_size"] == 7.9


# ---------------------------------------------------------------------------
# plan shape (the 100 TB properties)
# ---------------------------------------------------------------------------


def test_sample_chunk_plan_narrow_and_pruned(spark, tmp_path):
    # sampling + chunking over a parquet scan must stay shuffle-free
    # (narrow map-side ops) and prune the scan to the two used columns
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}", "en", "s0", 10) for i in range(50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    df = C.chunk_tokens(C.hash_sample(spark.read.parquet(p), 0.5), size=4, stride=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan, plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "lang" not in scan[0] and "source" not in scan[0], scan


# ---------------------------------------------------------------------------
# properties
# ---------------------------------------------------------------------------


def test_normalize_url_idempotent(spark):
    # canonicalization must be a projection: normalize(normalize(u)) ==
    # normalize(u) — build a batch of structured messy URLs and check
    # the fixed point in one pass
    import itertools
    schemes = ["http", "HTTPS"]
    hosts = ["WWW.Ex.COM", "a.b.ex.org:8080", "user@ex.net:443", "ex.io"]
    paths = ["", "/", "/A/b/", "/x%20y"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=2&gclid=9"]
    frags = ["", "#f", "#f?q=1"]
    urls = ["://".join((s, h)) + p + q + f
            for s, h, p, q, f in itertools.product(schemes, hosts, paths,
                                                   queries, frags)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = C.normalize_url(F.col("url"))
    rows = df.select(once.alias("n1"),
                     C.normalize_url(C.normalize_url(F.col("url"))).alias("n2")) \
             .collect()
    for r in rows:
        assert r["n1"] == r["n2"], r


def test_chunk_tokens_reconstructs_stream(spark):
    # stride-overlap property: dropping the first (size - stride)
    # tokens of every chunk after the first reconstructs the original
    # word stream exactly (chunk_md5 prevents direct text checks, so
    # verify via n_tokens accounting instead)
    import random
    rng = random.Random(3)
    rows = [(i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))))
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    size, stride = 8, 5
    got = {}
    for r in C.chunk_tokens(df, size=size, stride=stride).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_no"], r["n_tokens"]))
    for doc_id, text in rows:
        n = len(text.split(" "))
        chunks = sorted(got[doc_id])
        # every chunk but the last is full; total coverage accounting:
        # chunk c starts at c*stride, so unique tokens = last_start + last_len
        last_no, last_len = chunks[-1]
        assert last_no * stride + last_len == n, (doc_id, n, chunks)
        for no, ln in chunks[:-1]:
            assert ln == size, (doc_id, chunks)


# ---------------------------------------------------------------------------
# shard_corpus (deterministic training-order sharding, round 4b)
# ---------------------------------------------------------------------------

def test_shard_corpus_deterministic_and_balanced(spark):
    from pandarus_spark.operators.curation import shard_corpus
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shard_corpus(docs, n_shards=8).collect()}
    # partitioning-independent manifest
    out2 = {r["doc_id"]: (r["shard"], r["pos"])
            for r in shard_corpus(docs.repartition(13), n_shards=8).collect()}
    assert out == out2
    # every shard is a dense 1..n_s sequence (a valid training order)
    from collections import Counter
    sizes = Counter(s for s, _ in out.values())
    assert len(sizes) == 8
    for s, n in sizes.items():
        assert sorted(p for sh, p in out.values() if sh == s) == list(range(1, n + 1))
    # md5 balance: no shard more than 35% off the mean at n=2000
    assert max(sizes.values()) <= 1.35 * 2000 / 8
    assert min(sizes.values()) >= 0.65 * 2000 / 8


def test_shard_corpus_duckdb_parity(spark):
    import duckdb

    import pandas as pd

    from pandarus_spark.operators.curation import shard_corpus, shard_corpus_sql
    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    got = sorted(tuple(r) for r in shard_corpus(docs, n_shards=7).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(300)}))
    want = sorted(tuple(r) for r in
                  con.execute(shard_corpus_sql(7)).fetchall())
    assert got == want


def test_bottomk_sample_exact_and_salt_invariant(spark):
    import hashlib

    from pandarus_spark.operators.curation import bottomk_sample
    docs = spark.range(500).withColumnRenamed("id", "doc_id")
    out = bottomk_sample(docs, k=12, n_salts=8).collect()
    # naive python recompute: 12 smallest salted hashes
    def h(i):
        return int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:15], 16)
    want = sorted((h(i), i) for i in range(500))[:12]
    got = sorted((r.h, r.doc_id) for r in out)
    assert got == want
    assert [r.rank for r in sorted(out, key=lambda r: (r.h, r.doc_id))] == \
        list(range(1, 13))
    # selection is salt-count invariant (the exactness argument)
    for s in (1, 3, 32):
        alt = sorted((r.h, r.doc_id)
                     for r in bottomk_sample(docs, k=12, n_salts=s).collect())
        assert alt == want


def test_bottomk_sample_mergeable_and_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from pandarus_spark.operators.curation import bottomk_sample
    docs = spark.range(400).withColumnRenamed("id", "doc_id")
    a = docs.filter(F.col("doc_id") < 200)
    b = docs.filter(F.col("doc_id") >= 200)
    # union's bottom-k is contained in the union of shard bottom-k sets
    ka = {r.doc_id for r in bottomk_sample(a, k=10).collect()}
    kb = {r.doc_id for r in bottomk_sample(b, k=10).collect()}
    ku = {r.doc_id for r in bottomk_sample(docs, k=10).collect()}
    assert ku <= (ka | kb)
    with pytest.raises(ValueError):
        bottomk_sample(docs, k=0)


def test_extract_links_by_hand_and_duckdb(spark):
    import duckdb

    from pandarus_spark.operators.curation import extract_links, extract_links_sql
    rows = [
        ("https://a.example/", "<html><a href=\"https://b.example/x\">B page</a>"
         "<p>café →</p><a href=\"/rel\"></a></html>"),
        ("https://c.example/", "<html>no links at all</html>"),
        ("https://d.example/", "<a href=\"u1\" class=\"z\">one</a>"),
    ]
    pages = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary")
    got = sorted(tuple(r) for r in extract_links(pages).collect())
    assert got == [("https://a.example/", "/rel", ""),
                   ("https://a.example/", "https://b.example/x", "B page"),
                   ("https://d.example/", "u1", "one")]
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, html BLOB)")
    for u, h in rows:
        con.execute("INSERT INTO pages VALUES (?, encode(?))", [u, h])
    want = sorted(tuple(r) for r in
                  con.execute(extract_links_sql()).fetchall())
    assert got == want


def test_extract_links_feeds_pagerank(spark):
    # edges recovered from html must reproduce the synthetic formula
    # edge list exactly (the pages -> link graph -> rank composition)
    from pyspark.sql import functions as F

    from pandarus_spark.operators.curation import extract_links
    n = 50
    d = spark.range(n).withColumnRenamed("id", "doc_id")
    html = F.concat(F.lit('<x><a href="p'),
                    ((F.col("doc_id") * 7 + 1) % n).cast("string"),
                    F.lit('">n</a></x>'))
    pages = d.select(F.concat(F.lit("p"), F.col("doc_id").cast("string"))
                      .alias("url"), F.encode(html, "utf-8").alias("html"))
    edges = (extract_links(pages)
             .select(F.regexp_extract("src_url", "p(\\d+)", 1)
                      .cast("long").alias("src"),
                     F.regexp_extract("dst_url", "p(\\d+)", 1)
                      .cast("long").alias("dst")))
    got = sorted(tuple(r) for r in edges.collect())
    assert got == [(i, (i * 7 + 1) % n) for i in range(n)]


# ---------------------------------------------------------------------------
# crawl_delta
# ---------------------------------------------------------------------------

def test_crawl_delta_statuses_and_parity(spark):
    import duckdb
    from pandarus_spark.operators.curation import crawl_delta, crawl_delta_sql
    old = [(0, "a"), (1, "b"), (2, None), (3, "d")]
    new = [(0, "a"), (1, "B2"), (2, None), (4, "e")]
    o = spark.createDataFrame(old, "doc_id long, text string")
    n = spark.createDataFrame(new, "doc_id long, text string")
    out = sorted(tuple(r) for r in crawl_delta(o, n).collect())
    assert out == [(0, "unchanged"), (1, "changed"), (2, "unchanged"),
                   (3, "removed"), (4, "added")]
    con = duckdb.connect()

    def vals(rows):
        return ", ".join("(%d, %s)" % (i, "NULL" if t is None else
                                       "'" + t + "'") for i, t in rows)
    sql = crawl_delta_sql(
        f"SELECT * FROM (VALUES {vals(old)}) t(doc_id, text)",
        f"SELECT * FROM (VALUES {vals(new)}) t(doc_id, text)")
    assert sorted(con.execute(sql).fetchall()) == out


def test_crawl_delta_rejects_duplicate_keys(spark):
    import pytest
    from pandarus_spark.operators.curation import crawl_delta
    o = spark.createDataFrame([(0, "x"), (0, "y")], "doc_id long, text string")
    n = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="duplicate"):
        crawl_delta(o, n)
    with pytest.raises(ValueError, match="new crawl"):
        crawl_delta(n, o.union(o))


# ---------------------------------------------------------------------------
# anchor_terms
# ---------------------------------------------------------------------------

def test_anchor_terms_ranking_and_parity(spark):
    import duckdb
    from pandarus_spark.operators.curation import anchor_terms, anchor_terms_sql
    edges = [("a", "X", "click here"), ("b", "X", "Click HERE"),
             ("c", "X", "read more"), ("d", "X", "here now"),
             ("e", "Y", ""), ("f", "Y", "solo"), ("g", "Z", None)]
    e = spark.createDataFrame(
        edges, "src_url string, dst_url string, anchor string")
    out = sorted(tuple(r) for r in anchor_terms(e, k=2).collect())
    # case-folded 'here' x3 wins rank 1; empty/NULL anchors emit nothing
    assert ("X", "here", 3, 1) in out and ("X", "click", 2, 2) in out
    assert ("Y", "solo", 1, 1) in out
    assert not any(r[0] == "Z" for r in out)
    con = duckdb.connect()
    vals = ", ".join("('%s','%s',%s)" % (a, b, "NULL" if c is None else
                                         "'" + c + "'") for a, b, c in edges)
    orc = sorted(con.execute(anchor_terms_sql(
        f"SELECT * FROM (VALUES {vals}) t(src_url, dst_url, anchor)",
        k=2)).fetchall())
    assert out == orc
    import pytest
    with pytest.raises(ValueError):
        anchor_terms(e, k=0)
    with pytest.raises(ValueError):
        anchor_terms_sql("SELECT 1", k=0)


def test_crawl_delta_rejects_null_keys_and_lazy_mode(spark):
    import pytest
    from pandarus_spark.operators.curation import crawl_delta
    o = spark.createDataFrame([(None, "x"), (1, "a")],
                              "doc_id long, text string")
    n = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="NULL"):
        crawl_delta(o, n)
    # check_keys=False skips the eager guard scans entirely (lazy)
    lazy = crawl_delta(n, n, check_keys=False)
    assert [tuple(r) for r in lazy.collect()] == [(1, "unchanged")]


# ---------------------------------------------------------------------------
# normalize_text / normalize_docs
# ---------------------------------------------------------------------------

def test_normalize_text_parity_all_modes(spark):
    import duckdb
    from pandarus_spark.operators.curation import (
        normalize_docs, normalize_text_sql)
    docs = [(0, "  Hello,\tWorld!\n\nNew\x00Line  "),
            (1, "A B"),                       # NBSP collapses
            (2, None),                              # NULL -> ''
            (3, "MiXeD CaSe; punct-y: (yes)!"),
            (4, "\x0b\x0cctl\x7fchars"),            # control strip
            (5, "nel\u0085here\u009cend")]             # C1 controls
    d = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    for kw in ({}, {"strip_punct": True}, {"lowercase": False}):
        out = sorted(tuple(r) for r in normalize_docs(d, **kw).collect())
        e = normalize_text_sql("text", lowercase=kw.get("lowercase", True),
                               strip_punct=kw.get("strip_punct", False))
        orc = sorted(con.execute(
            f"SELECT doc_id, {e}, CAST(length({e}) AS BIGINT) "
            f"FROM documents").fetchall())
        assert out == orc, kw
    got = {r.doc_id: r.text_norm for r in normalize_docs(d).collect()}
    assert got[0] == "hello, world! newline"
    assert got[1] == "a b" and got[2] == "" and got[4] == "ctlchars"
    assert got[5] == "nelhereend"        # C1 range stripped too
    # normalization collapses formatting-only variants to one hash key
    v = spark.createDataFrame([(0, "Foo  Bar"), (1, "foo\tbar "),
                               (2, "other")], "doc_id long, text string")
    norms = normalize_docs(v).select("text_norm").distinct().count()
    assert norms == 2
