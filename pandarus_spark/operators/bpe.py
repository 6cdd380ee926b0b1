"""Byte-pair-encoding vocabulary learning + tokenization (graft
addition) — the tokenizer-training step of an LLM data pipeline
(Sennrich et al. 2016), built so the merge loop is engine-exact.

The representation IS the algorithm: every word becomes a
separator-delimited symbol string ``\\x02 c1 \\x02 c2 ... \\x02``, and
applying merge (L, R) is the plain SQL ``replace`` of
``\\x02 L \\x02\\x02 R \\x02`` by ``\\x02 LR \\x02`` — both Spark and
DuckDB scan left-to-right and continue AFTER each replacement, which
is exactly BPE's greedy non-overlapping application: the double
separator means DISJOINT pair occurrences share no characters (both
a-n pairs of "banana" merge in one pass), while chained overlapping
occurrences (a-a-a) merge leftmost-first (validated on both
engines).  No UDF, no fold, no per-row Python.

Distribution (the 100 TB design): the ONLY full-data pass is the word
count (one partial-agg shuffle); every merge round then runs on the
VOCABULARY table (zipf: orders of magnitude smaller than the corpus),
as one pair-explode partial agg + a global top-1 — and the vocabulary
localCheckpoints per round so plans stay O(1) in the merge count.
The per-round argmax is a 1-row collect (the k-means-codebook /
convergence-probe precedent): merge decisions are inherently
sequential, and shipping one (left, right) pair per round to the
driver is the price every distributed BPE trainer pays.

Ties break by (count DESC, left ASC, right ASC) — deterministic on
both engines for the byte-ordered strings the tokenizer vocabulary
consists of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEP = "\x02"


def _q(s: str) -> str:
    """Quote a symbol string for embedding in a SPARK SQL literal
    (the DuckDB twins never embed symbols — they use scalar
    subqueries): double quotes, and double backslashes because Spark
    treats backslash as an escape inside string literals (a
    data-derived symbol must not be able to break the expression)."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _sym_expr(word_expr: str, dialect: str) -> str:
    """Delimited symbol string of a word: each symbol WRAPPED as
    ``SEP sym SEP`` (so symbols are separated by a DOUBLE separator).
    The wrap is what makes merge-by-replace correct: disjoint
    adjacent pair occurrences (a-n a-n in "banana") share no
    characters, so one replace pass merges them all — with single
    separators the shared delimiter made replace skip every other
    occurrence (caught by the hand test)."""
    # (?s): tokens can carry \n/\r (words() splits on ' ' only) and a
    # non-DOTALL '.' would leave them unwrapped, silently degenerating
    # the merge loop (review finding, reproduced)
    if dialect == "spark":
        return f"regexp_replace({word_expr}, '(?s)(.)', '\x02$1\x02')"
    return (f"regexp_replace({word_expr}, '(?s)(.)', "
            f"chr(2) || '\\1' || chr(2), 'g')")


def _pair_terms(sym_col: str, dialect: str) -> str:
    """Relation body producing (l, r, cnt) adjacent-pair rows."""
    if dialect == "spark":
        raise ValueError("spark side uses DataFrame ops")  # pragma: no cover
    return f"""
    SELECT s['l'] AS l, s['r'] AS r, cnt FROM (
      SELECT cnt,
             unnest([{{'l': syms[j], 'r': syms[j + 1]}}
                     for j in range(1, len(syms))]) AS s
      FROM (SELECT cnt,
                   list_filter(string_split({sym_col}, chr(2)),
                               x -> x <> '') AS syms
            FROM __V__))"""


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    from .dedup import words
    return (docs.select(F.explode(words(F.col(text_col))).alias("word"))
                .filter(F.col("word") != "")
                .groupBy("word").agg(F.count("*").alias("cnt")))


def bpe_merges(docs: DataFrame, n_merges: int = 8,
               text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges on the corpus's own
    word distribution.  Output: ``(step BIGINT, lhs STRING,
    rhs STRING, pair_count BIGINT)`` — one row per merge, in order.

    Raises if the vocabulary exhausts (no adjacent pair left) before
    ``n_merges`` rounds — pick ``n_merges`` below the symbol budget
    of the corpus (the SQL twin is a fixed-depth CTE chain, so early
    exhaustion cannot be mirrored)."""
    if n_merges < 1:
        raise ValueError("n_merges must be positive")
    spark = docs.sparkSession
    vocab = (_word_counts(docs, text_col)
             .select(F.expr(_sym_expr("word", "spark")).alias("sym"),
                     "cnt")
             .localCheckpoint(eager=False))
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        syms = F.filter(F.split(F.col("sym"), SEP), lambda x: x != "")
        m = F.greatest(F.size(syms) - 1, F.lit(0))
        pairs = F.zip_with(F.slice(syms, 1, m), F.slice(syms, 2, m),
                           lambda a, b: F.struct(a.alias("l"),
                                                 b.alias("r")))
        top = (vocab.select("cnt", F.explode(pairs).alias("p"))
                    .groupBy(F.col("p.l").alias("l"),
                             F.col("p.r").alias("r"))
                    .agg(F.sum("cnt").alias("c"))
                    .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                    .limit(1).collect())
        if not top:
            raise ValueError(
                f"vocabulary exhausted after {step - 1} merges")
        l, r, c = top[0].l, top[0].r, int(top[0].c)
        merges.append((step, l, r, c))
        pat = (f"concat(chr(2), '{_q(l)}', chr(2), chr(2), "
               f"'{_q(r)}', chr(2))")
        rep = f"concat(chr(2), '{_q(l)}{_q(r)}', chr(2))"
        vocab = (vocab.select(F.expr(f"replace(sym, {pat}, {rep})")
                               .alias("sym"), "cnt")
                      .localCheckpoint(eager=False))
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, pair_count long")


def bpe_merges_sql(n_merges: int = 8, source: str = "documents",
                   text_expr: str = "text") -> str:
    """DuckDB rendering of :func:`bpe_merges` — the same word counts,
    symbol representation, pair argmax, and replace-based merge
    application, as a fixed-depth CTE chain (one (m, v) pair per
    round, the label_propagation pattern)."""
    if n_merges < 1:
        raise ValueError("n_merges must be positive")
    from .dedup import WORDS_SQL
    w = WORDS_SQL.format(t=text_expr)
    parts = [f"""wc AS MATERIALIZED (
  SELECT word, count(*) AS cnt FROM (
    SELECT unnest({w}) AS word FROM {source})
  WHERE word <> '' GROUP BY word)""",
             f"v0 AS MATERIALIZED (SELECT "
             f"{_sym_expr('word', 'duckdb')} AS sym, cnt FROM wc)"]
    for i in range(1, n_merges + 1):
        pair_rel = _pair_terms("sym", "duckdb").replace("__V__",
                                                        f"v{i - 1}")
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT l, r, sum(cnt) AS c FROM ({pair_rel}) GROUP BY l, r)""")
        parts.append(f"""m{i} AS MATERIALIZED (
  SELECT l, r, c FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1)""")
        parts.append(f"""v{i} AS MATERIALIZED (
  SELECT replace(sym,
                 chr(2) || (SELECT l FROM m{i}) || chr(2) || chr(2)
                        || (SELECT r FROM m{i}) || chr(2),
                 chr(2) || (SELECT l FROM m{i})
                        || (SELECT r FROM m{i}) || chr(2)) AS sym, cnt
  FROM v{i - 1})""")
    body = ",\n".join(parts)
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS lhs, r AS rhs, "
        f"CAST(c AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1))
    return f"WITH {body}\n{sel}"


def bpe_tokenize(docs: DataFrame, merges: list[tuple[str, str]],
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Apply learned merges to every document and count the resulting
    tokens: the vocabulary-coverage read of a tokenizer (output:
    ``(doc_id, n_tokens BIGINT, n_chars BIGINT)``).

    Pure map: the document joins into one delimited symbol string
    (words separated by a DOUBLE separator, so no merge pattern —
    which contains exactly one interior separator — can cross a word
    boundary), then the merges apply as ``n_merges`` chained
    ``replace`` calls inside one codegen span; token count = symbol
    count of the result.  Zero shuffles."""
    from .dedup import words
    expr = ("array_join(transform("
            "filter(split(lower(coalesce(" + text_col + ", '')), ' '), "
            "x -> x <> ''), "
            "w -> regexp_replace(w, '(?s)(.)', '\x02$1\x02')), chr(3))")
    for l, r in merges:
        pat = (f"concat(chr(2), '{_q(l)}', chr(2), chr(2), "
               f"'{_q(r)}', chr(2))")
        rep = f"concat(chr(2), '{_q(l)}{_q(r)}', chr(2))"
        expr = f"replace({expr}, {pat}, {rep})"
    toks = (f"size(filter(split({expr}, '[]'), "
            f"x -> x <> ''))")
    t = words(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.expr(toks).cast("long").alias("n_tokens"),
        F.length(F.concat_ws("", F.filter(t, lambda x: x != "")))
         .cast("long").alias("n_chars"))


def bpe_tokenize_sql(merges_sql_rounds: int, source: str = "documents",
                     text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`bpe_merges` + :func:`bpe_tokenize`
    composed: learn ``merges_sql_rounds`` merges on ``source`` and
    apply them to the same documents — the merge pair of round i
    comes from the CTE ``m{i}`` via scalar subqueries, so the whole
    pipeline is ONE statement."""
    if merges_sql_rounds < 1:
        raise ValueError("merges_sql_rounds must be positive")
    learn = bpe_merges_sql(merges_sql_rounds, source=source,
                           text_expr=text_expr)
    # strip the final UNION-ALL select list; keep only the CTE chain
    body = learn[len("WITH "):]
    cut = body.rindex(")\nSELECT ")
    ctes = body[:cut + 1]
    expr = ("coalesce(array_to_string(list_transform("
            "list_filter(string_split(lower(coalesce("
            + text_expr + ", '')), ' '), x -> x <> ''), "
            "w -> regexp_replace(w, '(?s)(.)', "
            "chr(2) || '\\1' || chr(2), 'g')), chr(3)), '')")
    for i in range(1, merges_sql_rounds + 1):
        pat = (f"chr(2) || (SELECT l FROM m{i}) || chr(2) || chr(2) "
               f"|| (SELECT r FROM m{i}) || chr(2)")
        rep = (f"chr(2) || (SELECT l FROM m{i}) || "
               f"(SELECT r FROM m{i}) || chr(2)")
        expr = f"replace({expr}, {pat}, {rep})"
    toks = (f"len(list_filter(string_split_regex({expr}, "
            f"chr(2) || '|' || chr(3)), x -> x <> ''))")
    chars = ("length(coalesce(array_to_string(list_filter(string_split("
             "lower(coalesce(" + text_expr + ", '')), ' '), "
             "x -> x <> ''), ''), ''))")
    return (f"WITH {ctes}\n"
            f"SELECT {id_expr} AS doc_id, "
            f"CAST({toks} AS BIGINT) AS n_tokens, "
            f"CAST({chars} AS BIGINT) AS n_chars FROM {source}")
