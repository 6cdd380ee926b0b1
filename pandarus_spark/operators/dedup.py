"""Deduplication suite for web-scale training-data pipelines
(graft addition — no reference analogue; first-class per the build
brief).  Everything stays JVM-side (Catalyst higher-order functions —
no Python in the hot path), and every hash is md5-derived so an
independent SQL engine (DuckDB) can reproduce values bit-for-bit.

Operators:

* :func:`exact_dedup` — hash-groupBy exact duplicate removal;
* :func:`minhash_signatures` — word-shingle MinHash signatures;
* :func:`minhash_lsh_pairs` — banded LSH candidate pairs + exact
  Jaccard verification (near-dup detection at scale);
* :func:`ngram_jaccard_pairs` — exact all-pairs n-gram Jaccard via an
  inverted-index self-join (the correctness oracle for LSH);
* :func:`simhash` — 64-bit SimHash per document.

Scale notes: exact dedup and LSH bucketing are single-shuffle
groupBys; the n-gram inverted-index join is quadratic only within a
shared shingle (standard prefix-filter territory — at 100 TB you run
minhash_lsh_pairs; ngram_jaccard_pairs is the small-scale oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# shared expression builders (Spark Column + equivalent ANSI SQL string)
# ---------------------------------------------------------------------------


def hash60(col: Column) -> Column:
    """60-bit integer from md5 — identical in Spark and DuckDB:
    Spark  : conv(substring(md5(encode(s,'utf-8')),1,15),16,10)::long
    DuckDB : CAST('0x'||substr(md5(s),1,15) AS BIGINT)"""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST('0x'||substr(md5({expr}),1,15) AS BIGINT)"


def hash60b(col: Column) -> Column:
    """Second independent 60-bit lane from the SAME md5 (hex chars
    17-31) — SimHash bits 60+ draw from here, so widening to 64 bits
    costs zero extra hashing."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 17, 15), 16, 10).cast("long")


def hash60b_sql(expr: str) -> str:
    return f"CAST('0x'||substr(md5({expr}),17,15) AS BIGINT)"


def _bit_lit(j: int) -> Column:
    """Bit-j literal of a two's-complement long: bit 63 is the sign
    bit, so its value is −2⁶³ (a plain ``1 << 63`` overflows LongType
    under ANSI arithmetic)."""
    return F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("long")


def _bit_lit_sql(j: int) -> str:
    return str(-(1 << 63) if j == 63 else (1 << j))


def nz(col: Column) -> Column:
    """NULL text ≡ '' in every text kernel, on both engines.

    The zip_with/slice shingle rewrite (and DuckDB's string_split)
    propagate NULL, while the round-1 kernels produced the
    empty-string result — a NULL-text doc would silently vanish from
    minhash_lsh_pairs (posexplode of a NULL signature emits no rows)
    and null out text_stats columns.  External pages tables
    (``read_pages_table``) legitimately carry NULL text, so totalize
    here once; the SQL renderings coalesce identically."""
    return F.coalesce(col, F.lit(""))


NZ_SQL = "coalesce({t}, '')"


def words(col: Column) -> Column:
    return F.split(F.lower(nz(col)), " ")


WORDS_SQL = "string_split(lower(coalesce({t}, '')), ' ')"


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles, JVM-side via zip_with over shifted
    array slices (cheaper codegen than the older per-index
    transform/try_element_at chain — ~2x on the sf0.1 corpus, same
    output bit-for-bit).

    Texts shorter than k words produce one truncated shingle from the
    available words: ``slice`` past the end yields an empty array,
    ``zip_with`` null-pads it, and ``concat_ws`` skips the nulls —
    reproducing DuckDB's clamping list slice so the oracle stays
    bit-identical (pinned by tests/test_edge_cases.py)."""
    w = words(col)
    m = F.greatest(F.size(w) - (k - 1), F.lit(1))
    sh = F.slice(w, 1, m)
    for j in range(1, k):
        sh = F.zip_with(sh, F.slice(w, 1 + j, m),
                        lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(sh)


def shingles_sql(text_expr: str, k: int = 3) -> str:
    """DuckDB rendering of :func:`word_shingles` (requires a lateral
    alias ``w`` for the word list; returned as a full subexpression)."""
    w = WORDS_SQL.format(t=text_expr)
    return (f"list_distinct([array_to_string(({w})[i:i+{k - 1}],' ') "
            f"for i in range(1, greatest(len({w})-{k - 2}, 2))])")


# --- rolling-hash shingle ids (round-4 design item: k>=5 shingles) ---------
#
# word_shingles materializes each k-word shingle STRING through a
# zip_with chain that re-concatenates the growing prefix — O(k²) string
# bytes per shingle.  Fine at minhash's k=3; at decontam's k=8 the
# shingle expression alone was 9.3 s of a 15.6 s operator (BASELINE.md
# r3 "decontam_scale", with the O(k) transform/slice string rewrite
# measured 3.5× SLOWER — interpreted lambda).  The real fix: consumers
# that only need shingle IDENTITY (set membership) get a 62-bit shingle
# id built incrementally from per-word hashes — one md5 per WORD, then
# k-1 zip_with steps of pure integer arithmetic per lane, zero string
# allocation, and the exploded join key is a long, not a ~50-byte
# string.  Two independent 31-bit lanes (hash60 / hash60b word hashes —
# ONE md5, two hex ranges — with different polynomial bases) combine as
# ``h1 * 2^31 + h2``: every intermediate stays < 2^62, so ANSI-mode
# long arithmetic cannot overflow, and the collision rate is 2^-62 per
# shingle pair.  DuckDB rendering is the same recurrence unrolled, so
# the oracle stays value-exact by construction.

SHINGLE_B1 = 1_000_003       # polynomial bases, both < P so a*B+b < 2^62
SHINGLE_B2 = 16_777_619


def _rolling_lane(hs: Column, k: int, m: Column, base: int) -> Column:
    """acc_i = fold over j of (acc*B + h[i+j]) % P, skipping the
    null-padding past a short text's end (mirrors concat_ws skipping
    nulls in the string kernel, so truncated-shingle semantics match
    word_shingles exactly)."""
    acc = F.slice(hs, 1, m)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(hs, 1 + j, m),
            lambda a, b: F.when(b.isNull(), a)
                          .otherwise(F.pmod(a * base + b, F.lit(MINHASH_P))))
    return acc


def word_shingle_ids(col: Column, k: int = 8) -> Column:
    """Distinct 62-bit k-word shingle ids (array<long>) — the
    identity-only twin of :func:`word_shingles` for k ≥ 5 consumers
    (decontamination, overlap counting).  Same tokenization, same
    truncated-shingle clamping for short texts; the value is a hash,
    not the shingle text.

    SCALE WARNING: as a single Column expression, the per-word hash
    transforms are re-inlined into every one of the k slice references
    (codegen subexpression elimination skips lambda-bearing
    expressions), so this form computes ~2k md5 passes per row —
    measured 5× SLOWER than the string kernel at k=8/100k docs.  Hot
    paths must use :func:`shingle_id_rows`, which materializes the
    hash-lane arrays as attributes across projection boundaries
    (CollapseProject keeps non-cheap aliases referenced more than once
    un-inlined).  This Column form stays for tests and small fixtures
    where composability beats throughput."""
    w = words(col)
    m = F.greatest(F.size(w) - (k - 1), F.lit(1))
    h1 = F.transform(w, lambda s: hash60(s) % MINHASH_P)
    h2 = F.transform(w, lambda s: hash60b(s) % MINHASH_P)
    lane1 = _rolling_lane(h1, k, m, SHINGLE_B1)
    lane2 = _rolling_lane(h2, k, m, SHINGLE_B2)
    combined = F.zip_with(lane1, lane2,
                          lambda a, b: a * F.lit(1 << 31).cast("long") + b)
    return F.array_distinct(combined)


def shingle_id_arrays(df: DataFrame, k: int = 8, text_col: str = "text",
                      keep: list[str] | None = None,
                      out_col: str = "_ids") -> DataFrame:
    """``keep`` columns + ``out_col``: the distinct rolling-hash
    shingle-id ARRAY per row, built through stacked projections (words
    → per-word hash lanes → rolling fold).  Each stage's arrays become
    plan ATTRIBUTES, so the k slice references in the fold read a
    materialized array instead of re-evaluating the md5 transform —
    the difference is ~2k md5 passes vs 2 per row (measured 100.7 s vs
    8.5 s; BASELINE.md round-4 decontam_scale).  Works on streaming
    DataFrames too (pure stateless projections)."""
    keep_cols = [F.col(c) for c in (keep or [])]
    wdf = df.select(*keep_cols, words(F.col(text_col)).alias("_w"))
    hdf = wdf.select(
        *keep_cols,
        F.transform(F.col("_w"), lambda s: hash60(s) % MINHASH_P).alias("_h1"),
        F.transform(F.col("_w"), lambda s: hash60b(s) % MINHASH_P).alias("_h2"))
    m = F.greatest(F.size(F.col("_h1")) - (k - 1), F.lit(1))
    lane1 = _rolling_lane(F.col("_h1"), k, m, SHINGLE_B1)
    lane2 = _rolling_lane(F.col("_h2"), k, m, SHINGLE_B2)
    combined = F.array_distinct(
        F.zip_with(lane1, lane2,
                   lambda a, b: a * F.lit(1 << 31).cast("long") + b))
    return hdf.select(*keep_cols, combined.alias(out_col))


def shingle_id_rows(df: DataFrame, k: int = 8, text_col: str = "text",
                    id_col: str | None = "doc_id",
                    out_col: str = "shingle") -> DataFrame:
    """Exploded (``id_col``?, ``out_col``) rolling-hash shingle rows —
    the THROUGHPUT form of :func:`word_shingle_ids` (bit-identical
    output).

    The explode must sit in the SAME select as the fold (not over
    :func:`shingle_id_arrays` + a second select): with an intermediate
    ``_ids`` projection, ``InferFiltersFromGenerate`` synthesizes a
    ``size(_ids) > 0`` predicate from the explode and pushes it through
    the projection, inlining the entire fold — hash transforms
    included — into the Filter (measured: 32 md5 evaluations per row
    in the filter alone; pinned by the plan test)."""
    ids = [F.col(id_col)] if id_col else []
    wdf = df.select(*ids, words(F.col(text_col)).alias("_w"))
    hdf = wdf.select(
        *ids,
        F.transform(F.col("_w"), lambda s: hash60(s) % MINHASH_P).alias("_h1"),
        F.transform(F.col("_w"), lambda s: hash60b(s) % MINHASH_P).alias("_h2"))
    m = F.greatest(F.size(F.col("_h1")) - (k - 1), F.lit(1))
    lane1 = _rolling_lane(F.col("_h1"), k, m, SHINGLE_B1)
    lane2 = _rolling_lane(F.col("_h2"), k, m, SHINGLE_B2)
    combined = F.array_distinct(
        F.zip_with(lane1, lane2,
                   lambda a, b: a * F.lit(1 << 31).cast("long") + b))
    return hdf.select(*ids, F.explode(combined).alias(out_col))


def shingle_id_lanes_sql(text_expr: str) -> tuple[str, str]:
    """The two per-word hash-lane arrays as DuckDB expressions — bind
    them ONCE per row (``SELECT ... AS h1, ... AS h2``) and feed the
    column names to :func:`shingle_ids_over_sql`, so the md5 arrays
    are not recomputed per unrolled term."""
    w = WORDS_SQL.format(t=text_expr)
    return (f"[{hash60_sql('s')} % {MINHASH_P} for s in {w}]",
            f"[{hash60b_sql('s')} % {MINHASH_P} for s in {w}]")


def shingle_ids_over_sql(h1_col: str = "h1", h2_col: str = "h2",
                         k: int = 8) -> str:
    """DuckDB rendering of :func:`word_shingle_ids` over pre-bound lane
    columns: the identical two-lane recurrence unrolled per shingle
    index (list indexing past the end yields NULL, skipped exactly like
    the Spark lane's null-padding guard)."""

    def lane(arr: str, base: int) -> str:
        acc = f"{arr}[i]"
        for j in range(1, k):
            nxt = f"{arr}[i+{j}]"
            acc = (f"(CASE WHEN {nxt} IS NULL THEN {acc} "
                   f"ELSE ({acc} * {base} + {nxt}) % {MINHASH_P} END)")
        return acc

    body = (f"({lane(h1_col, SHINGLE_B1)}) * {1 << 31} "
            f"+ ({lane(h2_col, SHINGLE_B2)})")
    return (f"list_distinct([{body} "
            f"for i in range(1, greatest(len({h1_col})-{k - 1}, 1) + 1)])")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per distinct text (hash-groupBy — one
    shuffle, partial agg JVM-side). Output: (doc_id, text_md5,
    group_size)."""
    return (docs
            .select(F.col(id_col), F.md5(F.encode(F.col(text_col), "utf-8")).alias("text_md5"))
            .groupBy("text_md5")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("group_size"))
            .select(id_col, "text_md5", "group_size"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_P = (1 << 31) - 1  # Mersenne prime; A*h + B stays < 2^62


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients (A_i, B_i), A_i != 0,
    identical literals on the Spark and DuckDB sides."""
    out = []
    x = 88172645463325252  # xorshift64 seed (public-domain Marsaglia PRNG)
    for _ in range(num_hashes):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        a = x % (MINHASH_P - 1) + 1
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        b = x % MINHASH_P
        out.append((a, b))
    return out


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, k: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       pre_shingled: bool = False) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles s of
    (A_i * h(s) + B_i) mod P, h = md5-derived base hash mod P — pure
    Catalyst, no UDF.

    The base hash is computed ONCE per shingle in its own projection
    (md5 is the expensive part; the num_hashes permutations are integer
    arithmetic over the materialized hash array — the classic
    one-hash+affine-permutations MinHash construction)."""
    shingles = (F.col(text_col) if pre_shingled
                else word_shingles(F.col(text_col), k))
    hs = F.transform(shingles, lambda s: hash60(s) % MINHASH_P)
    hashed = docs.select(F.col(id_col), hs.alias("_hs"))
    def perm(a: int, b: int):
        # keep arity 1 — transform() binds extra params to the array index
        return lambda h: (a * h + b) % MINHASH_P

    sigs = F.array(*[F.array_min(F.transform(F.col("_hs"), perm(a, b)))
                     for a, b in minhash_coeffs(num_hashes)])
    return hashed.select(F.col(id_col), sigs.alias("sig"))


def minhash_sql(num_hashes: int, source: str = "documents", where: str = "",
                text_expr: str = "text", id_col: str = "doc_id", k: int = 3) -> str:
    """DuckDB rendering of :func:`minhash_signatures` (one s{i} column
    per hash) — the independent oracle for the one-hash+affine scheme."""
    hs = f"[{hash60_sql('s')} % {MINHASH_P} for s in {shingles_sql(text_expr, k)}]"
    sigs = ", ".join(
        f"list_min([({a}*h+{b})%{MINHASH_P} for h in hs]) AS s{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes)))
    return (f"SELECT {id_col}, {sigs} FROM "
            f"(SELECT {id_col}, {hs} AS hs FROM {source} {where})")


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 8, k: int = 3,
                      threshold: float = 0.5, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs: band the signature, bucket-join on
    band-hash, then verify candidates with EXACT shingle Jaccard (so
    output is exact given LSH recall; bands/rows tune the recall/cost
    point). Output: (doc_a, doc_b, jaccard).

    Scale shape: exact duplicates are collapsed FIRST (one
    representative per distinct text), so the signature/bucket/verify
    pipeline runs over distinct texts only — a web corpus is ~30-50%
    exact dups, and without the collapse every exact-dup cluster of
    size d costs d² candidate verifications per colliding band.
    Representative-level pairs expand back to member pairs at the end
    (identical texts share every shingle, so rep-level Jaccard IS
    member-level Jaccard), and intra-cluster pairs are emitted directly
    with Jaccard 1.0 — recall 1 for exact dups, better than banding
    them.  The shingle array is computed once and reused for both the
    signatures and the verification join; band keys are ``xxhash64``
    longs (cheap shuffle keys — a false collision just adds one
    candidate that exact verification removes)."""
    rows_per_band = num_hashes // bands
    members = docs.select(F.col(id_col),
                          F.md5(F.encode(F.col(text_col), "utf-8")).alias("_t"))
    reps = members.groupBy("_t").agg(F.min(id_col).alias(id_col))
    rep_docs = reps.join(docs.select(id_col, text_col), id_col)
    # localCheckpoint: the shingle table feeds three plan subtrees
    # (signatures + both verify sides) and the banded keys two (the
    # self-join); without materialization each reference recomputes the
    # whole md5/shingle branch — measured 7x on a 200k-doc corpus.
    # Checkpoint blocks are released when the DataFrames go out of scope.
    sh = rep_docs.select(F.col(id_col),
                         word_shingles(F.col(text_col), k).alias("sh")) \
        .localCheckpoint(eager=True)

    sigs = minhash_signatures(sh.select(id_col, F.col("sh").alias("_sh")),
                              num_hashes, k, text_col="_sh", id_col=id_col,
                              pre_shingled=True)
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.xxhash64(F.lit(b), *[F.col("sig")[b * rows_per_band + r]
                                   for r in range(rows_per_band)])
            for b in range(bands)])).alias("key")) \
        .localCheckpoint(eager=True)
    cand = (banded.alias("a").join(banded.alias("b"),
                                   (F.col("a.key") == F.col("b.key"))
                                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    # shuffle_hash hints: the shingle table is wide (one array per doc),
    # so letting a generous local autoBroadcastJoinThreshold collect it
    # to the driver costs more than the hash shuffle it saves (measured
    # 7.2s -> 6.3s at sf0.1) — and at corpus scale the shingle side is
    # never broadcastable anyway, so this keeps the small-scale plan
    # identical in shape to the at-scale one.
    joined = (cand
              .join(sh.select(F.col(id_col).alias("doc_a"),
                              F.col("sh").alias("sh_a")).hint("shuffle_hash"), "doc_a")
              .join(sh.select(F.col(id_col).alias("doc_b"),
                              F.col("sh").alias("sh_b")).hint("shuffle_hash"), "doc_b"))
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard")
    rep_pairs = (joined.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
                 .filter(F.col("jaccard") >= threshold))

    # expand representative pairs to member pairs + intra-cluster pairs
    m = (members.alias("mm")
         .join(reps.select("_t", F.col(id_col).alias("_rep")), "_t")
         .select(F.col(f"mm.{id_col}").alias("_m"), "_rep")
         .localCheckpoint(eager=True))  # referenced by 4 subtrees below
    cross = (rep_pairs
             .join(m.select(F.col("_rep").alias("doc_a"), F.col("_m").alias("_ma")), "doc_a")
             .join(m.select(F.col("_rep").alias("doc_b"), F.col("_m").alias("_mb")), "doc_b")
             .select(F.least("_ma", "_mb").alias("doc_a"),
                     F.greatest("_ma", "_mb").alias("doc_b"), "jaccard"))
    intra = (m.alias("x").join(m.alias("y"),
                               (F.col("x._rep") == F.col("y._rep"))
                               & (F.col("x._m") < F.col("y._m")))
             .select(F.col("x._m").alias("doc_a"), F.col("y._m").alias("doc_b"),
                     F.lit(1.0).alias("jaccard")))
    return cross.unionByName(intra)


def minhash_lsh_join(left: DataFrame, right: DataFrame,
                     num_hashes: int = 16, bands: int = 8, k: int = 3,
                     threshold: float = 0.5, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """CROSS-corpus near-duplicate join — the incremental-crawl shape:
    which documents of a new crawl (``left``) near-duplicate documents
    already in the corpus (``right``)?  Output: (left_id, right_id,
    jaccard) for every cross pair with exact shingle Jaccard >=
    ``threshold`` that collides in >= 1 LSH band.

    Same banded construction as :func:`minhash_lsh_pairs` but the
    bucket join is left-bands x right-bands, so neither corpus ever
    self-joins and the candidate volume is driven by CROSS collisions
    only.  Identical texts across the sides share every band a
    fortiori (recall 1 for exact cross-dups).  Exact-dup collapse
    WITHIN each side is deliberately not built in — compose with
    :func:`exact_dedup` per corpus first, which a production pipeline
    does anyway; this keeps the operator a pure join.

    Scale: only ids + 64-bit band keys shuffle for candidates; the
    shingle arrays shuffle once per side for verification
    (shuffle_hash — never driver-collected, same rationale as the
    self-join)."""
    rows_per_band = num_hashes // bands

    def prep(docs, side):
        sh = (docs.select(F.col(id_col).alias(f"{side}_id"),
                          word_shingles(F.col(text_col), k).alias(f"sh_{side}"))
                  .localCheckpoint(eager=True))   # feeds banding + verify
        sigs = minhash_signatures(
            sh.select(F.col(f"{side}_id").alias(id_col),
                      F.col(f"sh_{side}").alias("_sh")),
            num_hashes, k, text_col="_sh", id_col=id_col, pre_shingled=True)
        banded = sigs.select(
            F.col(id_col).alias(f"{side}_id"),
            F.explode(F.array(*[
                F.xxhash64(F.lit(b), *[F.col("sig")[b * rows_per_band + r]
                                       for r in range(rows_per_band)])
                for b in range(bands)])).alias("key"))
        return sh, banded

    sh_l, banded_l = prep(left, "left")
    sh_r, banded_r = prep(right, "right")
    cand = (banded_l.join(banded_r, "key")
            .select("left_id", "right_id")
            .dropDuplicates(["left_id", "right_id"]))
    joined = (cand.join(sh_l.hint("shuffle_hash"), "left_id")
                  .join(sh_r.hint("shuffle_hash"), "right_id"))
    jac = (F.size(F.array_intersect("sh_left", "sh_right"))
           / F.size(F.array_union("sh_left", "sh_right")))
    return (joined.select("left_id", "right_id",
                          F.round(jac, 6).alias("jaccard"))
                  .filter(F.col("jaccard") >= threshold))


def minhash_lsh_join_sql(num_hashes: int = 16, bands: int = 8, k: int = 3,
                         threshold: float = 0.5,
                         left_source: str = "documents",
                         right_source: str = "documents",
                         text_expr: str = "text",
                         id_col: str = "doc_id") -> str:
    """DuckDB lockstep oracle for :func:`minhash_lsh_join` (band
    equality on the signature values directly, as in
    :func:`minhash_lsh_sql`)."""
    rows_per_band = num_hashes // bands
    sh = shingles_sql(text_expr, k)
    band_conds = " OR ".join(
        "(" + " AND ".join(f"a.s{b * rows_per_band + r} = b.s{b * rows_per_band + r}"
                           for r in range(rows_per_band)) + ")"
        for b in range(bands))
    sig_l = minhash_sql(num_hashes, source=left_source, text_expr=text_expr,
                        id_col=id_col, k=k)
    sig_r = minhash_sql(num_hashes, source=right_source, text_expr=text_expr,
                        id_col=id_col, k=k)
    return f"""
WITH sh_l AS (SELECT {id_col} AS left_id, {sh} AS sh FROM {left_source}),
sh_r AS (SELECT {id_col} AS right_id, {sh} AS sh FROM {right_source}),
sig_l AS ({sig_l}),
sig_r AS ({sig_r}),
cand AS (
  SELECT DISTINCT a.{id_col} AS left_id, b.{id_col} AS right_id
  FROM sig_l a JOIN sig_r b ON ({band_conds})),
pairs AS (
  SELECT c.left_id, c.right_id,
         round(len(list_intersect(x.sh, y.sh)) * 1.0
               / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
  FROM cand c JOIN sh_l x USING (left_id) JOIN sh_r y USING (right_id))
SELECT * FROM pairs WHERE jaccard >= {threshold}"""


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold via inverted-index
    self-join: explode shingles, join on shingle, count shared, divide
    by union size. The small-scale oracle for the LSH path."""
    sh = docs.select(F.col(id_col), word_shingles(F.col(text_col), k).alias("sh"))
    sizes = sh.select(id_col, F.size("sh").alias("n"))
    inv = sh.select(id_col, F.explode("sh").alias("g"))
    shared = (inv.alias("a").join(inv.alias("b"),
                                  (F.col("a.g") == F.col("b.g"))
                                  & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
              .agg(F.count("*").alias("c")))
    out = (shared
           .join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na")), "doc_a")
           .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb")), "doc_b")
           .select("doc_a", "doc_b",
                   F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6).alias("jaccard")))
    return out.filter(F.col("jaccard") >= threshold)


def minhash_lsh_sql(num_hashes: int = 16, bands: int = 8, k: int = 3,
                    threshold: float = 0.5, source: str = "documents",
                    text_expr: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB lockstep oracle for :func:`minhash_lsh_pairs` — the FULL
    pipeline, not just the exact-Jaccard twin: exact-dup collapse,
    one-hash+affine MinHash signatures (shared literals via
    :func:`minhash_coeffs`), banded candidates, exact shingle-Jaccard
    verification, member expansion.  Banding compares the
    rows-per-band signature values directly where Spark joins on an
    ``xxhash64`` of them — identical candidate sets unless xxhash64
    produces a cross-band 64-bit collision whose pair ALSO passes exact
    verification (~2⁻⁶⁴ per candidate; the driver hash would surface
    it).  This upgrades the round-3 rows-only gate to value-exact
    (VERDICT.md r3 next-round item #5)."""
    rows_per_band = num_hashes // bands
    sh = shingles_sql(text_expr, k)
    band_conds = " OR ".join(
        "(" + " AND ".join(f"a.s{b * rows_per_band + r} = b.s{b * rows_per_band + r}"
                           for r in range(rows_per_band)) + ")"
        for b in range(bands))
    sigs = minhash_sql(num_hashes, source="rep_docs", text_expr=text_expr,
                       id_col=id_col, k=k)
    return f"""
WITH members AS (SELECT {id_col}, md5({text_expr}) AS t FROM {source}),
reps AS (SELECT t, min({id_col}) AS {id_col} FROM members GROUP BY t),
rep_docs AS (SELECT r.{id_col}, d.{text_expr}
             FROM reps r JOIN {source} d USING ({id_col})),
sh AS (SELECT {id_col}, {sh} AS sh FROM rep_docs),
sigs AS ({sigs}),
cand AS (
  SELECT DISTINCT a.{id_col} AS doc_a, b.{id_col} AS doc_b
  FROM sigs a JOIN sigs b ON a.{id_col} < b.{id_col} AND ({band_conds})),
rep_pairs AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_intersect(x.sh, y.sh)) * 1.0
               / len(list_distinct(x.sh || y.sh)), 6) AS jaccard
  FROM cand c JOIN sh x ON x.{id_col} = c.doc_a
              JOIN sh y ON y.{id_col} = c.doc_b),
rp AS (SELECT * FROM rep_pairs WHERE jaccard >= {threshold}),
m AS (SELECT mm.{id_col} AS m, r.{id_col} AS rep
      FROM members mm JOIN reps r ON mm.t = r.t),
cross_p AS (
  SELECT least(ma.m, mb.m) AS doc_a, greatest(ma.m, mb.m) AS doc_b, p.jaccard
  FROM rp p JOIN m ma ON ma.rep = p.doc_a JOIN m mb ON mb.rep = p.doc_b),
intra AS (
  SELECT x.m AS doc_a, y.m AS doc_b, 1.0 AS jaccard
  FROM m x JOIN m y ON x.rep = y.rep AND x.m < y.m)
SELECT * FROM cross_p UNION ALL SELECT * FROM intra"""


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def duplicate_clusters(pairs: DataFrame, universe: DataFrame | None = None,
                       a_col: str = "doc_a", b_col: str = "doc_b",
                       id_col: str = "doc_id", max_iterations: int = 50) -> DataFrame:
    """Connected components over near-duplicate pairs → duplicate
    clusters: (doc_id, cluster_id) with cluster_id = min doc id in the
    component.  Feed it pairs from :func:`minhash_lsh_pairs`,
    :func:`simhash_neardup_pairs` or embedding near-dups; dedup keeps
    one representative per cluster (``doc_id == cluster_id``).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is two shuffles (groupBy min + join) of pure DataFrame ops,
    converging in O(log n) rounds; near-dup clusters are shallow, so
    2-3 rounds in practice.  ``localCheckpoint`` truncates lineage each
    round so plans don't grow with iteration count — the standard
    iterative-algorithm hygiene at cluster scale.

    ``universe`` (any DataFrame with ``id_col``) adds singleton
    clusters for ids that appear in no pair.
    """
    e = (pairs.select(F.col(a_col).cast("long").alias("u"),
                      F.col(b_col).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct())

    def _sym(df):  # both orientations
        return df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _large_star(df):
        # per node u over symmetric neighborhood: attach strictly-larger
        # neighbors to min(N(u) ∪ {u})
        s = _sym(df)
        m = (s.groupBy("u").agg(F.min("v").alias("mv"))
             .select("u", F.least("mv", "u").alias("m")))
        return (s.join(m, "u").filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v")).distinct())

    def _small_star(df):
        # orient edges large→small, then attach all smaller neighbors
        # (and u itself) to the minimum
        o = df.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m = (o.groupBy("u").agg(F.min("v").alias("mv"))
             .select("u", F.least("mv", "u").alias("m")))
        s = o.join(m, "u")
        out = (s.select(F.col("v").alias("u"), F.col("m").alias("v"))
               .unionByName(s.select("u", F.col("m").alias("v"))))
        return out.filter(F.col("u") != F.col("v")).distinct()

    def _fingerprint(df):
        # order-insensitive edge-set fingerprint: one cheap aggregation
        # instead of an exceptAll shuffle per round (edges are distinct,
        # so equal (count, hash-sum) pairs identify the set up to a
        # ~2^-64-per-round hash-sum collision — accepted odds for an
        # iteration-control check)
        h = F.xxhash64("u", "v")
        # two bounded residues, not the raw 64-bit sum (ANSI overflow)
        row = df.agg(F.count("*").alias("n"),
                     F.sum(F.pmod(h, F.lit(1_000_000_007))).alias("h1"),
                     F.sum(F.pmod(F.shiftright(h, 31), F.lit(998_244_353))).alias("h2")
                     ).collect()[0]
        return row["n"], row["h1"], row["h2"]

    fp = None
    converged = False
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # converged when every edge already points node→component-min:
        # large-star + small-star is then the identity on the edge set
        fp2 = _fingerprint(e)
        if fp2 == fp:
            converged = True
            break
        fp = fp2
    if not converged:
        # round-2 (advisor): exhausting max_iterations without the
        # fixpoint silently returned possibly under-merged clusters —
        # surface it loudly; O(log n) convergence means hitting this
        # indicates pathological input (or max_iterations set too low),
        # not normal operation
        raise RuntimeError(
            f"duplicate_clusters did not converge within {max_iterations} "
            "large-star/small-star rounds; clusters may be under-merged. "
            "Raise max_iterations (components converge in O(log n) rounds).")

    members = _sym(e).groupBy("u").agg(F.min("v").alias("m"))
    comp = (members.select(F.col("u").alias(id_col),
                           F.least("m", "u").alias("cluster_id")))
    if universe is not None:
        comp = (universe.select(F.col(id_col).cast("long").alias(id_col)).distinct()
                .join(comp, id_col, "left")
                .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")))
    return comp


def duplicate_clusters_sql(pairs_sql: str, universe_sql: str,
                           a_col: str = "doc_a", b_col: str = "doc_b",
                           id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`duplicate_clusters`: transitive closure
    by recursive CTE (UNION dedups, so it terminates), then
    cluster_id = min reachable id.  Quadratic per component — oracle
    scale only."""
    return f"""
WITH RECURSIVE
base AS ({pairs_sql}),
edges AS (SELECT {a_col} AS u, {b_col} AS v FROM base
          UNION SELECT {b_col}, {a_col} FROM base),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u WHERE e.v != r.a
),
comp AS (SELECT a AS {id_col}, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
SELECT u.{id_col}, coalesce(c.cluster_id, u.{id_col}) AS cluster_id
FROM ({universe_sql}) u LEFT JOIN comp c USING ({id_col})"""


def cluster_keepers(members: DataFrame, scores: DataFrame,
                    id_col: str = "doc_id", cluster_col: str = "cluster_id",
                    score_col: str = "score") -> DataFrame:
    """Quality-aware dedup keeper selection: given cluster assignments
    (:func:`duplicate_clusters` output) and a per-doc score, keep the
    HIGHEST-scoring member of each cluster (tie → smallest id) instead
    of the min-id convention — "dedup, but keep the best copy", the
    form production pipelines actually want (pair it with
    ``textstats.quality_score`` / ``gopher_quality``).  Output:
    (doc_id, cluster_id, keep BOOLEAN) — one row per scored member.

    Scale + skew (the 100 TB test): NOT a row_number window — a
    boilerplate mega-cluster (a license page duplicated 10^8 times)
    would sort one hot partition.  Instead the keeper is an argmax by
    struct-max AGGREGATION — max(struct(score, -id)) — whose partial
    aggregation collapses every cluster to one row map-side before the
    shuffle (the dup_span_stats singleton-counting philosophy), then
    one equi-join back (broadcast while the cluster table fits, AQE
    skew-split beyond).  Determinism: keep is pure integer/ordering
    comparison; feed an integer score (micro-units) so two engines
    cannot disagree on ties — the contract every oracle here follows.

    Members without a score row are dropped (inner join): score the
    corpus first, or outer-join a floor score upstream if unscored
    docs must survive."""
    m = (members.select(F.col(id_col).cast("long").alias("__id"),
                        F.col(cluster_col).alias("__cl"))
                .join(scores.select(F.col(id_col).cast("long").alias("__id"),
                                    F.col(score_col).alias("__s")), "__id"))
    best = (m.groupBy("__cl")
             .agg(F.max(F.struct(F.col("__s").alias("s"),
                                 (-F.col("__id")).alias("ni"))).alias("b")))
    return (m.join(best, "__cl")
             .select(F.col("__id").alias(id_col),
                     F.col("__cl").alias(cluster_col),
                     ((F.col("__s") == F.col("b.s"))
                      & (F.col("__id") == -F.col("b.ni"))).alias("keep")))


def cluster_keepers_sql(members_sql: str, scores_sql: str,
                        id_col: str = "doc_id",
                        cluster_col: str = "cluster_id",
                        score_col: str = "score") -> str:
    """DuckDB rendering of :func:`cluster_keepers` (max score per
    cluster, min id among the maximal — the same argmax semantics
    without the struct encoding)."""
    return f"""
WITH m AS (SELECT mm.{id_col}, mm.{cluster_col}, ss.{score_col}
           FROM ({members_sql}) mm JOIN ({scores_sql}) ss
           USING ({id_col})),
b AS (SELECT {cluster_col}, max({score_col}) AS bs
      FROM m GROUP BY {cluster_col}),
k AS (SELECT m.{cluster_col}, min(m.{id_col}) AS kid
      FROM m JOIN b ON m.{cluster_col} = b.{cluster_col}
                    AND m.{score_col} = b.bs
      GROUP BY m.{cluster_col})
SELECT m.{id_col}, m.{cluster_col}, m.{id_col} = k.kid AS keep
FROM m JOIN k ON m.{cluster_col} = k.{cluster_col}"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = 64, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash over distinct lowercase tokens: bit j is set when the
    sum over tokens of ±1 (by token-hash bit j) is positive.  Output
    (doc_id, simhash).

    Computed ROW-LOCALLY via :func:`simhash_expr` (higher-order array
    fold) — zero shuffle, zero aggregation state.  The older
    explode + 64-buffer groupBy formulation amplified the table by
    ~tokens-per-doc and SHUFFLED it just to re-aggregate to the
    document each token came from; the row-local fold is bit-identical
    (same token split, md5 lanes, ±1 votes — integer sums in the same
    order, pinned by the streaming parity tests) and measured ~9%
    faster at sf0.1 under honest noop-write forcing (2.36 s vs
    2.57 s — the md5-per-token dominates both forms).  The at-scale
    win is the removed exchange: per-token rows never leave their
    partition, and every downstream near-dup pass starts shuffle-free.

    Default 64 bits (round-2 verdict #8: 32 bits is collision-prone at
    10¹² docs — a random pair lands within hamming 3 of a 32-bit hash
    with p ≈ 5,489/2³² ≈ 1.3e-6, i.e. ~10¹⁸ false candidate pairs at
    corpus scale; at 64 bits p ≈ 4.4e-15).  Bits 0-59 vote from
    :func:`hash60`, bits 60+ from :func:`hash60b` — the same md5, so
    the widening is hash-cost-free.  Bit 63 is the long's sign bit;
    64-bit simhashes are therefore signed values."""
    return docs.select(F.col(id_col),
                       simhash_expr(F.col(text_col), bits).alias("simhash"))


def simhash_expr(text: Column, bits: int = 64) -> Column:
    """Row-local SimHash as a pure Catalyst expression — no shuffle, no
    aggregation state, so it runs on STREAMING rows (append mode) and
    is bit-identical to :func:`simhash` (same token split, same md5
    hash60, same ±1 bit votes; pinned by tests).

    One aggregate pass accumulates the per-bit ±1 votes as an INT
    array (``zip_with`` against the bit-mask literal array), then one
    fold combines votes into the hash — instead of ``bits`` separate
    aggregate passes over the token array.  Same integer sums in the
    same per-token order (integer addition is exact), so bit-identical
    to the old expansion — but the expression tree is ~11x smaller
    (15.4k → 1.4k optimized-plan chars at 32 bits), which matters for
    codegen/JIT time in streaming micro-batches."""
    toks = F.array_distinct(words(text))
    # one md5 per token (its own transform pass — a lambda has no
    # let-binding, and inlining hash60+hash60b would hash twice), both
    # 60-bit lanes conv'd from it in a second pass
    mds = F.transform(toks, lambda t: F.md5(F.encode(t, "utf-8")))
    if bits > 60:
        hs = F.transform(mds, lambda md: F.struct(
            F.conv(F.substring(md, 1, 15), 16, 10).cast("long").alias("h0"),
            F.conv(F.substring(md, 17, 15), 16, 10).cast("long").alias("h1")))
    else:
        hs = F.transform(mds, lambda md: F.struct(
            F.conv(F.substring(md, 1, 15), 16, 10).cast("long").alias("h0"),
            F.lit(0).cast("long").alias("h1")))
    # per-bit mask + which lane it reads (blk 0: bits 0-59, blk 1: 60+)
    masks = F.array(*[F.struct(F.lit(j // 60).alias("blk"),
                               F.lit(1 << (j % 60)).cast("long").alias("bit"))
                      for j in range(bits)])
    votes = F.aggregate(
        hs, F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(
                F.when(m.getField("blk") == 0, h.getField("h0"))
                .otherwise(h.getField("h1")).bitwiseAND(m.getField("bit")) != 0,
                F.lit(1)).otherwise(F.lit(-1))))
    bitvals = F.array(*[_bit_lit(j) for j in range(bits)])
    terms = F.zip_with(votes, bitvals,
                       lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")))
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance via bit_count(xor) — for simhash near-dup
    banding."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_sql(source: str = "documents", where: str = "", bits: int = 64,
                text_expr: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB rendering of :func:`simhash` (bit parity, incl. the
    two-lane md5 split and the signed bit-63 literal)."""
    tok = f"list_distinct({WORDS_SQL.format(t=text_expr)})"
    h0, h1 = hash60_sql("t"), hash60b_sql("t")
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h{j // 60} & {1 << (j % 60)}) != 0 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits))
    bit_comb = " + ".join(f"CASE WHEN b{j} > 0 THEN CAST({_bit_lit_sql(j)} AS BIGINT) "
                          f"ELSE 0 END" for j in range(bits))
    return (f"WITH toks AS (SELECT {id_col}, {h0} AS h0, {h1} AS h1 FROM "
            f"(SELECT {id_col}, unnest({tok}) AS t FROM {source} {where})), "
            f"agg AS (SELECT {id_col}, {bit_sums} FROM toks GROUP BY {id_col}) "
            f"SELECT {id_col}, CAST({bit_comb} AS BIGINT) AS simhash FROM agg")


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 64,
                          bands: int = 4, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """SimHash near-duplicate pairs: band the hash into ``bands`` equal
    slices, bucket-join on (band, slice), verify candidates with exact
    Hamming distance.  Recall is EXACT (pigeonhole) when
    ``max_hamming < bands`` — at most max_hamming bands can differ, so
    at least one band matches.  Output: (doc_a, doc_b, hamming).

    NULL/empty-text docs are EXCLUDED: they all produce the identical
    ''-token simhash and would pair quadratically at hamming 0 (they
    are exact duplicates — :func:`exact_dedup`'s job, not near-dup's).
    :func:`~pandarus_spark.streaming.stream.stream_simhash_neardup`
    applies the same predicate, so batch and streaming agree on
    NULL-heavy pages tables (round-2 advice)."""
    assert max_hamming < bands, "pigeonhole exactness needs max_hamming < bands"
    width = bits // bands
    mask = (1 << width) - 1
    docs = docs.filter(F.length(nz(F.col(text_col))) > 0)
    # materialize the (id, simhash) table once: both self-join sides
    # read it, and since the row-local simhash has no exchange to be
    # reused, an un-checkpointed plan would hash every document twice
    # (same discipline as minhash_lsh_pairs' shared shingle table)
    sh = simhash(docs, bits, text_col, id_col).localCheckpoint(eager=True)
    banded = sh.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("key"))
            for b in range(bands)])).alias("bk")) \
        .select(id_col, "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    return (cand.select("doc_a", "doc_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# line-level (paragraph) dedup — CCNet-style
# ---------------------------------------------------------------------------

def line_dedup(docs: DataFrame, min_count: int = 2, delim: str = "\n",
               text_col: str = "text", id_col: str = "doc_id",
               scope: str = "corpus") -> DataFrame:
    """Corpus-wide line/paragraph-level exact dedup (the CCNet recipe:
    boilerplate — headers, cookie banners, navigation — repeats across
    pages even when whole documents don't).  Every line whose trimmed
    text occurs ``min_count``-or-more times corpus-wide is dropped from
    every document EXCEPT its globally-first occurrence (ordered by
    (doc_id, line_no) — deterministic, engine-independent).  Output:
    (doc_id, n_lines, n_kept, kept_md5) where kept_md5 hashes the
    surviving lines re-joined with ``delim`` in original order.

    Plan shape (the 100 TB story): posexplode is partition-local; ONE
    window shuffle on the line hash ranks occurrences (partial top-1
    per partition does not apply to rank, but the key is the md5 —
    uniform, no skew); ONE groupBy shuffle on doc_id rebuilds
    documents.  Nothing touches the driver, no joins at all — the
    occurrence rank and the corpus-wide count come from the same
    window partition.

    Empty lines count like any line (a duplicated blank line drops);
    NULL text ≡ '' (one empty line).

    ``scope="doc"`` restricts counting and ranking to within each
    document (in-document repetition stripping — a line repeated
    across documents is untouched); the window key gains the doc id,
    so the shuffle count and skew profile are unchanged."""
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be 'corpus' or 'doc', got {scope!r}")
    lines = (docs.select(F.col(id_col),
                         F.posexplode(F.split(nz(F.col(text_col)), delim))
                         .alias("line_no", "line")))
    h = F.md5(F.encode(F.trim(F.col("line")), "utf-8"))
    keys = ["h"] if scope == "corpus" else [id_col, "h"]
    wcnt = Window.partitionBy(*keys)
    wrank = (Window.partitionBy(*keys)
             .orderBy(F.col(id_col).asc(), F.col("line_no").asc()))
    ranked = (lines.withColumn("h", h)
              .withColumn("occ", F.count("*").over(wcnt))
              .withColumn("rank", F.row_number().over(wrank)))
    kept = F.when((F.col("occ") < min_count) | (F.col("rank") == 1), F.col("line"))
    return (ranked
            .select(id_col, "line_no", kept.alias("kept"))
            .groupBy(id_col)
            .agg(F.count("*").alias("n_lines"),
                 F.count("kept").alias("n_kept"),
                 F.md5(F.encode(F.array_join(
                     F.array_sort(F.collect_list(F.struct("line_no", "kept")))
                     .getField("kept"), delim), "utf-8")).alias("kept_md5")))


def line_dedup_sql(source: str = "documents", min_count: int = 2,
                   delim_sql: str = "chr(10)", text_expr: str = "text",
                   id_expr: str = "doc_id", scope: str = "corpus") -> str:
    """DuckDB rendering of :func:`line_dedup` (same window semantics;
    ``delim_sql`` is a SQL EXPRESSION — default a literal newline)."""
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be 'corpus' or 'doc', got {scope!r}")
    part = "md5(trim(line))" if scope == "corpus" else "doc_id, md5(trim(line))"
    return f"""
WITH docs_l AS (
  SELECT {id_expr} AS doc_id,
         string_split(coalesce({text_expr}, ''), {delim_sql}) AS l
  FROM {source}),
lines AS (
  SELECT doc_id, CAST(u.i - 1 AS INT) AS line_no, l[u.i] AS line
  FROM docs_l, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) u),
ranked AS (
  SELECT doc_id, line_no, line,
         count(*) OVER (PARTITION BY {part}) AS occ,
         row_number() OVER (PARTITION BY {part}
                            ORDER BY doc_id, line_no) AS rnk
  FROM lines)
SELECT doc_id, count(*) AS n_lines,
       count(CASE WHEN occ < {min_count} OR rnk = 1 THEN 1 END) AS n_kept,
       md5(coalesce(string_agg(CASE WHEN occ < {min_count} OR rnk = 1
                                    THEN line END,
                               {delim_sql} ORDER BY line_no), '')) AS kept_md5
FROM ranked GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# cross-document duplicate n-gram spans (exact-substring dedup signal)
# ---------------------------------------------------------------------------

def dup_span_stats(docs: DataFrame, k: int = 5, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document duplicated-span statistics at k-word granularity —
    the corpus-level counterpart of :func:`dup_ngram_fraction` (which is
    in-document) and the n-gram-granular analogue of suffix-array exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): a span is *duplicated* when its
    rolling-hash shingle id occurs in at least ``min_count=2`` documents
    (shingle ids are per-document distinct, so corpus count == document
    frequency).

    Returns ``(id_col, n_shingles, n_dup, dup_ppm)`` where ``dup_ppm``
    is the duplicated fraction in integer parts-per-million
    (``n_dup*1_000_000 div n_shingles`` — pure int64 arithmetic, no
    float anywhere, bit-identical on any engine).

    Scale shape — SKEW-PROOF by construction: the obvious
    count-over-window on the shingle id ships EVERY occurrence of a
    hot shingle (site boilerplate in 10⁸ documents) to one reducer
    task.  Instead ``n_dup = n_shingles − n_singletons``: the
    singleton set comes from a partial-aggregated
    ``groupBy(shingle)`` — map-side combine collapses a hot shingle
    to one row per map partition BEFORE the shuffle, so the maximum
    reducer load is O(#map partitions) regardless of how duplicated
    any shingle is — and a ``c == 1`` group's ``min(doc_id)`` IS its
    owning document, so no join back to the exploded rows is ever
    needed.  Per-doc shingle totals are map-only (``size`` of the
    distinct-id array), combined with the singleton rows through a
    union + ONE doc-keyed rollup.  Two Exchanges total (shingle agg,
    doc agg), zero Joins, zero Python.

    The shingle-id arrays feed BOTH subtrees, so they are
    ``localCheckpoint``ed once (the minhash pattern, dedup.py
    signature pipeline: measured 2.8× vs recomputing the hash kernel
    per consumer at 400k docs — 10.1 s vs 28.5 s).  The materialized
    state is ~8 bytes per shingle; at corpus scales where that storage
    exceeds executor budget, recomputation is the explicit fallback
    (drop the checkpoint call — both subtrees stay correct, the plan
    just evaluates the kernel twice).
    """
    arrs = shingle_id_arrays(docs, k=k, text_col=text_col, keep=[id_col]) \
        .localCheckpoint(eager=False)
    totals = arrs.select(F.col(id_col),
                         F.size("_ids").cast("long").alias("_ns"),
                         F.lit(0).cast("long").alias("_nu"))
    rows = arrs.select(F.col(id_col), F.explode("_ids").alias("shingle"))
    singles = (rows.groupBy("shingle")
                   .agg(F.count("*").alias("_c"), F.min(id_col).alias(id_col))
                   .filter(F.col("_c") == 1)
                   .select(F.col(id_col), F.lit(0).cast("long").alias("_ns"),
                           F.lit(1).cast("long").alias("_nu")))
    u = totals.unionByName(singles)
    return (u.groupBy(id_col)
             .agg(F.sum("_ns").alias("n_shingles"),
                  (F.sum("_ns") - F.sum("_nu")).alias("n_dup"))
             .withColumn("dup_ppm",
                         F.expr("n_dup * 1000000 div n_shingles")))


def dup_span_stats_sql(source: str = "documents", k: int = 5,
                       text_expr: str = "text",
                       id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`dup_span_stats` (lockstep rolling-hash
    shingle ids; integer-only output columns)."""
    h1, h2 = shingle_id_lanes_sql(text_expr)
    ids = shingle_ids_over_sql("h1", "h2", k)
    return f"""
WITH dsh AS (
  SELECT doc_id, unnest({ids}) AS shingle
  FROM (SELECT {id_expr} AS doc_id, {h1} AS h1, {h2} AS h2
        FROM {source}) dl),
occ AS (
  SELECT doc_id, count(*) OVER (PARTITION BY shingle) AS c
  FROM dsh)
SELECT doc_id, count(*) AS n_shingles,
       CAST(count(CASE WHEN c >= 2 THEN 1 END) AS BIGINT) AS n_dup,
       CAST(count(CASE WHEN c >= 2 THEN 1 END) AS BIGINT) * 1000000
         // count(*) AS dup_ppm
FROM occ GROUP BY doc_id"""

# ---------------------------------------------------------------------------
# cross-document duplicate-span REMOVAL (exact-substring dedup surgery)
# ---------------------------------------------------------------------------


def shingle_id_pos_arrays(df: DataFrame, k: int = 5, text_col: str = "text",
                          keep: list[str] | None = None,
                          out_col: str = "_ids") -> DataFrame:
    """POSITIONAL twin of :func:`shingle_id_arrays` — no
    ``array_distinct``, so ``out_col[i]`` is the id of the k-word
    shingle STARTING at word ``i+1`` (the form span surgery needs).
    Same stacked-projection structure, same re-inlining guardrails."""
    keep_cols = [F.col(c) for c in (keep or [])]
    wdf = df.select(*keep_cols, words(F.col(text_col)).alias("_w"))
    hdf = wdf.select(
        *keep_cols,
        F.transform(F.col("_w"), lambda s: hash60(s) % MINHASH_P).alias("_h1"),
        F.transform(F.col("_w"), lambda s: hash60b(s) % MINHASH_P).alias("_h2"))
    m = F.greatest(F.size(F.col("_h1")) - (k - 1), F.lit(1))
    lane1 = _rolling_lane(F.col("_h1"), k, m, SHINGLE_B1)
    lane2 = _rolling_lane(F.col("_h2"), k, m, SHINGLE_B2)
    combined = F.zip_with(lane1, lane2,
                          lambda a, b: a * F.lit(1 << 31).cast("long") + b)
    return hdf.select(*keep_cols, combined.alias(out_col))


def remove_dup_spans(docs: DataFrame, k: int = 5, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Surgical removal of cross-document duplicated k-word spans —
    the REMOVAL half of the Lee et al. 2022 exact-substring dedup
    story (:func:`dup_span_stats` is the measurement half): a k-word
    span is duplicated when its rolling-hash shingle id occurs in ≥ 2
    documents; the occurrence in the SMALLEST doc_id (the canonical
    copy) survives, and every other document has the covered words cut
    out.  Exact-duplicate documents therefore collapse to the empty
    string everywhere except the canonical copy; partial boilerplate
    (a shared footer) is excised in place while the unique prose stays.

    Output: ``(id_col, text_clean, n_removed)`` with ``text_clean``
    rebuilt from the surviving ORIGINAL-case words (ids hash the
    lowercased words; positions align because both split on the same
    single-space convention) — integer/string ops only, engine-exact.

    Scale shape: the per-document positional id array is checkpointed
    once and feeds (a) the duplicate decision — per-doc distinct ids →
    partial-agg groupBy(shingle) with count+min, the dup_span_stats
    skew argument: a boilerplate shingle collapses map-side to one row
    per partition — and (b) the positional rows that join back to the
    ≥2-doc shingles (ids-only equi-join; one row per shingle on the
    build side, AQE skew-split on the probe side when one shingle
    covers 10⁸ docs).  Deletion starts aggregate per doc (bounded by
    the doc's own length), then ONE doc-keyed join attaches them to
    the original text and the rebuild is a row-local indexed filter —
    O(n_words · n_spans) per doc, never cross-row.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-gram span would cut every "
                         "word that appears in two documents)")
    arrs = shingle_id_pos_arrays(docs, k=k, text_col=text_col,
                                 keep=[id_col]).localCheckpoint(eager=False)
    rows_d = arrs.select(F.col(id_col),
                         F.explode(F.array_distinct("_ids")).alias("shingle"))
    dup = (rows_d.groupBy("shingle")
                 .agg(F.count("*").alias("_df"), F.min(id_col).alias("_keeper"))
                 .filter(F.col("_df") >= 2)
                 .select("shingle", "_keeper"))
    rows_p = arrs.select(F.col(id_col),
                         F.posexplode("_ids").alias("_p0", "shingle"))
    dels = (rows_p.join(dup, "shingle")
                  .filter(F.col(id_col) != F.col("_keeper"))
                  .groupBy(id_col)
                  .agg(F.sort_array(F.collect_list(F.col("_p0") + 1))
                        .alias("_dels")))
    base = docs.select(F.col(id_col), F.col(text_col))
    joined = base.join(dels, id_col, "left").withColumn(
        "_d", F.coalesce(F.col("_dels"), F.array().cast("array<integer>")))
    wo = F.split(nz(F.col(text_col)), " ")
    kept = F.filter(wo, lambda x, j: ~F.exists(
        F.col("_d"), lambda s: (s <= j + 1) & (j + 1 <= s + (k - 1))))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("text_clean"),
        (F.size(wo) - F.size(kept)).cast("long").alias("n_removed"))


def shingle_ids_pos_over_sql(h1_col: str = "h1", h2_col: str = "h2",
                             k: int = 5) -> str:
    """Positional (non-distinct) DuckDB twin of
    :func:`shingle_ids_over_sql` — element i is the id of the shingle
    starting at word i."""

    def lane(arr: str, base: int) -> str:
        acc = f"{arr}[i]"
        for j in range(1, k):
            nxt = f"{arr}[i+{j}]"
            acc = (f"(CASE WHEN {nxt} IS NULL THEN {acc} "
                   f"ELSE ({acc} * {base} + {nxt}) % {MINHASH_P} END)")
        return acc

    body = (f"({lane(h1_col, SHINGLE_B1)}) * {1 << 31} "
            f"+ ({lane(h2_col, SHINGLE_B2)})")
    return (f"[{body} "
            f"for i in range(1, greatest(len({h1_col})-{k - 1}, 1) + 1)]")


def remove_dup_spans_sql(source: str = "documents", k: int = 5,
                         text_expr: str = "text",
                         id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`remove_dup_spans` (lockstep lanes,
    parallel-unnest positions, nested-lambda span cover test)."""
    h1, h2 = shingle_id_lanes_sql(text_expr)
    ids = shingle_ids_pos_over_sql("h1", "h2", k)
    return f"""
WITH dl AS (
  SELECT {id_expr} AS doc_id, {h1} AS h1, {h2} AS h2 FROM {source}),
ida AS (
  SELECT doc_id, {ids} AS ids FROM dl),
pos AS (
  SELECT doc_id, unnest(ids) AS shingle,
         unnest(range(1, len(ids) + 1)) AS pos
  FROM ida),
dup AS (
  SELECT shingle, min(doc_id) AS keeper
  FROM (SELECT DISTINCT shingle, doc_id FROM pos)
  GROUP BY shingle HAVING count(*) >= 2),
dels AS (
  SELECT doc_id, list_sort(list(pos)) AS dels
  FROM pos JOIN dup USING (shingle)
  WHERE doc_id <> keeper GROUP BY doc_id),
base AS (
  SELECT d.{id_expr} AS doc_id,
         string_split(coalesce(d.{text_expr}, ''), ' ') AS wo,
         coalesce(dels.dels, []) AS dd
  FROM {source} d LEFT JOIN dels ON d.{id_expr} = dels.doc_id),
kept AS (
  SELECT doc_id, wo,
         [wo[j] for j in range(1, len(wo) + 1)
          if len(list_filter(dd, s -> s <= j AND j <= s + {k - 1})) = 0] AS kw
  FROM base)
SELECT doc_id,
       -- array_to_string([]) is NULL in DuckDB; Spark's concat_ws is ''
       coalesce(array_to_string(kw, ' '), '') AS text_clean,
       CAST(len(wo) - len(kw) AS BIGINT) AS n_removed
FROM kept"""


def dup_span_intervals(docs: DataFrame, k: int = 5, text_col: str = "text",
                       id_col: str = "doc_id",
                       keeper_exempt: bool = False) -> DataFrame:
    """MAXIMAL duplicated-span inventory — the exact-substring
    extension of :func:`dup_span_stats` / :func:`remove_dup_spans`
    (Lee et al. 2022 byte-span semantics, suffix-array-faithful at
    word granularity): adjacent/overlapping duplicated k-gram covers
    are merged into maximal word intervals, so each output row is one
    maximal region of text shared (as a substring of ≥ k words) with
    at least one other document.  Parity with a quadratic
    all-pairs-common-substring reference is pinned by test
    (``tests/test_decontam_lm.py``) — a word position lies inside a
    maximal shared substring of length ≥ k iff some duplicated k-gram
    covers it, so the merged k-gram cover IS the union of the paper's
    maximal spans.

    ``keeper_exempt=True`` drops the canonical occurrences (the
    min-``id_col`` document per shingle keeps its copy) — exactly the
    regions :func:`remove_dup_spans` excises, which makes interval
    deletion and word-cover surgery provably identical (also pinned by
    test).

    Output: ``(id_col, span_start, span_end, span_words)`` with
    1-based inclusive word positions, ``span_end`` clamped to the
    document's word count.  ``span_words >= k`` except for one
    documented degenerate case: a document SHORTER than ``k`` words
    produces a single padded shingle (the rolling lane stops at the
    text's end), so whole-document exact duplicates of sub-k docs are
    still reported, as ``(1, n_words, n_words)`` — the same
    exact-duplicate-collapse convention :func:`remove_dup_spans`
    deliberately applies (the paper's suffix-array formulation would
    skip them; exact dedup owns them either way).

    Scale shape: identical to :func:`remove_dup_spans` up to the
    per-doc sorted start positions (one positional-ids checkpoint, one
    partial-agg shingle groupBy, one ids-only equi-join, one doc-keyed
    agg); the merge itself is ONE extra partition-local pass over the
    sorted starts — an O(m) zip-with-neighbour on the start array, no
    new shuffle (r4 VERDICT #6's prescription).  Fixed k-gram width
    means two sorted starts s_i, s_{i+1} merge iff
    ``s_{i+1} <= s_i + k`` (their covers overlap or touch), so maximal
    intervals fall out of a neighbour comparison — no position scan.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    arrs = shingle_id_pos_arrays(docs, k=k, text_col=text_col,
                                 keep=[id_col]).localCheckpoint(eager=False)
    rows_d = arrs.select(F.col(id_col),
                         F.explode(F.array_distinct("_ids")).alias("shingle"))
    dup = (rows_d.groupBy("shingle")
                 .agg(F.count("*").alias("_df"), F.min(id_col).alias("_keeper"))
                 .filter(F.col("_df") >= 2)
                 .select("shingle", "_keeper"))
    rows_p = arrs.select(F.col(id_col),
                         F.posexplode("_ids").alias("_p0", "shingle"))
    hits = rows_p.join(dup, "shingle")
    if keeper_exempt:
        hits = hits.filter(F.col(id_col) != F.col("_keeper"))
    starts = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("_s"))
    # clamp span ends to the real word count (sub-k docs' padded
    # shingle would otherwise report an end past the text) — one
    # doc-keyed equi-join against the narrow (id, word-count) side,
    # the same join-back shape remove_dup_spans already pays
    nw = F.size(F.split(nz(F.col(text_col)), " ")).alias("_nw")
    starts = starts.join(docs.select(F.col(id_col), nw), id_col)
    s = F.col("_s")
    # neighbour tests are 1-based element_at; the i==0 / i==n-1 edge
    # branches guard the out-of-range lookups (CASE WHEN evaluates
    # lazily, so element_at(_s, 0) is never reached)
    st = F.filter(
        F.transform(s, lambda v, i: F.struct(v.alias("v"), i.alias("i"))),
        lambda t: F.when(t["i"] == 0, F.lit(True))
                   .otherwise(t["v"] > F.element_at(s, t["i"]) + k))
    en = F.filter(
        F.transform(s, lambda v, i: F.struct(v.alias("v"), i.alias("i"))),
        lambda t: F.when(t["i"] == F.size(s) - 1, F.lit(True))
                   .otherwise(F.element_at(s, t["i"] + 2) > t["v"] + k))
    ivs = F.zip_with(st, en, lambda a, b: F.struct(
        a["v"].cast("int").alias("st"),
        F.least(b["v"] + (k - 1), F.col("_nw")).cast("int").alias("en")))
    return (starts.select(F.col(id_col), F.explode(ivs).alias("_iv"))
                  .select(F.col(id_col),
                          F.col("_iv.st").alias("span_start"),
                          F.col("_iv.en").alias("span_end"),
                          (F.col("_iv.en") - F.col("_iv.st") + 1)
                          .cast("long").alias("span_words")))


def dup_span_intervals_sql(source: str = "documents", k: int = 5,
                           text_expr: str = "text",
                           id_expr: str = "doc_id",
                           keeper_exempt: bool = False) -> str:
    """DuckDB rendering of :func:`dup_span_intervals` (lockstep lanes,
    same neighbour-merge rule over the sorted start positions)."""
    h1, h2 = shingle_id_lanes_sql(text_expr)
    ids = shingle_ids_pos_over_sql("h1", "h2", k)
    keeper_pred = "AND doc_id <> keeper" if keeper_exempt else ""
    return f"""
WITH dl AS (
  SELECT {id_expr} AS doc_id, {h1} AS h1, {h2} AS h2 FROM {source}),
ida AS (
  SELECT doc_id, {ids} AS ids FROM dl),
pos AS (
  SELECT doc_id, unnest(ids) AS shingle,
         unnest(range(1, len(ids) + 1)) AS pos
  FROM ida),
dup AS (
  SELECT shingle, min(doc_id) AS keeper
  FROM (SELECT DISTINCT shingle, doc_id FROM pos)
  GROUP BY shingle HAVING count(*) >= 2),
st AS (
  SELECT doc_id, list_sort(list(pos)) AS s
  FROM pos JOIN dup USING (shingle)
  WHERE TRUE {keeper_pred} GROUP BY doc_id),
nw AS (
  SELECT {id_expr} AS doc_id,
         len(string_split(coalesce({text_expr}, ''), ' ')) AS n_words
  FROM {source}),
iv AS (
  SELECT doc_id,
         list_zip(
           [s[i] for i in range(1, len(s) + 1)
            if i = 1 OR s[i] > s[i-1] + {k}],
           [least(s[i] + {k - 1}, n_words) for i in range(1, len(s) + 1)
            if i = len(s) OR s[i+1] > s[i] + {k}]) AS z
  FROM st JOIN nw USING (doc_id))
SELECT doc_id,
       CAST(u.z[1] AS INT) AS span_start,
       CAST(u.z[2] AS INT) AS span_end,
       CAST(u.z[2] - u.z[1] + 1 AS BIGINT) AS span_words
FROM (SELECT doc_id, unnest(z) AS z FROM iv) u(doc_id, z)"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS scheme)
# ---------------------------------------------------------------------------

_WPOW = 1 << 40                      # position field width in the packed key
_WMASK = _WPOW - 1


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints — the MOSS local fingerprinting
    scheme (Schleimer, Wilkerson & Aiken, SIGMOD 2003): slide a window
    of ``w`` consecutive k-word shingle hashes over each document and
    select the MINIMUM hash per window (rightmost occurrence on ties),
    then dedupe the selections.  Output: ``(id_col, fp_pos BIGINT,
    fp BIGINT)`` — the selected (1-based word position, shingle id)
    pairs, a ~``2/(w+1)``-density fingerprint set with the winnowing
    GUARANTEE: any substring match of at least ``w + k - 1`` words
    between two documents shares at least one fingerprint, so a
    fingerprint equi-join is a recall-1 candidate generator for
    local (sub-document) overlap — the positional complement of
    MinHash (whole-doc similarity) and :func:`dup_span_stats` (every
    shingle).

    INTEGER-EXACT tie-breaking without an argmin: each (shingle, pos)
    packs into one DECIMAL(38,0) key ``shingle * 2^40 + (2^40-1 -
    pos)`` (shingle < 2^62, pos < 2^40 ⇒ key < 2^102, inside both
    DECIMAL(38,0) and HUGEINT), so a single window MIN yields the
    smallest hash with the RIGHTMOST position — bit-identical on both
    engines.  Documents shorter than one full window contribute their
    global minimum (the pos=1 truncated window).

    Plan shape (100 TB test): the positional shingle ids are the
    rolling-hash arrays (partition-local, no shuffle), checkpointed
    once like the span ops — without the checkpoint,
    ``InferFiltersFromGenerate`` synthesizes ``size(_ids) > 0`` from
    the posexplode and re-inlines the whole md5 fold into the Filter
    (the shingle_id_rows trap, plan-pinned here too); the ONLY
    full-data Exchange is the doc-keyed window shuffle, and the
    dedupe-selections step is a ``groupBy(doc).collect_set`` that
    REUSES the window's hashpartitioning (no second exchange,
    plan-pinned); set sizes are bounded by the document's own length.

    No reference counterpart: pandarus has no text layer; the
    algorithm is the published winnowing paper."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if w < 1:
        raise ValueError("w must be >= 1")
    arrs = shingle_id_pos_arrays(docs, k=k, text_col=text_col,
                                 keep=[id_col]).localCheckpoint(eager=False)
    pos = arrs.select(F.col(id_col), F.size("_ids").alias("_n"),
                      F.posexplode("_ids").alias("_p0", "shingle"))
    key = F.expr(f"CAST(shingle AS DECIMAL(38,0)) * {_WPOW} "
                 f"+ ({_WMASK} - (_p0 + 1))")
    win = (Window.partitionBy(id_col).orderBy("_p0")
                 .rowsBetween(Window.currentRow, w - 1))
    sel = (pos.select(id_col, "_n", "_p0", key.alias("_key"))
              .select(id_col, "_n", "_p0",
                      F.min("_key").over(win).alias("_wc"))
              .filter(F.col("_p0") + 1 <=
                      F.greatest(F.col("_n") - (w - 1), F.lit(1)))
              .groupBy(id_col)
              .agg(F.collect_set("_wc").alias("_s")))
    return (sel.select(F.col(id_col), F.explode("_s").alias("_wc"))
               .select(id_col,
                       (F.lit(_WMASK) - F.expr(f"_wc % {_WPOW}"))
                       .cast("long").alias("fp_pos"),
                       F.expr(f"_wc DIV {_WPOW}").cast("long").alias("fp")))


def winnow_fingerprints_sql(source: str = "documents", k: int = 5,
                            w: int = 4, text_expr: str = "text",
                            id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`winnow_fingerprints` — lockstep
    lanes, the same packed HUGEINT key, the same truncated-window
    rule."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if w < 1:
        raise ValueError("w must be >= 1")
    h1, h2 = shingle_id_lanes_sql(text_expr)
    ids = shingle_ids_pos_over_sql("h1", "h2", k)
    return f"""
WITH dl AS (
  SELECT {id_expr} AS doc_id, {h1} AS h1, {h2} AS h2 FROM {source}),
ida AS (
  SELECT doc_id, {ids} AS ids FROM dl),
pos AS (
  SELECT doc_id, len(ids) AS n, unnest(ids) AS shingle,
         unnest(range(1, len(ids) + 1)) AS pos
  FROM ida),
win AS (
  SELECT doc_id, n, pos,
         min(CAST(shingle AS HUGEINT) * {_WPOW}
             + ({_WMASK} - pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wc
  FROM pos),
sel AS (
  SELECT DISTINCT doc_id, wc FROM win
  WHERE pos <= greatest(n - {w - 1}, 1))
SELECT doc_id,
       CAST({_WMASK} - (wc % {_WPOW}) AS BIGINT) AS fp_pos,
       CAST(wc // {_WPOW} AS BIGINT) AS fp
FROM sel"""


def winnow_overlap_pairs(docs: DataFrame, k: int = 5, w: int = 4,
                         min_shared: int = 1, max_df: int | None = None,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Candidate local-overlap pairs via shared winnowing fingerprints
    — what the fingerprints are FOR: by the winnowing guarantee, any
    two documents sharing a substring of at least ``w + k - 1`` words
    share at least one fingerprint VALUE, so the fingerprint equi-join
    is a recall-1 candidate generator for sub-document overlap (the
    local analogue of MinHash-LSH's whole-document candidates).
    Output: ``(doc_a, doc_b, n_shared BIGINT)`` with doc_a < doc_b and
    n_shared = number of DISTINCT shared fingerprint values >=
    ``min_shared``.

    ``max_df`` is the boilerplate valve: a fingerprint appearing in
    more than ``max_df`` documents (a ubiquitous footer shingle) would
    generate O(df^2) candidate pairs; dropping those fingerprints
    BEFORE the self-join bounds per-key join fan-out at the price of
    recall on matches covered ONLY by boilerplate — the same
    trade the LSH band caps and the Lee-et-al span filters make,
    and it is deterministic (a count threshold), so the SQL twin
    drops exactly the same keys.

    Plan shape (100 TB test): the per-doc distinct (doc, fp) reuses
    :func:`winnow_fingerprints`'s doc-partitioning (no extra
    Exchange); the df-filter window and the self-join share the ONE
    fp-keyed Exchange of id-only rows (text never shuffles); the pair
    count is a partial-agg shuffle of candidate pairs only."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if max_df is not None and max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    # checkpoint before the self-join: without it BOTH join sides
    # re-run the md5 fold + window pipeline (the dup_span hot-scan
    # discipline; r4 ADVICE #4 flagged exactly this recompute shape)
    fp = (winnow_fingerprints(docs, k=k, w=w, text_col=text_col,
                              id_col=id_col)
          .select(F.col(id_col).alias("_id"), "fp").distinct()
          .localCheckpoint(eager=False))
    if max_df is not None:
        cnt = Window.partitionBy("fp")
        fp = (fp.withColumn("_df", F.count("*").over(cnt))
                .filter(F.col("_df") <= max_df)
                .drop("_df"))
    l, r = fp.alias("l"), fp.alias("r")
    pairs = (l.join(r, (F.col("l.fp") == F.col("r.fp")) &
                       (F.col("l._id") < F.col("r._id")))
              .groupBy(F.col("l._id").alias("doc_a"),
                       F.col("r._id").alias("doc_b"))
              .agg(F.count("*").alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    return pairs.select("doc_a", "doc_b",
                        F.col("n_shared").cast("long").alias("n_shared"))


def winnow_overlap_pairs_sql(source: str = "documents", k: int = 5,
                             w: int = 4, min_shared: int = 1,
                             max_df: int | None = None,
                             text_expr: str = "text",
                             id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`winnow_overlap_pairs` (the winnowing
    CTE, the same deterministic df drop, the same ordered self-join)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if max_df is not None and max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    base = winnow_fingerprints_sql(source=source, k=k, w=w,
                                   text_expr=text_expr, id_expr=id_expr)
    df_filter = (f" QUALIFY count(*) OVER (PARTITION BY fp) <= {max_df}"
                 if max_df is not None else "")
    return f"""
WITH wfp AS ({base}),
fpd AS (SELECT DISTINCT doc_id, fp FROM wfp),
fpv AS (SELECT doc_id, fp FROM fpd{df_filter})
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fpv l JOIN fpv r ON l.fp = r.fp AND l.doc_id < r.doc_id
GROUP BY l.doc_id, r.doc_id
HAVING count(*) >= {min_shared}"""


def containment_pairs(docs: DataFrame, k: int = 3,
                      threshold_micro: int = 500_000,
                      max_df: int | None = None,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Exact ASYMMETRIC shingle containment pairs — the quote/subset
    detector Jaccard structurally misses: a short document fully
    quoted inside a long one has Jaccard ≈ |A|/|B| (tiny) but
    containment(A→B) = |S(A)∩S(B)| / |S(A)| = 1.  Output: ``(doc_a,
    doc_b, n_shared, cont_a_micro, cont_b_micro)`` with doc_a < doc_b
    and both containments in integer MICRO-units
    (``(shared·1e6) div size`` — exact, bit-identical everywhere);
    pairs kept when EITHER direction reaches ``threshold_micro``.

    ``max_df`` (the winnow_overlap_pairs valve): drop shingles in more
    than ``max_df`` documents before the join — then BOTH the shared
    counts AND the per-doc sizes are measured over the surviving
    shingle vocabulary, so the ratio stays a well-defined exact
    containment on that vocabulary (deterministic; the SQL twin drops
    identical shingles).

    Plan shape (100 TB test): distinct shingle ids only (64-bit ints)
    enter the inverted-index self-join — text never shuffles; the df
    valve bounds per-key join fan-out; the pair partial agg moves
    candidate pairs only.  For corpus-scale recall-oriented candidate
    generation use :func:`winnow_overlap_pairs` or
    :func:`minhash_lsh_pairs` first and verify containment on the
    candidates; this operator is the exact engine and the
    small-scale oracle."""
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError("threshold_micro must be in (0, 1e6]")
    if max_df is not None and max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    sh = docs.select(F.col(id_col).alias("_id"),
                     word_shingles(F.col(text_col), k).alias("_sh"))
    inv = sh.select("_id", F.explode("_sh").alias("g"))
    if max_df is not None:
        from pyspark.sql import Window
        inv = (inv.withColumn("_df", F.count("*").over(Window.partitionBy("g")))
                  .filter(F.col("_df") <= max_df)
                  .drop("_df"))
    inv = inv.localCheckpoint(eager=False)
    sizes = inv.groupBy("_id").agg(F.count("*").alias("n"))
    shared = (inv.alias("a")
              .join(inv.alias("b"), (F.col("a.g") == F.col("b.g")) &
                                    (F.col("a._id") < F.col("b._id")))
              .groupBy(F.col("a._id").alias("doc_a"),
                       F.col("b._id").alias("doc_b"))
              .agg(F.count("*").alias("n_shared")))
    out = (shared
           .join(sizes.select(F.col("_id").alias("doc_a"),
                              F.col("n").alias("_na")), "doc_a")
           .join(sizes.select(F.col("_id").alias("doc_b"),
                              F.col("n").alias("_nb")), "doc_b")
           .select("doc_a", "doc_b", F.col("n_shared").cast("long"),
                   F.expr("(n_shared * 1000000) DIV _na").cast("long")
                    .alias("cont_a_micro"),
                   F.expr("(n_shared * 1000000) DIV _nb").cast("long")
                    .alias("cont_b_micro")))
    return out.filter((F.col("cont_a_micro") >= threshold_micro) |
                      (F.col("cont_b_micro") >= threshold_micro))


def containment_pairs_sql(source: str = "documents", k: int = 3,
                          threshold_micro: int = 500_000,
                          max_df: int | None = None,
                          text_expr: str = "text",
                          id_expr: str = "doc_id") -> str:
    """DuckDB rendering of :func:`containment_pairs` (same shingles,
    same df valve, same integer micro ratios)."""
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError("threshold_micro must be in (0, 1e6]")
    if max_df is not None and max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    sh = shingles_sql(text_expr, k)
    valve = (f" QUALIFY count(*) OVER (PARTITION BY g) <= {max_df}"
             if max_df is not None else "")
    return f"""
WITH inv0 AS (SELECT {id_expr} AS id, unnest({sh}) AS g FROM {source}),
inv AS (SELECT id, g FROM inv0{valve}),
sizes AS (SELECT id, count(*) AS n FROM inv GROUP BY id),
shared AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS n_shared
           FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
           GROUP BY a.id, b.id)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST((n_shared * 1000000) // sa.n AS BIGINT) AS cont_a_micro,
       CAST((n_shared * 1000000) // sb.n AS BIGINT) AS cont_b_micro
FROM shared JOIN sizes sa ON shared.doc_a = sa.id
            JOIN sizes sb ON shared.doc_b = sb.id
WHERE (n_shared * 1000000) // sa.n >= {threshold_micro}
   OR (n_shared * 1000000) // sb.n >= {threshold_micro}"""


# ---------------------------------------------------------------------------
# PPJoin-style exact set-similarity self-join (prefix filtering)
# ---------------------------------------------------------------------------

def ppjoin_pairs(docs: DataFrame, k: int = 3,
                 threshold_micro: int = 500_000,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """EXACT shingle-Jaccard self-join via prefix filtering (the
    AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al. 2008):
    every pair with Jaccard >= threshold, with NO approximation — the
    guaranteed-recall alternative to :func:`minhash_lsh_pairs` when
    the similarity floor is a hard contract rather than a budget.

    Prefix filtering: order each document's distinct k-shingles by a
    single GLOBAL total order — (document frequency ASC, shingle ASC),
    rarest first — and keep only the first
    ``p = n - ceil(tau * n) + 1`` of its n shingles as join keys.
    Any pair at Jaccard >= tau shares >= ceil(tau * n) shingles with
    EACH member, so skipping the last ceil(tau*n)-1 of either side
    cannot skip every shared shingle: the prefix join loses no
    qualifying pair (the standard prefix-filter theorem), and exact
    verification discards the rest.  ``ceil`` is integer arithmetic
    ((tm*n + 999999) div 1e6), and the output keep-test
    ``(s*1e6) div (na+nb-s) >= tm`` is algebraically identical to
    s/(na+nb-s) >= tm/1e6 — so the result set equals the brute-force
    join BIT-EXACTLY, which is what the oracle gate checks.

    Output: ``(doc_a, doc_b, n_shared BIGINT, jacc_micro BIGINT)``
    with doc_a < doc_b, integer micro-units only.

    Plan shape (100 TB test): the df table and the prefix window
    shuffle (id, shingle) rows only — text never shuffles; the
    candidate self-join keys on PREFIX shingles, which are by
    construction each document's RAREST — the high-df join keys that
    explode inverted-index self-joins (the reason
    :func:`ngram_jaccard_pairs` is oracle-only) never become join
    keys here, the prefix-filter analogue of winnow_overlap's max_df
    valve but with zero recall loss; the shingle arrays are fetched
    once per SURVIVING candidate for the exact verify."""
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError("threshold_micro must be in (0, 1e6]")
    from pyspark.sql import Window

    sh = (docs.select(F.col(id_col).alias("_id"),
                      word_shingles(F.col(text_col), k).alias("_sh"))
              .localCheckpoint(eager=False))
    inv = sh.select("_id", F.size("_sh").alias("_n"),
                    F.explode("_sh").alias("g"))
    dfq = inv.groupBy("g").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("g"))
    pref = (inv.join(dfq, "g")
               .withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= F.col("_n")
                       - F.expr(f"({threshold_micro} * _n + 999999) "
                                f"DIV 1000000") + 1)
               .select("_id", "g"))
    cand = (pref.alias("a")
            .join(pref.alias("b"), (F.col("a.g") == F.col("b.g")) &
                                   (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("doc_a"),
                    F.col("b._id").alias("doc_b"))
            .distinct())
    va = sh.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"))
    vb = sh.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"))
    out = (cand.join(va, "doc_a").join(vb, "doc_b")
               .select("doc_a", "doc_b",
                       F.size(F.array_intersect("_sha", "_shb"))
                        .cast("long").alias("n_shared"),
                       F.size("_sha").alias("_na"),
                       F.size("_shb").alias("_nb"))
               .select("doc_a", "doc_b", "n_shared",
                       F.expr("(n_shared * 1000000) "
                              "DIV (_na + _nb - n_shared)")
                        .cast("long").alias("jacc_micro")))
    return out.filter(F.col("jacc_micro") >= threshold_micro)


def ppjoin_pairs_sql(source: str = "documents", k: int = 3,
                     threshold_micro: int = 500_000,
                     text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`ppjoin_pairs` — deliberately the
    BRUTE-FORCE inverted-index join with the same integer micro
    keep-test: the prefix-filter theorem says the optimized operator
    returns the identical pair set, so the gate proves the
    optimization lossless rather than replaying it."""
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError("threshold_micro must be in (0, 1e6]")
    sh = shingles_sql(text_expr, k)
    return f"""
WITH sh AS (SELECT {id_expr} AS id, {sh} AS sh FROM {source}),
sz AS (SELECT id, len(sh) AS n FROM sh),
inv AS (SELECT id, unnest(sh) AS g FROM sh),
shared AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS s
           FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
           GROUP BY a.id, b.id)
SELECT doc_a, doc_b, CAST(s AS BIGINT) AS n_shared,
       CAST((s * 1000000) // (na.n + nb.n - s) AS BIGINT) AS jacc_micro
FROM shared JOIN sz na ON shared.doc_a = na.id
            JOIN sz nb ON shared.doc_b = nb.id
WHERE (s * 1000000) // (na.n + nb.n - s) >= {threshold_micro}"""


# ---------------------------------------------------------------------------
# Edit-distance <= 1 similarity join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

def editdist1_pairs(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """EXACT edit-distance <= 1 self-join via DELETION NEIGHBORHOODS
    (the FastSS / SymSpell scheme): two strings at Levenshtein
    distance <= 1 — equal, one insert, one delete, or one substitute
    — necessarily share a member of ``{s} ∪ {s minus one char}``, so
    joining on that (len+1)-element variant set has RECALL 1 by
    construction and the exact ``levenshtein`` verify discards the
    rest.  The typo-tolerant twin of :func:`exact_dedup` for short
    keys (titles, URLs, product names).  Output: ``(id_a, id_b,
    dist BIGINT)`` with id_a < id_b and dist in {0, 1}.

    Plan shape (100 TB test): variants are an in-line position
    explode (len+1 rows per string, pure Catalyst substring
    arithmetic — no Python); the self-join keys on the variant
    string, candidates bounded by Σ df² over variants; the verify is
    the built-in JVM ``levenshtein``.  Popular short strings are the
    skew: their variant df is their own df — run exact dedup first
    (collapsing equal strings to one representative) exactly like
    :func:`minhash_lsh_pairs` does, or the hot variant's candidate
    block is quadratic in its popularity."""
    s = nz(F.col(text_col))
    # variant i=0: the string itself; i=1..len: drop char i
    var = F.expr(
        f"transform(sequence(0, length({NZ_SQL.format(t=text_col)})), "
        f"i -> IF(i = 0, {NZ_SQL.format(t=text_col)}, "
        f"concat(substring({NZ_SQL.format(t=text_col)}, 1, i - 1), "
        f"substring({NZ_SQL.format(t=text_col)}, i + 1))))")
    inv = (docs.select(F.col(id_col).alias("_id"), s.alias("_s"),
                       F.explode(var).alias("g"))
               .localCheckpoint(eager=False))
    cand = (inv.alias("a")
            .join(inv.alias("b"), (F.col("a.g") == F.col("b.g")) &
                                  (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("a._s").alias("_sa"),
                    F.col("b._s").alias("_sb"))
            .distinct())
    return (cand.withColumn("dist",
                            F.levenshtein("_sa", "_sb").cast("long"))
                .filter(F.col("dist") <= 1)
                .select("id_a", "id_b", "dist"))


def editdist1_pairs_sql(source: str = "documents",
                        text_expr: str = "text",
                        id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`editdist1_pairs` — deliberately the
    BRUTE-FORCE all-pairs Levenshtein join: the deletion-neighborhood
    theorem says the optimized operator returns the identical pair
    set, so the gate proves the candidate generation lossless."""
    t = NZ_SQL.format(t=text_expr)
    return f"""
WITH s AS (SELECT {id_expr} AS id, {t} AS s FROM {source})
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM s a JOIN s b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1"""
