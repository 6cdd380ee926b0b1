"""Property tests for the round-4c training-prep operators against
independent PYTHON reference implementations (not the DuckDB twins —
a third engine, so a shared-oracle bug cannot hide): full-algorithm
recomputes of pack_sequences and remove_dup_spans on seeded random
corpora, plus structural invariants."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from pandarus_spark.operators import curation as C
from pandarus_spark.operators.dedup import (
    MINHASH_P, SHINGLE_B1, SHINGLE_B2, remove_dup_spans)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _h60b(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[16:31], 16)


def _rand_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)] + ["The", "Mixed", "CASE"]
    rows = []
    for d in range(n_docs):
        if d > 4 and rng.random() < 0.3:
            rows.append((d, rows[rng.randrange(len(rows))][1]))  # dup
        elif rng.random() < 0.05:
            rows.append((d, rng.choice(["", None])))
        else:
            nw = rng.randint(1, 18)
            rows.append((d, " ".join(rng.choice(vocab) for _ in range(nw))))
    return rows


def _pack_reference(rows, seq_len, n_shards):
    """Driver-side recompute of pack_sequences from its contract."""
    docs = []
    for did, text in rows:
        toks = (text or "").split(" ")
        docs.append((did, _h60(str(did)) % n_shards, _h60b(str(did)), len(toks)))
    out = []
    for shard in range(n_shards):
        sh = sorted((o, did, n) for did, s, o, n in docs if s == shard)
        off = 0
        for _o, did, n in sh:
            for seq in range(off // seq_len, (off + n - 1) // seq_len + 1):
                beg, end = max(off, seq * seq_len), min(off + n, (seq + 1) * seq_len)
                out.append((did, shard, seq, beg - off, end - beg))
            off += n
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_pack_sequences_matches_python_reference(spark, seed):
    rows = _rand_corpus(seed, 120)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in C.pack_sequences(docs, 32, 5).collect())
    assert got == _pack_reference(rows, 32, 5)


def _shingle_ids(text: str, k: int):
    """Positional rolling-hash ids, the kernel contract."""
    ws = (text or "").lower().split(" ")
    h1 = [_h60(w) % MINHASH_P for w in ws]
    h2 = [_h60b(w) % MINHASH_P for w in ws]
    m = max(len(ws) - (k - 1), 1)
    out = []
    for i in range(m):
        a, b = h1[i], h2[i]
        for j in range(1, k):
            if i + j < len(ws):
                a = (a * SHINGLE_B1 + h1[i + j]) % MINHASH_P
                b = (b * SHINGLE_B2 + h2[i + j]) % MINHASH_P
        out.append(a * (1 << 31) + b)
    return out


def _removal_reference(rows, k):
    pos = {did: _shingle_ids(t, k) for did, t in rows}
    docs_of = {}
    for did, ids in pos.items():
        for s in set(ids):
            docs_of.setdefault(s, set()).add(did)
    keeper = {s: min(ds) for s, ds in docs_of.items() if len(ds) >= 2}
    out = []
    for did, text in rows:
        wo = (text or "").split(" ")
        dels = [i + 1 for i, s in enumerate(pos[did])
                if s in keeper and keeper[s] != did]
        kept = [w for j, w in enumerate(wo, start=1)
                if not any(s <= j <= s + k - 1 for s in dels)]
        out.append((did, " ".join(kept), len(wo) - len(kept)))
    return sorted(out)


@pytest.mark.parametrize("seed,k", [(2, 3), (11, 5), (42, 4)])
def test_remove_dup_spans_matches_python_reference(spark, seed, k):
    rows = _rand_corpus(seed, 100)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in remove_dup_spans(docs, k=k).collect())
    assert got == _removal_reference(rows, k)


def test_remove_dup_spans_unique_corpus_is_identity(spark):
    # i is baked into EVERY word so no k-gram can repeat across docs
    rows = [(i, f"Alpha{i} Beta{i} gamma{i} delta{i} x{i} y{i} z{i}")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"])
           for r in remove_dup_spans(docs, k=4).collect()}
    for did, text in rows:
        assert got[did] == (text, 0)


def test_remove_dup_spans_output_is_subsequence(spark):
    rows = _rand_corpus(99, 80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"]
           for r in remove_dup_spans(docs, k=3).collect()}
    for did, text in rows:
        orig = (text or "").split(" ")
        kept = got[did].split(" ") if got[did] else []
        it = iter(orig)
        assert all(any(w == o for o in it) for w in kept), did
