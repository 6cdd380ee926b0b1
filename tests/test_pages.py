"""pages source: byte-identical extraction (the graft's per-row
invariant) + the reference's map-level validation errors."""

import pytest

from pandarus_spark.sources import pages as P


def test_extraction_byte_identical():
    for ds in ("grid", "square", "lines", "points", "outside", "grid-ints"):
        for url, ts, html, text, lang in P.page_rows(ds, P.FIXTURES[ds]()):
            assert P.extract_text(html) == text
            assert P.extract_text(html).encode() == text.encode()


def test_rows_are_deterministic():
    a = P.page_rows("grid", P.FIXTURES["grid"]())
    b = P.page_rows("grid", P.FIXTURES["grid"]())
    assert a == b


def test_parse_feature_text():
    rows = P.page_rows("square", P.FIXTURES["square"]())
    label, geom = P.parse_feature_text(rows[0][3])
    assert label == "single"
    assert geom["type"] == "Polygon"


def test_duplicate_field_raises(spark):
    """model.py:126-127 DuplicateFieldIDError equivalent."""
    pages = P.pages_df(spark, "duplicates")
    with pytest.raises(Exception, match="duplicate identifying field"):
        P.extract_features(pages)


def test_geometry_collection_rejected(spark):
    """GeometryCollection not allowed as from-map (core.py:46-49)."""
    pages = P.pages_df(spark, "gc")
    with pytest.raises(Exception, match="GeometryCollection"):
        P.extract_features(pages).collect()


def test_int_labels_supported(spark):
    feats = P.extract_features(P.pages_df(spark, "grid-ints"))
    labels = sorted(r["label"] for r in feats.select("label").collect())
    assert labels == ["0", "1", "2", "3"]


def test_fused_features_match_two_step(spark):
    """features_from_documents == extract_features(pages_from_documents)
    row for row (the fused single-Arrow-pass ingest is a pure fusion)."""
    from pyspark.sql import functions as F

    from pandarus_spark.sources.pages import (
        extract_features, features_from_documents, pages_from_documents,
    )
    docs = spark.range(0, 500, 1, 4).select(F.col("id").alias("doc_id"))
    for role in ("base", "probe"):
        two = extract_features(pages_from_documents(docs, role), validate_unique=False)
        one = features_from_documents(docs, role)
        a = sorted(tuple(r) for r in two.collect())
        b = sorted(tuple(r) for r in one.collect())
        assert a == b
