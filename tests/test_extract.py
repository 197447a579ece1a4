"""Extraction tests: UDTF-shaped mapInPandas, byte-identical slices."""

import hashlib

import pytest
from pyspark.sql import functions as F

from osmgraft import synth
from osmgraft.extract import extract_entities

pytestmark = pytest.mark.spark


def test_extracted_entities_match_arithmetic_derivation(spark, sf_dir):
    pages = synth.pages_df(spark, sf_dir)
    got = extract_entities(pages)
    want = synth.geo_entities_df(spark, sf_dir)
    g = {
        (r.doc_id, r.ent_idx, r.name, r.lat_e7, r.lon_e7)
        for r in got.select("doc_id", "ent_idx", "name", "lat_e7", "lon_e7").collect()
    }
    w = {
        (r.doc_id, r.ent_idx, r.name, r.lat_e7, r.lon_e7)
        for r in want.collect()
    }
    assert g == w
    assert len(g) > 0


def test_mention_bytes_are_exact_slices(spark, sf_dir):
    """Byte-identity invariant: every extracted mention is an exact byte
    slice of the page text (the reference's lossless-UTF contract)."""
    pages = synth.pages_df(spark, sf_dir)
    ents = extract_entities(pages)
    joined = (
        ents.alias("e")
        .join(pages.select("url", "text").alias("p"), "url")
        .select("e.mention", "p.text")
        .collect()
    )
    assert joined
    multibyte = 0
    for r in joined:
        assert bytes(r.mention) in r.text.encode("utf-8")
        if max(bytes(r.mention)) > 127:
            multibyte += 1
    assert multibyte > 0, "multi-byte UTF-8 names not exercised"


def test_no_mention_docs_yield_no_entities(spark, sf_dir):
    pages = synth.pages_df(spark, sf_dir)
    ents = extract_entities(pages)
    bad = ents.filter((F.col("doc_id") % 7) == 0).count()
    assert bad == 0


def test_jvm_path_equals_pandas_path(spark, sf_dir):
    pages = synth.pages_df(spark, sf_dir)
    a = {
        (r.url, r.doc_id, r.ent_idx, r.name, r.lat_e7, r.lon_e7, bytes(r.mention))
        for r in extract_entities(pages, engine="arrow").collect()
    }
    b = {
        (r.url, r.doc_id, r.ent_idx, r.name, r.lat_e7, r.lon_e7, bytes(r.mention))
        for r in extract_entities(pages, engine="jvm").collect()
    }
    assert a == b and a


def test_jvm_pruned_projection_equals_arrow(spark, sf_dir):
    pages = synth.pages_df(spark, sf_dir)
    cols = ("doc_id", "ent_idx", "lat_e7", "lon_e7")
    a_df = extract_entities(pages, columns=cols, engine="arrow")
    b_df = extract_entities(pages, columns=cols, engine="jvm")
    assert a_df.columns == b_df.columns == list(cols)
    assert {tuple(r) for r in a_df.collect()} == {
        tuple(r) for r in b_df.collect()
    }
    # pure-id projection (no derived field) still explodes per mention
    ids = extract_entities(pages, columns=("doc_id", "ent_idx"), engine="jvm")
    assert ids.columns == ["doc_id", "ent_idx"]
    assert ids.count() == a_df.count()


def test_projection_pushdown_equals_full_path(spark, sf_dir):
    pages = synth.pages_df(spark, sf_dir)
    full = {
        (r.doc_id, r.ent_idx, r.lat_e7, r.lon_e7)
        for r in extract_entities(pages).collect()
    }
    pruned_df = extract_entities(
        pages, columns=("doc_id", "ent_idx", "lat_e7", "lon_e7")
    )
    assert pruned_df.columns == ["doc_id", "ent_idx", "lat_e7", "lon_e7"]
    pruned = {tuple(r) for r in pruned_df.collect()}
    assert pruned == full and full
    # order of the requested tuple must not matter (schema order wins)
    reordered = extract_entities(
        pages, columns=("lon_e7", "doc_id", "lat_e7", "ent_idx")
    )
    assert reordered.columns == ["doc_id", "ent_idx", "lat_e7", "lon_e7"]


def test_projection_pushdown_rejects_unknown_column(spark, sf_dir):
    import pytest as _pytest

    pages = synth.pages_df(spark, sf_dir)
    with _pytest.raises(ValueError):
        extract_entities(pages, columns=("doc_id", "nope"))


def test_missing_passthrough_column_fails_identically_in_both_engines(spark):
    """r3 advice item 4: requesting `url` when the input has no url
    column used to null-fill on the jvm path but fail at analysis on
    the arrow path.  Both engines now raise the same ValueError at
    plan time."""
    pages = spark.createDataFrame(
        [(1, "no mentions here")], schema="doc_id LONG, text STRING"
    )
    for engine in ("jvm", "arrow"):
        with pytest.raises(ValueError, match="passthrough"):
            extract_entities(pages, columns=("url", "doc_id"), engine=engine)
