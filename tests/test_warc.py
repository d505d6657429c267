"""WARC ingestion: record-walk round trips (plain / member-gzip),
HTTP payload stripping, poison isolation, and the Spark end-to-end —
WARC segments in, extracted spans out."""

from __future__ import annotations

import gzip

import pytest

from claude_readability_hook_spark.sources.warc import (
    http_response_body,
    parse_warc,
    synthesize_warc,
    warc_to_documents,
)

DOCS = [
    ("https://example.com/a", "<html><head><title>A</title></head><body><article><h1>A</h1><p>Alpha paragraph content here.</p></article></body></html>"),
    ("https://example.com/b", "<html><head><title>B</title></head><body><article><h1>B</h1><p>Beta paragraph content here.</p></article></body></html>"),
]


def test_roundtrip_plain_and_member_gzip():
    for member in (False, True):
        seg = synthesize_warc(DOCS, member_gzip=member)
        recs = list(parse_warc(seg))
        assert [r["type"] for r in recs] == ["warcinfo", "response", "response"]
        bodies = [http_response_body(r["body"]).decode() for r in recs[1:]]
        assert bodies == [h for _u, h in DOCS]
        assert [r["uri"] for r in recs[1:]] == [u for u, _h in DOCS]


def test_whole_file_gzip():
    seg = gzip.compress(synthesize_warc(DOCS))
    recs = list(parse_warc(seg))
    assert len(recs) == 3


def test_binary_body_with_embedded_magic_does_not_derail():
    """Content-Length is authoritative: a body containing 'WARC/' bytes
    must not split the record."""
    evil = "<html>WARC/1.0\r\n\r\nfake</html>"
    seg = synthesize_warc([("https://x.test/e", evil)])
    recs = [r for r in parse_warc(seg) if r["type"] == "response"]
    assert len(recs) == 1
    assert http_response_body(recs[0]["body"]).decode() == evil


def test_missing_content_length_raises():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with pytest.raises(ValueError):
        list(parse_warc(bad))


def test_warc_to_documents_and_extraction(spark, tmp_path):
    """End to end: two segments (one plain, one member-gzipped, one
    corrupt) → documents frame → the flagship extraction pipeline."""
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "seg-00001.warc").write_bytes(synthesize_warc(DOCS))
    (tmp_path / "w" / "seg-00002.warc.gz").write_bytes(
        synthesize_warc([("https://example.com/c", DOCS[0][1])], member_gzip=True)
    )
    (tmp_path / "w" / "seg-bad.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    )

    docs = warc_to_documents(spark, str(tmp_path / "w"))
    rows = docs.collect()
    good = [r for r in rows if r["_warc_error"] is None]
    bad = [r for r in rows if r["_warc_error"] is not None]
    assert len(good) == 3 and len(bad) == 1
    assert all(r["text"].startswith("<html>") for r in good)
    assert {r["source"] for r in good} == {"seg-00001.warc", "seg-00002.warc.gz"}

    # feed the extraction pipeline: WARC in, spans out
    from pyspark.sql import functions as F

    from claude_readability_hook_spark.plans.pipeline import run_extraction

    src = (
        docs.filter(F.col("_warc_error").isNull())
        .select(
            "doc_id",
            "url",
            F.array(
                F.struct(
                    F.lit("html").alias("kind"),
                    F.col("text").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ).alias("spans"),
        )
    )
    result = run_extraction(spark, src, catalog=None, num_partitions=2)
    out = {r["doc_id"]: r for r in result.extracted.collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["success"]
        texts = " ".join(s["text"] or "" for s in r["spans"])
        assert "paragraph content here" in texts
