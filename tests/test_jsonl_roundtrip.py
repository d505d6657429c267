"""Export→import loop: shards written by export_jsonl_shards read back
losslessly via documents_from_jsonl; malformed lines quarantine."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from claude_readability_hook_spark.sources.jsonl import documents_from_jsonl
from claude_readability_hook_spark.sources.warc import synthesize_warc, wet_to_documents


def test_export_import_roundtrip(spark, tmp_path):
    from claude_readability_hook_spark.sources.export import export_jsonl_shards

    rows = [
        (f"doc-{i}", f"Title {i}", "precision", 0.5 + i, True,
         [{"kind": "text", "text": f"Body of document {i}.", "media_ref": "", "offset": 0}])
        for i in range(40)
    ]
    extracted = spark.createDataFrame(
        rows,
        "doc_id string, title string, engine string, score double, "
        "success boolean, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = str(tmp_path / "shards")
    n_shards = export_jsonl_shards(extracted, out, max_rows_per_shard=16)
    assert n_shards == 3

    back = documents_from_jsonl(spark, out)
    docs = {r["doc_id"]: r for r in back.docs.collect()}
    assert len(docs) == 40 and back.quarantine.count() == 0
    assert docs["doc-7"]["text"] == "Body of document 7."
    assert docs["doc-7"]["title"] == "Title 7"
    assert abs(docs["doc-7"]["score"] - 7.5) < 1e-9


def test_malformed_lines_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": "a", "title": "t", "engine": "e", "score": 1.0, "text": "ok"}\n'
        "this is not json at all\n"
        '{"doc_id": "b", "title": "t"}\n'  # valid JSON, missing text
    )
    back = documents_from_jsonl(spark, str(p))
    assert [r["doc_id"] for r in back.docs.collect()] == ["a"]
    assert back.quarantine.count() == 2


def test_wet_segments_to_documents(spark, tmp_path):
    seg = synthesize_warc(
        [("https://example.com/w1", "Plain extracted text one."),
         ("https://example.com/w2", "Plain extracted text two.")],
        record_type="conversion",
        member_gzip=True,
    )
    d = tmp_path / "wet"
    d.mkdir()
    (d / "seg-0.warc.wet.gz").write_bytes(seg)
    docs = wet_to_documents(spark, str(d))
    rows = [r for r in docs.collect() if r["_warc_error"] is None]
    assert sorted(r["text"] for r in rows) == [
        "Plain extracted text one.",
        "Plain extracted text two.",
    ]
    assert all(r["url"].startswith("https://example.com/") for r in rows)
