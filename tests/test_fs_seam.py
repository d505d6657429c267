"""sources/fs.py — the Hadoop-FileSystem driver seam the index
manifest protocol and catalog maintenance commit through. With an
active SparkSession every call routes through the JVM FileSystem API
(the same code path hdfs:///s3a:// take); these tests pin the
semantics the commit protocol relies on."""

from __future__ import annotations

import os

from claude_readability_hook_spark.sources import fs as fsio


def test_roundtrip_exists_read_write_list(spark, tmp_path):
    root = str(tmp_path / "seam")
    fsio.mkdirs(root, spark)
    assert fsio.exists(root, spark)
    p = os.path.join(root, "manifest-v1.json")
    assert fsio.write_text_exclusive(p, '{"v": 1}', spark)
    assert fsio.read_text(p, spark) == '{"v": 1}'
    assert fsio.list_names(root, spark) == ["manifest-v1.json"]
    assert fsio.list_names(str(tmp_path / "missing"), spark) == []


def test_exclusive_create_loses_race(spark, tmp_path):
    """The manifest-version claim primitive: second writer to the same
    path must get False, and the first writer's content must win."""
    p = str(tmp_path / "claim.json")
    assert fsio.write_text_exclusive(p, "winner", spark)
    assert not fsio.write_text_exclusive(p, "loser", spark)
    assert fsio.read_text(p, spark) == "winner"


def test_rename_and_delete(spark, tmp_path):
    src = str(tmp_path / "a")
    dst = str(tmp_path / "b")
    fsio.mkdirs(src, spark)
    fsio.write_text_exclusive(os.path.join(src, "f"), "x", spark)
    assert fsio.rename(src, dst, spark)
    assert not fsio.exists(src, spark) and fsio.exists(dst, spark)
    fsio.delete(dst, recursive=True, spark=spark)
    assert not fsio.exists(dst, spark)


def test_fingerprint_tracks_content_changes(spark, tmp_path):
    p = str(tmp_path / "data.bin")
    with open(p, "wb") as fh:
        fh.write(b"aaaa")
    fp1 = fsio.file_fingerprint(p, spark)
    assert fp1 != "nostat"
    with open(p, "wb") as fh:
        fh.write(b"bbbbbbbb")  # longer → size component must change
    fp2 = fsio.file_fingerprint(p, spark)
    assert fp1 != fp2
    assert fsio.file_fingerprint(str(tmp_path / "none"), spark) == "nostat"


def test_read_text_large_payload_drains_fully(spark, tmp_path):
    """IOUtils copy must drain past one buffer (65536 B)."""
    p = str(tmp_path / "big.json")
    body = "x" * 200_000
    assert fsio.write_text_exclusive(p, body, spark)
    assert fsio.read_text(p, spark) == body
