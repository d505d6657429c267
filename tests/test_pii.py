"""PII redaction (operators/pii.py): typed tokens replace emails /
IPv4s / phones, counts are per-type and order-safe (an email's digits
never double-count as a phone), clean docs pass untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from claude_readability_hook_spark.operators.pii import (
    redact_pii,
    redact_text_expr,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redaction_tokens_and_counts(spark):
    docs = _df(
        spark,
        [
            (1, "mail alice.smith+x@sub.example.org today"),
            (2, "host 10.0.255.3 and 192.168.1.1 up"),
            (3, "call +1 555-867-5309 or 020-7946-0958 now"),
            (4, "clean document with no personal data at all"),
            (5, "combo bob@x.io at 8.8.8.8 phone 555-123-4567"),
        ],
    )
    redacted = {
        r["doc_id"]: r["red"]
        for r in docs.select(
            "doc_id", redact_text_expr(F.col("text")).alias("red")
        ).collect()
    }
    assert redacted[1] == "mail <EMAIL> today"
    assert redacted[2] == "host <IP> and <IP> up"
    assert "<PHONE>" in redacted[3] and "555" not in redacted[3]
    assert redacted[4] == "clean document with no personal data at all"
    assert (
        "<EMAIL>" in redacted[5]
        and "<IP>" in redacted[5]
        and "<PHONE>" in redacted[5]
    )

    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 2, 0)
    assert out[3]["n_phones"] == 2 and out[3]["has_pii"]
    assert not out[4]["has_pii"]
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)


def test_email_digits_not_double_counted_as_phone(spark):
    """user555-123-4567@x.io is ONE email, zero phones — counts run on
    the previous redaction stage's output."""
    docs = _df(spark, [(1, "reach user555-123-4567@x.io ok")])
    row = redact_pii(docs).collect()[0]
    assert row["n_emails"] == 1 and row["n_phones"] == 0 and row["n_ips"] == 0


def test_ip_not_counted_as_phone(spark):
    docs = _df(spark, [(1, "ping 123-456-7890 vs 1.2.3.4")])
    row = redact_pii(docs).collect()[0]
    assert row["n_ips"] == 1 and row["n_phones"] == 1
