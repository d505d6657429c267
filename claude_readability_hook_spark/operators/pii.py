"""PII redaction for training corpora: replace emails, IPv4 addresses
and phone-shaped numbers with typed placeholder tokens, and report
per-document hit counts (the standard crawl-scrub stage — e.g. the
public BigScience/ROOTS and RefinedWeb pipelines describe exactly this
regex-redaction pass).

Pure Column expressions (regexp_replace / regexp_count chains —
whole-stage codegen, zero Python), so at 100 TB this is a free rider
on a scan the pipeline already makes, like the textstats operators.

Pattern notes: the patterns deliberately use the common subset of
Java regex (Spark) and RE2 (DuckDB) — no backreferences, no
lookaround — so the DuckDB oracle applies the IDENTICAL pattern
strings. Order matters: emails redact before phones so the digits of
a local-part never half-match a phone; IPv4 before phones so dotted
quads don't phone-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared pattern strings (Spark and the DuckDB oracle use these verbatim)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{1,3}[- ]\d{3,4}[- ]\d{3,4}[- ]?\d{0,4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_text_expr(text: Column) -> Column:
    """text with PII spans replaced by typed tokens (email → IPv4 →
    phone, in that order)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_md5, n_emails, n_ips, n_phones, has_pii):
    hit counts come from the same patterns applied in the same order
    (each count runs on the PREVIOUS stage's output, so an email's
    digits are never double-counted as a phone). Narrow output — the
    redacted text itself is re-derived in the write pass with the same
    expression."""
    text = F.col(text_col)
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(after_email, F.lit(IPV4_RE))
    n_phones = F.regexp_count(after_ip, F.lit(PHONE_RE))
    return df.select(
        "doc_id",
        F.md5(redact_text_expr(text)).alias("clean_md5"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).alias("has_pii"),
    )
