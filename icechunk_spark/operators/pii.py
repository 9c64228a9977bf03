"""PII detection/redaction operators (SURVEY.md §2e extension) — the
scrubbing stage every production training-data pipeline runs before
export (emails, phone numbers, IP addresses).

The synthetic corpus is PII-free word salad, so each query first
derives a deterministic PII-bearing column from (doc_id, text): docs
with doc_id % 7 == 0 gain an email, % 11 a phone, % 13 an IPv4 — the
same CASE expressions in Spark and the DuckDB oracle, so detection
and redaction are exercised on real regex matches, not on a
vacuously-zero corpus.

Regex parity: the three patterns use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, \\b, \\d; no backreferences or
lookaround (RE2 has neither).

Scale design:
- Both queries are a single scan with JVM-side regexp_count /
  regexp_replace inside codegen — no Python, no joins.  pii_stats
  aggregates per source with map-side partial sums; pii_redact is
  embarrassingly parallel per row (the redacted text is fingerprinted
  with md5 so the oracle verifies the exact redaction output without
  shipping full text through the gate).
- At 100 TB this is the cheapest possible shape: scan → project →
  (tiny) aggregate.  Redaction output would be written straight back
  to parquet with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from icechunk_spark.catalog import load_tables

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def _pii_text() -> Column:
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" contact user"), s(did), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad(s(did % 1000), 3, "0"),
            F.lit("-"),
            F.lpad(s(did % 10000), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" from 10."), s(did % 256), F.lit("."), s((did * 7) % 256), F.lit(".42")
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


_DUCK_PII_TEXT = """
  text
  || CASE WHEN doc_id % 7 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
          ELSE '' END
  || CASE WHEN doc_id % 11 = 0
          THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 13 = 0
          THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
               || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.42'
          ELSE '' END
"""


def pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII census: doc counts and match totals per type."""
    docs = load_tables(spark, sf_dir)["documents"]
    t = _pii_text()
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phone = F.regexp_count(t, F.lit(PHONE_RE))
    n_ip = F.regexp_count(t, F.lit(IP_RE))
    hit = ((n_email + n_phone + n_ip) > 0).cast("bigint")
    return (
        docs.select(
            "source",
            n_email.alias("ne"),
            n_phone.alias("np"),
            n_ip.alias("ni"),
            hit.alias("hit"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").alias("docs_with_pii"),
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
            F.sum("ni").alias("n_ips"),
        )
        .orderBy("source")
    )


PII_STATS_SQL = f"""
WITH p AS (
  SELECT source,
         len(regexp_extract_all(pt, '{EMAIL_RE}')) AS ne,
         len(regexp_extract_all(pt, '{PHONE_RE}')) AS np,
         len(regexp_extract_all(pt, '{IP_RE}')) AS ni
  FROM (SELECT source, {_DUCK_PII_TEXT} AS pt FROM documents)
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CAST(ne + np + ni > 0 AS BIGINT)) AS BIGINT) AS docs_with_pii,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(np) AS BIGINT) AS n_phones,
       CAST(sum(ni) AS BIGINT) AS n_ips
FROM p GROUP BY source ORDER BY source
"""


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc redaction: replace every email/phone/IP with a typed
    token; output the md5 fingerprint of the redacted text (the
    oracle thereby checks the exact redacted bytes) + match count."""
    docs = load_tables(spark, sf_dir)["documents"]
    t = _pii_text()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    n_pii = (
        F.regexp_count(t, F.lit(EMAIL_RE))
        + F.regexp_count(t, F.lit(PHONE_RE))
        + F.regexp_count(t, F.lit(IP_RE))
    )
    return docs.select(
        "doc_id", n_pii.alias("n_pii"), F.md5(red).alias("redacted_fp")
    ).orderBy("doc_id")


PII_REDACT_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(pt, '{EMAIL_RE}'))
         + len(regexp_extract_all(pt, '{PHONE_RE}'))
         + len(regexp_extract_all(pt, '{IP_RE}')) AS n_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(pt,
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
             '{IP_RE}', '<IP>', 'g')) AS redacted_fp
FROM (SELECT doc_id, {_DUCK_PII_TEXT} AS pt FROM documents)
ORDER BY doc_id
"""


QUERIES = {
    "pii_stats": pii_stats,
    "pii_redact": pii_redact,
}

ORACLES = {
    "pii_stats": PII_STATS_SQL,
    "pii_redact": PII_REDACT_SQL,
}
