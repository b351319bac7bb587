"""PII detection and redaction — the privacy-scrub stage of a
training-data pipeline.

Every serious corpus pipeline strips contact information (emails,
phone numbers, host/IP addresses) before training; the operator is a
pure per-row regex projection — detect, count, replace with typed
placeholders — so at 100 TB it is embarrassingly parallel: no shuffle
until the final per-source census, filters and the scrubbed column
both stay inside whole-stage codegen.

Fixture note (same honesty contract as ``operators/multimodal.py``):
the synthetic corpus contains no organic PII, so the query INJECTS
deterministic contact strings derived from ``doc_id`` (every doc gets
an email, even ids a phone, ids divisible by 3 an IP) and then runs
the real redaction kernel over the result. The injection is the test
fixture; the detection/redaction regexes and the census are the
operator. Both engines build the identical probe text, so the oracle
checks the kernel end-to-end, including the zero-residual guarantee.

Regex portability: patterns avoid backreferences and lookaround so
Java's regex (Spark) and RE2 (DuckDB) agree; replacement is global on
both sides (Spark's regexp_replace default; DuckDB's 'g' flag).

Reference scope: no reference analogue — driver-mandated extension
layer (SURVEY.md section 2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

#: Portable PII patterns (Java regex == RE2 on these constructs).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-555-[0-9]{4}"
PII_IP = r"\b10\.0\.[0-9]{1,3}\.[0-9]{1,3}\b"

# One SQL expression per engine building the SAME probe text.
_DUCK_PROBE = """
    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
    || CASE WHEN doc_id % 2 = 0
            THEN ' call +1-555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
                 '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            ELSE '' END
"""


def _spark_probe() -> "F.Column":
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


def redact(col: "F.Column") -> "F.Column":
    """The redaction kernel: emails, then phones, then IPs, each
    replaced globally with a typed placeholder."""
    out = F.regexp_replace(col, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IP, "[IP]")


#: Shared census oracle — also the oracle of the streaming twin
#: (``streaming/micro_batch.py::streaming_pii_scrub``): the scrub is
#: stateless, so the streamed AvailableNow census equals the batch SQL.
PII_CENSUS_ORACLE = f"""
    WITH probe AS (
      SELECT source, ({_DUCK_PROBE}) AS p FROM documents
    ),
    scrubbed AS (
      SELECT source, p,
             regexp_replace(regexp_replace(regexp_replace(
               p, '{PII_EMAIL}', '[EMAIL]', 'g'),
                  '{PII_PHONE}', '[PHONE]', 'g'),
                  '{PII_IP}', '[IP]', 'g') AS r
      FROM probe
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(regexp_extract_all(p, '{PII_EMAIL}'))) AS BIGINT)
             AS n_emails,
           CAST(SUM(LEN(regexp_extract_all(p, '{PII_PHONE}'))) AS BIGINT)
             AS n_phones,
           CAST(SUM(LEN(regexp_extract_all(p, '{PII_IP}'))) AS BIGINT)
             AS n_ips,
           CAST(SUM(LEN(regexp_extract_all(r, '{PII_EMAIL}'))
                  + LEN(regexp_extract_all(r, '{PII_PHONE}'))
                  + LEN(regexp_extract_all(r, '{PII_IP}'))) AS BIGINT)
             AS residual_matches,
           CAST(SUM(LEN(p) - LEN(r)) AS BIGINT) AS redaction_delta_chars
    FROM scrubbed
    GROUP BY source
    """


def scrub_census(docs: DataFrame) -> DataFrame:
    """The full scrub + census kernel over a (source, text, doc_id)
    relation — batch or streaming (the expressions are stateless
    projections; only the final per-source aggregate carries state, so
    the streaming twin reuses this verbatim)."""
    probe = docs.select("source", _spark_probe().alias("p"))
    scrubbed = probe.select("source", "p", redact(F.col("p")).alias("r"))
    n = lambda c, pat: F.regexp_count(F.col(c), F.lit(pat))  # noqa: E731
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(n("p", PII_EMAIL)).cast("long").alias("n_emails"),
        F.sum(n("p", PII_PHONE)).cast("long").alias("n_phones"),
        F.sum(n("p", PII_IP)).cast("long").alias("n_ips"),
        F.sum(
            n("r", PII_EMAIL) + n("r", PII_PHONE) + n("r", PII_IP)
        )
        .cast("long")
        .alias("residual_matches"),
        F.sum(F.length("p") - F.length("r"))
        .cast("long")
        .alias("redaction_delta_chars"),
    )


@query("pii_redaction_census", oracle=PII_CENSUS_ORACLE)
def pii_redaction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII census: detected counts by type, the scrubbed
    text's residual match count (must be 0 — oracle-checked), and the
    net character delta of redaction."""
    return scrub_census(load_table(spark, sf_dir, "documents"))
