"""Behavioral tests for the learned-filter classifier (plans/classify)
and the PII redaction census (plans/privacy).

Oracle parity at 3 SFs is checked by the driver/mirror; these tests pin
the PROPERTIES the oracles can't express directly: split accounting,
classifier sanity, the zero-residual redaction guarantee, and the
kernel's behavior on adversarial literal text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bq_nvd_spark.plans import QUERIES
from bq_nvd_spark.plans.privacy import PII_EMAIL, PII_IP, PII_PHONE, redact
from bq_nvd_spark.plans.sampling import TRAIN_END, _spark_bucket
from bq_nvd_spark.sources.tables import load_table


def test_nb_confusion_accounts_for_every_classifiable_doc(spark, sf_dir):
    conf = QUERIES["nb_lang_confusion"](spark, sf_dir)
    rows = conf.collect()
    total = sum(r.n_docs for r in rows)
    # every held-out doc is classifiable here: the synthetic lexicon is
    # shared, so no doc is 100% out-of-vocabulary at any SF
    held = (
        load_table(spark, sf_dir, "documents")
        .filter(_spark_bucket() >= TRAIN_END)
        .count()
    )
    assert total == held
    # predictions come only from trained classes
    train_langs = {
        r.lang
        for r in load_table(spark, sf_dir, "documents")
        .filter(_spark_bucket() < TRAIN_END)
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r.pred_lang for r in rows} <= train_langs


def test_nb_beats_chance_on_synthetic_langs(spark, sf_dir):
    # The synthetic generator gives each lang a distinct token mix, so
    # a working NB must put more mass on the diagonal than chance (1/5
    # classes). A broken scorer (e.g. argmax over garbage) fails this.
    rows = QUERIES["nb_lang_confusion"](spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.actual_lang == r.pred_lang)
    assert diag / total > 0.2, f"accuracy {diag}/{total} is at/below chance"


def test_pii_census_counts_match_injection_arithmetic(spark, sf_dir):
    census = {r.source: r for r in QUERIES["pii_redaction_census"](spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("even"),
            F.sum((F.col("doc_id") % 3 == 0).cast("long")).alias("div3"),
        )
        .collect()
    )
    for r in docs:
        c = census[r.source]
        assert c.n_emails == r.n  # every doc gets exactly one email
        assert c.n_phones == r.even
        assert c.n_ips == r.div3
        assert c.residual_matches == 0  # scrub is total


def test_redact_kernel_on_adversarial_literals(spark):
    df = spark.createDataFrame(
        [
            ("a@b.co and c.d-e@f.g.com twice",),
            ("call +1-555-0199 then +1-555-1234",),
            ("host 10.0.7.200, not 192.168.1.1 or 10.0.300x",),
            ("no pii at all",),
        ],
        "t string",
    ).select(redact(F.col("t")).alias("r"))
    out = [r.r for r in df.collect()]
    assert out[0] == "[EMAIL] and [EMAIL] twice"
    assert out[1] == "call [PHONE] then [PHONE]"
    # 192.168.* is out of scope for the 10.0.* pattern; "10.0.300x"
    # still matches its first 3 digits via {1,3} — a documented
    # property of bounded-quantifier IP regexes, identical cross-engine
    assert out[2].startswith("host [IP], not 192.168.1.1")
    assert out[3] == "no pii at all"
    for pat in (PII_EMAIL, PII_PHONE):
        assert not any("@" in r or "+1-555" in r for r in out), pat
