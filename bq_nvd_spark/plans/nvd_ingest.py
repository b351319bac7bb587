"""Oracle-checked queries over the REAL NVD ingest path (Layer A).

Unlike the star-schema analogs elsewhere in ``plans/``, these run the
actual pipeline surface — explicit-schema gz-JSON feed read (S2),
``CVE_Items`` wrapper projection (P1, reference bq_nvd/etl.py:77),
dotted-path projection (P2, bq.py:156-158), nested-array EXISTS with
LIKE (J2/P4, reference README.md:41-59), scalar COUNT of the nested ID
(A1, bq.py:125-127), and first-write-wins anti-join dedup (J1,
etl.py:80-92) — over committed NVD-1.1-shaped feed fixtures, with DuckDB
reading the very same ``.json.gz`` bytes as the oracle.

The fixtures are deterministic (tests/fixtures/nvd/make_fixtures.py) and
include the nasty cases: empty ``nodes``, missing ``configurations``
(NULL struct — EXISTS must drop, matching UNNEST-of-NULL semantics),
doubly-nested ``children[].cpe_match[]``, unknown JSON keys that schema
projection must discard, and overlapping IDs across feeds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.nvd.etl import ID_COL, cve_items, deltas_only, read_feed
from bq_nvd_spark.plans.registry import query

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
YEAR_FEED = os.path.join(_REPO_ROOT, "tests", "fixtures", "nvd", "nvdcve-1.1-2024.json.gz")
RECENT_FEED = os.path.join(
    _REPO_ROOT, "tests", "fixtures", "nvd", "nvdcve-1.1-recent.json.gz"
)

# DuckDB twin of read_feed + cve_items over the same gz bytes.
def _duck_items(path: str) -> str:
    return (
        f"SELECT UNNEST(CVE_Items) AS item FROM read_json('{path}', "
        "format='unstructured', records=true, maximum_object_size=16777216)"
    )


_DUCK_TS = "strptime({col}, '%Y-%m-%dT%H:%MZ')"


# --------------------------------------------------------------------------
# S2+P1+P2+F4: feed ingest — explicit-schema gz read, wrapper projection,
# dotted-path + timestamp-typed projection of every CVE.
@query(
    "nvd_feed_ingest",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.cve.CVE_data_meta.ID                           AS ID,
           item.cve.CVE_data_meta.ASSIGNER                     AS ASSIGNER,
           {_DUCK_TS.format(col='item.publishedDate')}         AS publishedDate,
           {_DUCK_TS.format(col='item.lastModifiedDate')}      AS lastModifiedDate,
           item.impact.baseMetricV3.cvssV3.baseSeverity        AS severity,
           item.impact.baseMetricV3.cvssV3.baseScore           AS base_score,
           len(item.configurations.nodes)                      AS n_nodes,
           len(item.cve."references".reference_data)           AS n_refs
    FROM feed
    """,
)
def nvd_feed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    return items.select(
        F.col("cve.CVE_data_meta.ID").alias("ID"),
        F.col("cve.CVE_data_meta.ASSIGNER").alias("ASSIGNER"),
        "publishedDate",
        "lastModifiedDate",
        F.col("impact.baseMetricV3.cvssV3.baseSeverity").alias("severity"),
        F.col("impact.baseMetricV3.cvssV3.baseScore").alias("base_score"),
        F.size("configurations.nodes").cast("long").alias("n_nodes"),
        F.size("cve.references.reference_data").cast("long").alias("n_refs"),
    )


# --------------------------------------------------------------------------
# A1: the reference's own count query — SELECT COUNT(cve.CVE_data_meta.ID)
# AS Count (bq_nvd/bq.py:125-127), null-skipping over the nested field.
@query(
    "nvd_count_cves",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT COUNT(item.cve.CVE_data_meta.ID) AS Count FROM feed
    """,
)
def nvd_count_cves(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    return items.agg(F.count(F.col(ID_COL)).alias("Count"))


# --------------------------------------------------------------------------
# J2+P4: the reference README's flagship — CVEs whose configuration tree
# contains a linux cpe23Uri (README.md:41-59: doubly-nested EXISTS +
# UNNEST + LIKE), extended one level to children[].cpe_match[] so the
# full 4-deep nesting is exercised. Per-row HOFs: no shuffle, no UNNEST
# blowup; NULL configurations rows drop exactly like UNNEST of NULL.
@query(
    "nvd_flagship_linux_cves",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.cve.CVE_data_meta.ID AS ID
    FROM feed
    WHERE len(list_filter(item.configurations.nodes,
              n -> len(list_filter(n.cpe_match,
                       m -> m.cpe23Uri LIKE '%linux%')) > 0
                OR len(list_filter(n.children,
                       c -> len(list_filter(c.cpe_match,
                                m -> m.cpe23Uri LIKE '%linux%')) > 0)) > 0
          )) > 0
    """,
)
def nvd_flagship_linux_cves(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    has_linux = lambda m: m["cpe23Uri"].like("%linux%")  # noqa: E731
    return items.filter(
        F.exists(
            "configurations.nodes",
            lambda n: F.exists(n["cpe_match"], has_linux)
            | F.exists(
                n["children"], lambda c: F.exists(c["cpe_match"], has_linux)
            ),
        )
    ).select(F.col(ID_COL).alias("ID"))


# --------------------------------------------------------------------------
# J1+A3 shape: first-write-wins dedup across feeds — the recent feed minus
# IDs already present in the year feed (existing rows win; the two
# re-published entries with later lastModifiedDate must NOT survive).
@query(
    "nvd_first_write_wins",
    oracle=f"""
    WITH year_feed AS ({_duck_items(YEAR_FEED)}),
         recent AS ({_duck_items(RECENT_FEED)})
    SELECT r.item.cve.CVE_data_meta.ID                      AS ID,
           {_DUCK_TS.format(col='r.item.lastModifiedDate')} AS lastModifiedDate
    FROM recent r
    WHERE NOT EXISTS (
      SELECT 1 FROM year_feed y
      WHERE y.item.cve.CVE_data_meta.ID = r.item.cve.CVE_data_meta.ID
    )
    """,
)
def nvd_first_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = cve_items(read_feed(spark, YEAR_FEED)).select(
        F.col(ID_COL).alias("ID")
    )
    incoming = cve_items(read_feed(spark, RECENT_FEED))
    delta = deltas_only(incoming, existing)
    return delta.select(F.col(ID_COL).alias("ID"), "lastModifiedDate")


# --------------------------------------------------------------------------
# Nested-projection analytics over the ingest: severity histogram from a
# 4-deep dotted path, the mirror's raison d'être (count-by-anything over
# the NVD, reference README.md:7).
@query(
    "nvd_severity_summary",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.impact.baseMetricV3.cvssV3.baseSeverity AS severity,
           COUNT(*)                                     AS n_cves,
           MIN(item.impact.baseMetricV3.cvssV3.baseScore) AS min_score,
           MAX(item.impact.baseMetricV3.cvssV3.baseScore) AS max_score
    FROM feed
    GROUP BY 1
    """,
)
def nvd_severity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    sev = F.col("impact.baseMetricV3.cvssV3.baseSeverity")
    score = F.col("impact.baseMetricV3.cvssV3.baseScore")
    return items.groupBy(sev.alias("severity")).agg(
        F.count(F.lit(1)).alias("n_cves"),
        F.min(score).alias("min_score"),
        F.max(score).alias("max_score"),
    )


# --------------------------------------------------------------------------
# F7 through the full nesting: explode nodes and children[].cpe_match,
# split the cpe23Uri, count affected products — the "join/count by
# anything" analytics the mirror exists for, over the deepest arrays.
@query(
    "nvd_cpe_product_counts",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    nodes AS (
      SELECT item.cve.CVE_data_meta.ID AS ID,
             UNNEST(item.configurations.nodes) AS nd
      FROM feed
    ),
    matches AS (
      SELECT ID, m.cpe23Uri AS uri
      FROM (SELECT ID, UNNEST(nd.cpe_match) AS m FROM nodes)
      UNION ALL
      SELECT ID, m.cpe23Uri AS uri
      FROM (
        SELECT ID, UNNEST(ch.cpe_match) AS m
        FROM (SELECT ID, UNNEST(nd.children) AS ch FROM nodes)
      )
    )
    SELECT split_part(uri, ':', 4) AS vendor,
           split_part(uri, ':', 5) AS product,
           COUNT(*)                AS n_matches,
           COUNT(DISTINCT ID)      AS n_cves
    FROM matches
    GROUP BY 1, 2
    """,
)
def nvd_cpe_product_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    nodes = items.select(
        F.col(ID_COL).alias("ID"), F.explode("configurations.nodes").alias("nd")
    )
    direct = nodes.select("ID", F.explode("nd.cpe_match").alias("m"))
    via_children = nodes.select(
        "ID", F.explode("nd.children").alias("ch")
    ).select("ID", F.explode("ch.cpe_match").alias("m"))
    parts = F.split(F.col("m.cpe23Uri"), ":")
    return (
        direct.unionByName(via_children)
        .select("ID", parts[3].alias("vendor"), parts[4].alias("product"))
        .groupBy("vendor", "product")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.countDistinct("ID").alias("n_cves"),
        )
    )


# --------------------------------------------------------------------------
# A4 over the ingest: per-assigner CVE stats (null-safe nested paths).
@query(
    "nvd_assigner_stats",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.cve.CVE_data_meta.ASSIGNER AS assigner,
           COUNT(*)                        AS n_cves,
           CAST(SUM(len(item.cve."references".reference_data)) AS BIGINT)
                                           AS total_refs,
           MAX(item.impact.baseMetricV3.cvssV3.baseScore) AS max_score
    FROM feed
    GROUP BY 1
    """,
)
def nvd_assigner_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    return items.groupBy(
        F.col("cve.CVE_data_meta.ASSIGNER").alias("assigner")
    ).agg(
        F.count(F.lit(1)).alias("n_cves"),
        F.sum(F.size("cve.references.reference_data").cast("long")).alias(
            "total_refs"
        ),
        F.max(F.col("impact.baseMetricV3.cvssV3.baseScore")).alias("max_score"),
    )


# --------------------------------------------------------------------------
# F2 over the ingest: regexp-parse the CVSS v3 vectorString back into its
# AV / UI codes (reference stores the raw string, bq_nvd/schema.json
# impact.baseMetricV3.cvssV3.vectorString) and cross-check them against
# the enum columns — a census of the (enum, parsed-code) combinations.
# regexp_extract with a capture group is identical in Spark and DuckDB,
# so this is a pure F2 parity exercise; codes_consistent must be true in
# every output row on well-formed feeds.
@query(
    "nvd_cvss_vector_parse",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    v3 AS (
      SELECT item.impact.baseMetricV3.cvssV3.vectorString    AS vs,
             item.impact.baseMetricV3.cvssV3.attackVector    AS attack_vector,
             item.impact.baseMetricV3.cvssV3.userInteraction AS user_interaction
      FROM feed
    ),
    parsed AS (
      SELECT attack_vector, user_interaction,
             regexp_extract(vs, '/AV:([A-Z])/', 1) AS av_code,
             regexp_extract(vs, '/UI:([A-Z])/', 1) AS ui_code
      FROM v3
    )
    SELECT attack_vector, user_interaction, av_code, ui_code,
           COUNT(*) AS n_cves,
           bool_and(
             av_code = CASE attack_vector
                         WHEN 'NETWORK' THEN 'N'
                         WHEN 'ADJACENT_NETWORK' THEN 'A'
                         WHEN 'LOCAL' THEN 'L'
                         WHEN 'PHYSICAL' THEN 'P'
                       END
             AND ui_code = CASE user_interaction
                             WHEN 'NONE' THEN 'N'
                             WHEN 'REQUIRED' THEN 'R'
                           END
           ) AS codes_consistent
    FROM parsed
    GROUP BY 1, 2, 3, 4
    """,
)
def nvd_cvss_vector_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    parsed = items.select(
        F.col("impact.baseMetricV3.cvssV3.attackVector").alias("attack_vector"),
        F.col("impact.baseMetricV3.cvssV3.userInteraction").alias(
            "user_interaction"
        ),
        F.regexp_extract(
            F.col("impact.baseMetricV3.cvssV3.vectorString"), r"/AV:([A-Z])/", 1
        ).alias("av_code"),
        F.regexp_extract(
            F.col("impact.baseMetricV3.cvssV3.vectorString"), r"/UI:([A-Z])/", 1
        ).alias("ui_code"),
    )
    av_expected = (
        F.when(F.col("attack_vector") == "NETWORK", "N")
        .when(F.col("attack_vector") == "ADJACENT_NETWORK", "A")
        .when(F.col("attack_vector") == "LOCAL", "L")
        .when(F.col("attack_vector") == "PHYSICAL", "P")
    )
    ui_expected = F.when(F.col("user_interaction") == "NONE", "N").when(
        F.col("user_interaction") == "REQUIRED", "R"
    )
    return parsed.groupBy(
        "attack_vector", "user_interaction", "av_code", "ui_code"
    ).agg(
        F.count(F.lit(1)).alias("n_cves"),
        F.bool_and(
            (F.col("av_code") == av_expected) & (F.col("ui_code") == ui_expected)
        ).alias("codes_consistent"),
    )


# --------------------------------------------------------------------------
# F7+A4: double explode through cve.references.reference_data[].tags[] —
# per-(refsource, tag) reference census. A CVE with an EMPTY
# reference_data array (fixture CVE-2024-0005) must vanish under the
# inner explode, matching DuckDB UNNEST semantics.
@query(
    "nvd_reference_tag_counts",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    refs AS (
      SELECT item.cve.CVE_data_meta.ID AS ID,
             UNNEST(item.cve."references".reference_data) AS ref
      FROM feed
    ),
    tagged AS (
      SELECT ID, ref.refsource AS refsource, UNNEST(ref.tags) AS tag
      FROM refs
    )
    SELECT refsource, tag,
           COUNT(*)           AS n_refs,
           COUNT(DISTINCT ID) AS n_cves
    FROM tagged
    GROUP BY 1, 2
    """,
)
def nvd_reference_tag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    refs = items.select(
        F.col(ID_COL).alias("ID"),
        F.explode("cve.references.reference_data").alias("ref"),
    )
    tagged = refs.select(
        "ID",
        F.col("ref.refsource").alias("refsource"),
        F.explode("ref.tags").alias("tag"),
    )
    return tagged.groupBy("refsource", "tag").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("ID").alias("n_cves"),
    )


# --------------------------------------------------------------------------
# A4 cross-tab: attack-vector × severity matrix with an EXACT score sum.
# base_score is summed as DECIMAL(4,1) in both engines (then cast to
# double for a schema-stable column) so the hash cannot drift on float
# summation order — the determinism rule the round-1 fold bug taught us.
@query(
    "nvd_av_severity_matrix",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.impact.baseMetricV3.cvssV3.attackVector  AS attack_vector,
           item.impact.baseMetricV3.cvssV3.baseSeverity  AS severity,
           COUNT(*)                                      AS n_cves,
           CAST(SUM(CAST(item.impact.baseMetricV3.cvssV3.baseScore
                         AS DECIMAL(4,1))) AS DOUBLE)    AS total_score
    FROM feed
    GROUP BY 1, 2
    """,
)
def nvd_av_severity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    return items.groupBy(
        F.col("impact.baseMetricV3.cvssV3.attackVector").alias("attack_vector"),
        F.col("impact.baseMetricV3.cvssV3.baseSeverity").alias("severity"),
    ).agg(
        F.count(F.lit(1)).alias("n_cves"),
        F.sum(
            F.col("impact.baseMetricV3.cvssV3.baseScore").cast("decimal(4,1)")
        )
        .cast("double")
        .alias("total_score"),
    )


# --------------------------------------------------------------------------
# F7+A4: CWE census — double explode through problemtype_data[].description[]
# (reference schema.json cve.problemtype), per-CWE CVE count and severity
# profile.
@query(
    "nvd_cwe_counts",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    pt AS (
      SELECT item.cve.CVE_data_meta.ID AS ID,
             item.impact.baseMetricV3.cvssV3.baseScore AS base_score,
             UNNEST(item.cve.problemtype.problemtype_data) AS pd
      FROM feed
    ),
    cwes AS (
      SELECT ID, base_score, d.value AS cwe
      FROM (SELECT ID, base_score, UNNEST(pd.description) AS d FROM pt)
    )
    SELECT cwe,
           COUNT(DISTINCT ID) AS n_cves,
           MAX(base_score)    AS max_score,
           MIN(base_score)    AS min_score
    FROM cwes
    GROUP BY 1
    """,
)
def nvd_cwe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    pt = items.select(
        F.col(ID_COL).alias("ID"),
        F.col("impact.baseMetricV3.cvssV3.baseScore").alias("base_score"),
        F.explode("cve.problemtype.problemtype_data").alias("pd"),
    )
    cwes = pt.select(
        "ID", "base_score", F.explode("pd.description").alias("d")
    ).select("ID", "base_score", F.col("d.value").alias("cwe"))
    return cwes.groupBy("cwe").agg(
        F.countDistinct("ID").alias("n_cves"),
        F.max("base_score").alias("max_score"),
        F.min("base_score").alias("min_score"),
    )


# --------------------------------------------------------------------------
# F5 over the ingest: published→lastModified lag in days, profiled per
# severity. The average divides an exact integer day-sum by the count in
# BOTH engines (never the engines' own AVG, whose accumulation strategy
# is unspecified), so the double result is bit-deterministic.
@query(
    "nvd_modification_lag",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    lags AS (
      SELECT item.impact.baseMetricV3.cvssV3.baseSeverity AS severity,
             date_diff('day',
                       CAST({_DUCK_TS.format(col='item.publishedDate')} AS DATE),
                       CAST({_DUCK_TS.format(col='item.lastModifiedDate')} AS DATE))
               AS lag_days
      FROM feed
    )
    SELECT severity,
           COUNT(*)                                   AS n_cves,
           CAST(SUM(lag_days) AS DOUBLE) / COUNT(*)   AS avg_lag_days,
           MAX(lag_days)                              AS max_lag_days
    FROM lags
    GROUP BY 1
    """,
)
def nvd_modification_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    lags = items.select(
        F.col("impact.baseMetricV3.cvssV3.baseSeverity").alias("severity"),
        F.datediff(F.to_date("lastModifiedDate"), F.to_date("publishedDate"))
        .cast("long")
        .alias("lag_days"),
    )
    return lags.groupBy("severity").agg(
        F.count(F.lit(1)).alias("n_cves"),
        (F.sum("lag_days").cast("double") / F.count(F.lit(1))).alias(
            "avg_lag_days"
        ),
        F.max("lag_days").alias("max_lag_days"),
    )


# --------------------------------------------------------------------------
# P2 depth: the CVSS v2 metric struct (reference schema.json
# impact.baseMetricV2) side by side with v3 — score gap per CVE plus the
# v2-only boolean/sub-score fields. Pure projection arithmetic on
# identical doubles, so the 1-decimal gap is bit-deterministic.
@query(
    "nvd_v2_v3_score_gap",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)})
    SELECT item.cve.CVE_data_meta.ID                            AS ID,
           item.impact.baseMetricV2.cvssV2.baseScore            AS v2_score,
           item.impact.baseMetricV3.cvssV3.baseScore            AS v3_score,
           FLOOR((item.impact.baseMetricV3.cvssV3.baseScore
                  - item.impact.baseMetricV2.cvssV2.baseScore) * 10 + 0.5) / 10
                                                                AS score_gap,
           item.impact.baseMetricV2.severity                    AS v2_severity,
           item.impact.baseMetricV3.cvssV3.baseSeverity         AS v3_severity,
           item.impact.baseMetricV2.exploitabilityScore         AS v2_exploitability,
           item.impact.baseMetricV2.userInteractionRequired     AS v2_ui_required
    FROM feed
    """,
)
def nvd_v2_v3_score_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    v2 = "impact.baseMetricV2"
    v3 = "impact.baseMetricV3.cvssV3"
    return items.select(
        F.col(ID_COL).alias("ID"),
        F.col(f"{v2}.cvssV2.baseScore").alias("v2_score"),
        F.col(f"{v3}.baseScore").alias("v3_score"),
        (
            F.floor(
                (F.col(f"{v3}.baseScore") - F.col(f"{v2}.cvssV2.baseScore")) * 10
                + 0.5
            )
            / 10
        ).alias("score_gap"),
        F.col(f"{v2}.severity").alias("v2_severity"),
        F.col(f"{v3}.baseSeverity").alias("v3_severity"),
        F.col(f"{v2}.exploitabilityScore").alias("v2_exploitability"),
        F.col(f"{v2}.userInteractionRequired").alias("v2_ui_required"),
    )


# --------------------------------------------------------------------------
# P2/F7 through the version-range fields: every vulnerable cpe_match
# (direct or under children[]) that carries a version bound, with its
# bound triple — the "which version ranges are affected" query the CPE
# dictionary exists for. NULL bounds on unbounded matches must survive
# the explode untouched on both engines.
@query(
    "nvd_version_bounds",
    oracle=f"""
    WITH feed AS ({_duck_items(YEAR_FEED)}),
    nodes AS (
      SELECT item.cve.CVE_data_meta.ID AS ID,
             UNNEST(item.configurations.nodes) AS nd
      FROM feed
    ),
    matches AS (
      SELECT ID, m.cpe23Uri AS uri, m.vulnerable AS vulnerable,
             m.versionStartIncluding AS v_start_incl,
             m.versionEndIncluding   AS v_end_incl,
             m.versionEndExcluding   AS v_end_excl
      FROM (SELECT ID, UNNEST(nd.cpe_match) AS m FROM nodes)
      UNION ALL
      -- DuckDB's JSON inference types children[].cpe_match from the keys
      -- the fixture data actually carries (only versionEndExcluding);
      -- the absent bounds are NULL under the Spark schema, so project
      -- them as literal NULLs here.
      SELECT ID, m.cpe23Uri, m.vulnerable,
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             m.versionEndExcluding
      FROM (
        SELECT ID, UNNEST(ch.cpe_match) AS m
        FROM (SELECT ID, UNNEST(nd.children) AS ch FROM nodes)
      )
    )
    SELECT ID, split_part(uri, ':', 5) AS product,
           v_start_incl, v_end_incl, v_end_excl
    FROM matches
    WHERE vulnerable
      AND (v_start_incl IS NOT NULL OR v_end_incl IS NOT NULL
           OR v_end_excl IS NOT NULL)
    """,
)
def nvd_version_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = cve_items(read_feed(spark, YEAR_FEED))
    nodes = items.select(
        F.col(ID_COL).alias("ID"), F.explode("configurations.nodes").alias("nd")
    )
    direct = nodes.select("ID", F.explode("nd.cpe_match").alias("m"))
    via_children = nodes.select(
        "ID", F.explode("nd.children").alias("ch")
    ).select("ID", F.explode("ch.cpe_match").alias("m"))
    matches = direct.unionByName(via_children).select(
        "ID",
        F.split(F.col("m.cpe23Uri"), ":")[4].alias("product"),
        F.col("m.vulnerable").alias("vulnerable"),
        F.col("m.versionStartIncluding").alias("v_start_incl"),
        F.col("m.versionEndIncluding").alias("v_end_incl"),
        F.col("m.versionEndExcluding").alias("v_end_excl"),
    )
    return matches.filter(
        F.col("vulnerable")
        & (
            F.col("v_start_incl").isNotNull()
            | F.col("v_end_incl").isNotNull()
            | F.col("v_end_excl").isNotNull()
        )
    ).drop("vulnerable")
