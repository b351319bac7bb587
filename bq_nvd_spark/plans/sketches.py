"""Approximate (sketch) aggregates — the 100 TB cardinality lever.

SURVEY.md §2.11's scale note says it directly: at 1000 executors you
reach for ``approx_count_distinct`` over exact wherever tolerable. An
exact COUNT(DISTINCT) shuffles every distinct value; the HyperLogLog++
sketch shuffles one ~KB register set per group and merges by register-
wise max — commutative and associative, so the result is independent
of partitioning (deterministic for a fixed dataset and rsd).

Cross-engine checking is structurally different here: DuckDB's
approx_count_distinct is a DIFFERENT HLL implementation, so the approx
values themselves can never hash-match. The two registered queries
split the contract accordingly:

- ``approx_distinct_users`` — daily active users (the canonical
  production sketch query, per-DAY groups) under the accuracy-bound
  contract: oracle emits the exact counts + literal TRUE, Spark
  computes the relative-error bound (3.5σ at rsd=0.02; see
  ``sketch_within_bound``). Through round 10 this query
  carried ``oracle=None`` (rows-only driver check) on the grounds that
  raw estimates can't hash-match; the bound contract covers the same
  machinery WITHOUT the permanent ``err: no_oracle`` row.
- ``sketch_distinct_accuracy`` — the same contract over per-EVENT-TYPE
  groups (few large groups vs many small daily ones; together the two
  cover both cardinality regimes of HLL++: dense estimation on big
  groups, sparse-exact on small ones).

Local tests additionally assert the error bound per group at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bq_nvd_spark.plans.registry import query
from bq_nvd_spark.sources.tables import load_table

RSD = 0.02  # relative standard deviation for HLL++; ~2% typical error


def sketch_within_bound(approx, exact, bound: float = 0.07):
    """The accuracy-bound oracle contract's Spark half, shared by every
    sketch-vs-exact query (the oracle emits literal TRUE; Spark computes
    this column, so a sketch drifting past the bound turns the driver's
    hash gate into an accuracy assertion). A group whose values are all
    NULL has ``exact`` = 0: the relative-error quotient would divide by
    zero (ANSI error / NULL vs the oracle's TRUE), so that case gates on
    the sketch agreeing the set is empty.

    Bound sizing: at rsd=0.02 the old 5% default was only 2.5σ — in
    HLL++'s dense regime (large per-group cardinalities at bigger SFs)
    ~1% of groups can legitimately exceed it, a latent dataset-dependent
    gate failure. 0.07 is 3.5σ (per-group exceedance P≈5e-4), which
    keeps the union-over-groups failure probability under ~5% up to
    ~100 groups; a deployment gating thousands of dense groups should
    widen further (max |Z| over n groups grows like sqrt(2·ln n))."""
    return F.when(exact == 0, approx == 0).otherwise(
        F.abs(approx - exact) / exact < bound
    )


@query(
    "approx_distinct_users",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users: sketched, gated against the exact count.

    DuckDB's HLL is a different implementation, so the raw estimate
    can never hash-match — instead the driver gate pins the sketch's
    relative error: ``within_bound`` is COMPUTED Spark-side
    (|approx − exact| / exact < 0.07 = 3.5σ at rsd=0.02) while
    the oracle emits the literal TRUE. Per-DAY groups complement the
    per-type twin: many small groups exercise HLL++'s sparse-exact
    regime, and at warehouse scale this exact query shape (daily
    actives) is the one the sketch exists for.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    within = sketch_within_bound(F.col("approx_users"), F.col("exact_users"))
    return agg.select("day", "exact_users", within.alias("within_bound"))


@query(
    "sketch_distinct_accuracy",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
)
def sketch_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group cardinalities plus the sketch-error assertion.

    ``within_bound`` is COMPUTED on the Spark side (|approx - exact| /
    exact < 0.07, 3.5σ at rsd=0.02) while the oracle emits the literal
    TRUE — the hash match fails if Spark's HLL++ ever drifts on any
    group, turning the driver gate into an accuracy bound for the
    sketch itself.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        sketch_within_bound(
            F.col("approx_users"), F.col("exact_users")
        ).alias("within_bound"),
    )


@query(
    "sketch_percentile_accuracy",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(FLOOR(MAX(CASE WHEN rn = (n + 1) // 2 THEN value END)
                      * 100 + 0.5) AS BIGINT) AS exact_p50_x100,
           TRUE AS within_tolerance
    FROM ranked
    GROUP BY event_type
    """,
)
def sketch_percentile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median per group plus a bound on the quantile sketch.

    ``approx_percentile`` (Greenwald-Khanna, accuracy=1000 ⇒ rank error
    ≤ n/1000) must land within 2% of the exact value for the driver
    hash to match — same contract shape as ``sketch_distinct_accuracy``:
    the oracle emits literal TRUE, Spark computes the comparison, so
    the gate bounds the sketch's error without demanding bit equality.

    The exact side is the lower median (ROW_NUMBER (n+1)//2 on the
    value order) — rank-based, so engines agree exactly; fixed to
    integer hundredths before hashing.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    exact = (
        ranked.filter(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"))
        .groupBy("event_type")
        .agg(F.max("value").alias("exact_p50"))
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("approx_p50")
    )
    err = F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.abs(F.col("exact_p50"))
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            F.floor(F.col("exact_p50") * 100 + 0.5).cast("bigint")
            .alias("exact_p50_x100"),
            (err < 0.02).alias("within_tolerance"),
        )
    )


# --------------------------------------------------------------------------
# Theta sketches: distinct-set ALGEBRA, not just cardinality. HLL can only
# union; Theta (Datasketches) supports intersection/difference, which is
# what cross-source overlap questions need at 100 TB — "how many users do
# segments A and B share" without a COUNT(DISTINCT) self-join shuffling
# every (user, segment) pair twice. One sketch per group (~KB) is shuffled;
# the pairwise set algebra then runs on the handful of aggregated rows.
@query(
    "theta_overlap_users",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS et_a,
           b.event_type AS et_b,
           CAST(COUNT(*) AS BIGINT) AS exact_overlap,
           TRUE AS within_5pct
    FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def theta_overlap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user overlap between event types, theta-sketched.

    Same contract shape as ``sketch_distinct_accuracy``: the oracle
    recomputes the EXACT overlap (distinct self-join) and emits literal
    TRUE; Spark computes ``|theta_estimate - exact| / exact < 0.05``,
    so the driver hash bounds the sketch-intersection error. The
    pairwise join runs over one aggregated row per event type — the
    expensive relation (events) is touched exactly twice (once to
    sketch, once for the exact check the oracle needs; at 100 TB you
    would ship only the sketch pass).
    """
    from bq_nvd_spark.operators.checkpoint import stage_checkpoint

    ev = load_table(spark, sf_dir, "events")
    # Three consumers (sketch pass + both sides of the exact self-join)
    # — materialize the distinct pairs once instead of re-scanning and
    # re-deduplicating events per consumer.
    du = stage_checkpoint(ev.select("event_type", "user_id").distinct())
    sk = du.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    a = sk.select(F.col("event_type").alias("et_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("et_b"), F.col("sk").alias("sk_b"))
    est = a.join(b, F.col("et_a") < F.col("et_b")).select(
        "et_a",
        "et_b",
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias("est"),
    )
    exact = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("et_a"),
            F.col("y.event_type").alias("et_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    err = F.abs(F.col("est") - F.col("exact_overlap")) / F.col("exact_overlap")
    return exact.join(est, ["et_a", "et_b"]).select(
        "et_a", "et_b", "exact_overlap", (err < 0.05).alias("within_5pct")
    )


# --------------------------------------------------------------------------
# KLL quantile sketch: mergeable quantiles with a RANK-error guarantee
# (vs percentile_approx's Greenwald-Khanna above). The accuracy gate is
# therefore stated in rank space — the realized rank of the KLL answer
# must land within 3% of the requested 0.9·n — which holds regardless of
# how the values are distributed (a value-space tolerance would be
# meaningless on clustered data).
@query(
    "kll_rank_accuracy",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(FLOOR(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                           THEN value END) * 100 + 0.5) AS BIGINT)
             AS exact_p90_x100,
           TRUE AS rank_within_3pct
    FROM ranked
    GROUP BY event_type
    """,
)
def kll_rank_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-based p90 per group plus a rank bound on the KLL sketch.

    The sketch side is one hash aggregation (KLL registers merge
    associatively — same shuffle shape as HLL); the realized rank of
    the sketch's answer is measured by a broadcast join of the 5-row
    quantile table back onto events. Oracle emits the exact p90 and
    literal TRUE; Spark computes the rank-error comparison, so a KLL
    regression past 3% rank error turns the driver row red.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    q = sk.select(
        "event_type",
        "n",
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("kll_p90"),
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    exact = (
        ranked.filter(F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"))
        .groupBy("event_type")
        .agg(F.max("value").alias("exact_p90"))
    )
    rank_of = (
        ev.join(F.broadcast(q.select("event_type", "kll_p90")), "event_type")
        .filter(F.col("value") <= F.col("kll_p90"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("rank_kll"))
    )
    res = exact.join(q, "event_type").join(rank_of, "event_type")
    ok = F.abs(F.col("rank_kll") - 0.9 * F.col("n")) <= 0.03 * F.col("n") + 1
    return res.select(
        "event_type",
        F.floor(F.col("exact_p90") * 100 + 0.5).cast("bigint").alias("exact_p90_x100"),
        ok.alias("rank_within_3pct"),
    )


# --------------------------------------------------------------------------
# E7e: heavy hitters — approximate frequent-item detection, the census
# that at 100 TB replaces "GROUP BY token ORDER BY count DESC" when only
# the handful of dominant values matter (boilerplate tokens, hot keys,
# abusive user ids). Spark ships the Karp–Shenker–Papadimitriou
# one-pass algorithm as ``df.stat.freqItems``: every item with relative
# frequency STRICTLY ABOVE the support threshold is guaranteed present
# (false positives possible, false negatives not). The query turns that
# guarantee into a driver-hashable contract, same shape as
# sketch_distinct_accuracy: the oracle emits the exact heavy hitters
# plus literal TRUE; Spark computes membership of each exact hitter in
# the sketch output, so the hash fails if freqItems ever drops a true
# heavy hitter.
HH_SUPPORT = 0.02  # tokens above 2% of all occurrences


@query(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS c FROM toks)
    SELECT tok, CAST(n AS BIGINT) AS n, TRUE AS in_sketch
    FROM counts, tot
    WHERE n > {HH_SUPPORT} * c
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens plus the freqItems-found-it assertion.

    Scale shape: the exact side is one explode into a map-side-combined
    token census (the same relation every text-analysis query builds);
    the total is a one-row broadcast; ``freqItems`` is a single
    O(1/support)-state pass over the token stream — no shuffle at all
    for the sketch, which is the point at 100 TB. The membership check
    joins the (tiny) exact-hitter relation against the one-row sketch
    result.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("c"))
    hitters = counts.join(F.broadcast(tot)).filter(
        F.col("n") > HH_SUPPORT * F.col("c")
    )
    sketch = toks.stat.freqItems(["tok"], support=HH_SUPPORT)  # 1 row
    return hitters.join(F.broadcast(sketch)).select(
        "tok",
        "n",
        F.array_contains(F.col("tok_freqItems"), F.col("tok")).alias("in_sketch"),
    )


# --------------------------------------------------------------------------
# Count-Min Sketch: the point-frequency member of the sketch family
# (HLL++ = distinct counts, GK/KLL = quantiles, Theta = set algebra,
# freqItems = heavy-hitter MEMBERSHIP, CMS = heavy-hitter FREQUENCY).
# Implemented as pure DataFrame ops rather than an opaque binary: the
# d x w counter grid is a (row_idx, bucket) aggregate — the sketch
# state is BOUNDED (d*w cells) no matter how many events stream in,
# and map-side partial aggregation means the shuffle carries at most
# tasks x d x w rows at 100 TB. Estimation joins the probe keys
# against the broadcast grid and takes min over the d rows.
#
# Determinism: xxhash64 with fixed per-row salts — for a fixed dataset
# the sketch, the estimates, and both gate columns are exactly
# reproducible (no RNG), so driver evidence is stable.
#
# Bound margin (ADVICE r13, adjudicated r14): the ⌈e·N/w⌉ bound is
# probabilistic per the Markov argument (~e^-CMS_DEPTH ≈ 1.8% per
# point at depth 4), so a fixture REGENERATION could in principle land
# a point past it with a correct sketch. Depth stays at 4: the
# fixtures are deterministic (no regeneration path exists in this
# repo), the measured worst case at sf0.1 is 181 against a 531 bound
# (~3× margin at the largest SF, re-checked by every mirror run), and
# the failure mode, were fixtures ever regenerated, is a loud driver
# hash mismatch on a gate column — the contract working as designed,
# not silent corruption. Deepening to 5 would cost every reader 25%
# more grid rows to buy headroom against an event that cannot
# currently occur.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 20
_CMS_E = 2.718281828459045  # eps = e/width in the classic CMS bound


def _cms_rows() -> "F.Column":
    return F.explode(F.array([F.lit(i) for i in range(CMS_DEPTH)]))


def _cms_bucket() -> "F.Column":
    return F.pmod(
        F.xxhash64(F.col("user_id"), F.col("row_idx")), F.lit(CMS_WIDTH)
    )


@query(
    "cms_user_freq_accuracy",
    oracle=f"""
    WITH exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM events GROUP BY user_id
    )
    SELECT user_id, exact_count,
           TRUE AS overcount_ok, TRUE AS within_bound
    FROM exact
    ORDER BY exact_count DESC, user_id
    LIMIT {CMS_TOPK}
    """,
)
def cms_user_freq_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates for the top-K users, gated.

    Same accuracy-bound oracle contract as the HLL/Theta/KLL queries:
    the oracle emits the exact counts + literal TRUE; Spark computes
    both CMS guarantees — ``overcount_ok`` (a CMS estimate can never
    undercount: structural, must ALWAYS hold) and ``within_bound``
    (est − exact ≤ ceil(e·N/w), the classic Markov bound at depth 4,
    P[exceed] ≤ e⁻⁴ per point; deterministic here for a fixed dataset,
    verified at all three SFs). A broken bucket hash, a lost counter,
    or min-over-rows taken on the wrong key flips a flag and fails the
    driver's hash gate.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    # d x w counter grid: one explode (xD) into a bounded aggregate
    cells = (
        ev.select(_cms_rows().alias("row_idx"), "user_id")
        .select("row_idx", _cms_bucket().alias("bucket"))
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cell_count"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    n_tot = exact.agg(F.sum("exact_count").cast("long").alias("n"))
    top = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(
        CMS_TOPK
    )
    est = (
        top.select("user_id", "exact_count", _cms_rows().alias("row_idx"))
        .select("user_id", "exact_count", "row_idx", _cms_bucket().alias("bucket"))
        .join(F.broadcast(cells), ["row_idx", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cell_count").alias("est"))
    )
    return est.crossJoin(F.broadcast(n_tot)).select(
        "user_id",
        "exact_count",
        (F.col("est") >= F.col("exact_count")).alias("overcount_ok"),
        (
            F.col("est") - F.col("exact_count")
            <= F.ceil(F.lit(_CMS_E) * F.col("n") / CMS_WIDTH)
        ).alias("within_bound"),
    )
