"""Distributed exact order-statistic selection (no global sort).

The single-task trap: ``Window.orderBy(...)`` with no ``partitionBy``
(or a partition on a handful of keys) funnels the whole relation
through one sort task — the canonical scale-killer for exact
quantiles, NTILE cutoffs, and medians. This operator computes the
exact value at any 1-based rank of an integer column with a
histogram-refinement loop instead:

1. one map-side-combined aggregate for per-group ``(min, max, count)``;
2. per refinement round, ONE full-relation pass that bucket-counts
   every still-unresolved target's value range into ``n_buckets``
   fixed-width integer buckets (a ``groupBy`` over ≤ targets×n_buckets
   rows — map-side combined, never a sort);
3. driver-side cumulative walk over that small histogram picks the
   bucket containing the target rank and recurses into its sub-range
   with the residual rank.

Each round divides the candidate value span by at least
``n_buckets/2`` (the bucketing tiles the line with ABSOLUTE
truncating-div cells — overflow-free even when the span exceeds 2^63
— whose k=0 cell is double-width), so a full int64 span resolves in
≤ ⌈64/log2(n_buckets/2)⌉ = 6 rounds; spans from real metrics (dates,
counts, cents) resolve in 1–3. Every round
is an embarrassingly parallel scan + tiny shuffle — the plan contains
no Window and no global sort, and survives a 1000-executor 100 TB
deployment where the window form serializes on one task.

Driver-side state is bounded: ``groups × labels`` target records and a
``targets × n_buckets`` histogram per round. Grouped selection is
therefore designed for LOW-cardinality group columns (the shape that
needs rescuing from a few-key partitioned window — e.g. a per-type
median over ~5 event types). For high-cardinality groups a plain
``Window.partitionBy(group)`` is already scale-safe; use that instead.

Reference parity note: the reference pipeline (redteam-project/bq-nvd)
delegates quantile work to its warehouse; this operator is the
Spark-native equivalent of the warehouse's distributed APPROX/EXACT
quantile machinery, kept exact so results stay oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GroupValue = object  # a group-column value, or None for ungrouped calls

# Refinement rounds build one `when()` entry per live (group, label)
# target into a per-row array — O(rows × targets) scan work and
# groups×labels driver state. The low-cardinality design constraint
# (module docstring) is enforced here so a high-cardinality group_col
# fails loudly instead of degrading into a huge per-row expression and
# driver collect; raise it only for a workload you have measured.
MAX_LIVE_TARGETS = 4096


def exact_rank_values(
    df: DataFrame,
    value_col: str,
    rank_fn: Callable[[int], dict[str, int]],
    group_col: str | None = None,
    n_buckets: int = 8192,
    weight_col: str | None = None,
    max_targets: int = MAX_LIVE_TARGETS,
) -> dict[GroupValue, dict[str, int]]:
    """Exact value of ``value_col`` at chosen ranks, per group.

    ``value_col`` must be integral (cast to long internally — exactness
    relies on integer bucket arithmetic; quantize floats to cents/
    micros first, as every plan in this engine already does).
    ``rank_fn(n)`` maps a group's row count to ``{label: rank}`` with
    1-based ranks in ``[1, n]`` — e.g. lower-median is
    ``lambda n: {"med": (n + 1) // 2}``. Returns
    ``{group_value: {label: value_at_rank}}``; ungrouped calls
    (``group_col=None``) key the single group as ``None``.

    ``weight_col`` makes the selection WEIGHTED: each row stands for
    ``weight`` repetitions of its value (weights must be positive
    integers), so ranks address the expanded multiset. This is the
    census fast path: pre-aggregating a quantized domain to
    ``(value, count)`` rows lets every selector scan run over the
    distinct-value relation instead of the fact table — one fact scan
    total, selector passes over a domain-bounded census.

    The value at rank k (ascending, ties collapsed onto one value) is
    tie-break-independent, so the result is deterministic and matches
    any engine's ``ROW_NUMBER() OVER (ORDER BY v <any tiebreak>)``
    selection of row k.
    """
    # The k=0 cell of the truncating-div tiling below is double-width
    # (2w-1); with fewer than 4 buckets a zero-straddling range could
    # fail to shrink between rounds, so clamp.
    n_buckets = max(int(n_buckets), 4)
    gexpr = (
        F.lit(None) if group_col is None else F.col(group_col)
    ).alias("__g")
    wexpr = (
        F.lit(1) if weight_col is None else F.col(weight_col)
    ).cast("long").alias("__w")
    raw_w = (
        F.lit(1) if weight_col is None else F.col(weight_col)
    ).alias("__wraw")
    rel = df.select(
        gexpr, F.col(value_col).cast("long").alias("__v"), wexpr, raw_w
    ).filter(F.col("__v").isNotNull())
    stats = (
        rel.groupBy("__g")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.sum("__w").alias("n"),
            # weight-contract check rides the same aggregate for free:
            # two extra columns, no extra pass. Integrality is checked
            # against the RAW column — __w is already cast("long"), and
            # validating the cast value would let 2.7 truncate to 2 and
            # sail through the "positive integers" contract.
            F.min("__w").alias("wmin"),
            F.count(F.lit(1)).alias("nrows"),
            F.count("__w").alias("nweights"),
            F.sum(
                F.when(
                    F.col("__wraw").cast("double")
                    != F.col("__wraw").cast("long").cast("double"),
                    1,
                ).otherwise(0)
            ).alias("nfrac"),
        )
        .collect()
    )
    if weight_col is not None:
        for row in stats:
            if (
                row["nweights"] < row["nrows"]
                or (row["wmin"] is not None and row["wmin"] <= 0)
                or (row["nfrac"] or 0) > 0
            ):
                problems = []
                if row["nweights"] < row["nrows"]:
                    problems.append("NULL weights")
                if row["wmin"] is not None and row["wmin"] <= 0:
                    problems.append(f"min weight {row['wmin']!r}")
                if (row["nfrac"] or 0) > 0:
                    problems.append(f"{row['nfrac']} fractional weights")
                raise ValueError(
                    f"weight_col {weight_col!r} must be positive integers: "
                    f"group {row['__g']!r} has " + ", ".join(problems)
                    + " — such weights silently skew ranks"
                )

    out: dict[GroupValue, dict[str, int]] = {}
    # (group, label) -> candidate range [lo, hi] + residual rank within it
    live: dict[tuple, dict] = {}
    for row in stats:
        g = row["__g"]
        for label, rank in rank_fn(row["n"]).items():
            if not 1 <= rank <= row["n"]:
                raise ValueError(
                    f"rank {rank} out of [1, {row['n']}] for group {g!r}"
                )
            if row["lo"] == row["hi"]:
                out.setdefault(g, {})[label] = row["lo"]
            else:
                live[(g, label)] = {
                    "lo": row["lo"], "hi": row["hi"], "rank": rank,
                }

    if len(live) > max_targets:
        raise ValueError(
            f"{len(live)} live (group, label) targets exceed max_targets="
            f"{max_targets}: exact_rank_values is designed for "
            "LOW-cardinality group columns (each refinement scan does "
            "O(rows x targets) work). Use Window.partitionBy(group) for "
            "high-cardinality groups, or raise max_targets deliberately."
        )

    while live:
        tlist = list(live.items())
        entries = []
        for tid, ((g, _label), t) in enumerate(tlist):
            # span as a Python int (arbitrary precision): the range can
            # straddle the int64 extremes, where `hi - lo` itself
            # exceeds 2^63.
            span = t["hi"] - t["lo"] + 1
            w = -(-span // n_buckets)  # ceil; >= 1
            t["w"] = w
            # ABSOLUTE cells, `__v div w`, never `(__v - lo) div w`:
            # anchoring at lo overflows int64 whenever the span exceeds
            # 2^63 (e.g. xxhash64/simhash columns) — ANSI mode crashes,
            # non-ANSI silently misbuckets. A truncating div of the
            # value alone cannot overflow (w > 0), and it still tiles
            # the line into contiguous runs the driver can invert: cell
            # k>0 covers [kw, kw+w-1], k<0 covers [kw-w+1, kw], and the
            # k=0 cell is the double-width [-(w-1), w-1] — at most
            # 2·n_buckets+1 cells per round, same O(log span) descent.
            cell = F.expr(f"__v div {w}L")
            grp_match = (
                F.col("__g").isNull()
                if g is None
                else F.col("__g").eqNullSafe(F.lit(g))
            )
            cond = grp_match & F.col("__v").between(t["lo"], t["hi"])
            entries.append(
                F.when(
                    cond, F.struct(F.lit(tid).alias("t"), cell.alias("b"))
                )
            )
        hist = (
            rel.select(
                F.explode(F.array(*entries)).alias("e"), F.col("__w")
            )
            .filter(F.col("e").isNotNull())
            .groupBy(F.col("e.t").alias("t"), F.col("e.b").alias("b"))
            .agg(F.sum("__w").alias("c"))
            .collect()
        )
        counts: dict[int, dict[int, int]] = {}
        for r in hist:
            counts.setdefault(r["t"], {})[r["b"]] = r["c"]

        nxt: dict[tuple, dict] = {}
        for tid, ((g, label), t) in enumerate(tlist):
            cum, rank, w = 0, t["rank"], t["w"]
            for k in sorted(counts.get(tid, {})):
                c = counts[tid][k]
                if cum + c >= rank:
                    # invert the truncating div: this cell's value range
                    if k > 0:
                        blo, bhi = k * w, k * w + w - 1
                    elif k < 0:
                        blo, bhi = k * w - w + 1, k * w
                    else:
                        blo, bhi = -(w - 1), w - 1
                    blo, bhi = max(blo, t["lo"]), min(bhi, t["hi"])
                    if blo == bhi:
                        out.setdefault(g, {})[label] = blo
                    else:
                        nxt[(g, label)] = {
                            "lo": blo, "hi": bhi, "rank": rank - cum,
                        }
                    break
                cum += c
            else:  # unreachable while rank <= rows-in-range invariant holds
                raise AssertionError(
                    f"rank {rank} not reached in range for group {g!r}"
                )
        live = nxt
    return out
