"""Stress the round-10 capped-bucket paths at degenerate scale.

The sf fixtures' largest LSH bucket holds 28 members; the claims that
matter at 100 TB are about buckets MILLIONS deep (mass near-duplicates
collapsing onto one signature). This probe synthesizes band relations
with exactly that shape — a uniform field of small buckets plus one
mega-bucket — at 10⁷-scale row counts, far past anything the fixtures
exercise, and measures the paths end-to-end on local[32]:

1. ``_capped_pairs`` (MinHash twin) over N uniform rows + one M-member
   mega-bucket, no document text supplied: output must be the uniform
   buckets' pairs only (the mega-bucket is dropped by the cap), wall
   must stay minutes-not-hours, and the window count must SPILL the
   mega-bucket rather than OOM a single aggregation row.
1b. ``_capped_pairs`` WITH text (round 11 refine-then-star): the same
   mega-bucket, now of identical documents, must survive as exactly
   M−1 min-id star pairs — the refine kernel runs only on mega
   members and the second window spills like the first.
2. ``_emb_bucket_pairs`` (embedding twin) with an M-member mega-bucket
   of identical vectors: output must include exactly M−1 star pairs
   (the min-id anchor keeps the duplicate cluster connected) on top of
   the uniform pairs — O(m) emission from O(m²) worth of true pairs.
3. ``exact_rank_values`` over N uniform longs (weighted census mode):
   exact median/p99 of a 10⁷-row relation with no Window and no sort.
4. ``connected_components`` over a high-diameter chain FOREST (round
   12): ~10⁷ edges as N/diam disjoint paths, each chain's minimum id at
   one END so the label must walk the full diameter — the adversarial
   shape for min-label propagation's round count (near-dup clusters are
   clique-ish, diameter 1–2, so fixtures never stress the iteration).
   Asserts the exact component structure with ``max_iter`` pinned at
   diameter+1, which doubles as a proof the round count stayed at the
   diameter bound.

Prints one JSON line per probe; results are recorded in SCALE.md.

Usage: python scripts/degenerate_scale_probe.py [--n 20000000] [--mega 2000000]
       [--only minhash_capped,cc_chain_forest]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--mega", type=int, default=2_000_000)
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated probe names to run (default: all)",
    )
    args = ap.parse_args()
    only = {p for p in args.only.split(",") if p}
    known = {
        "minhash_capped",
        "minhash_refine_star",
        "embedding_star",
        "rank_select",
        "cc_chain_forest",
    }
    unknown = only - known
    if unknown:
        # A typo'd --only would otherwise run ZERO probes and exit 0 —
        # a regression gate that silently reports success.
        raise SystemExit(
            f"unknown probe name(s): {sorted(unknown)}; known: {sorted(known)}"
        )

    def want(name: str) -> bool:
        return not only or name in only

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("degenerate-scale-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PROBE_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bq_nvd_spark.plans.llm import PAIR_BUCKET_CAP, _capped_pairs
    from bq_nvd_spark.plans.similarity_search import _emb_bucket_pairs
    from bq_nvd_spark.operators.rank_select import exact_rank_values

    results = {}

    # Shared synthetic band relation (probes 1 and 1b): uniform field of
    # ~10-member buckets (hash-derived ids, all pass the cap) plus one
    # M-member mega-bucket sharing a single signature.
    per_bucket = 10
    uniform = spark.range(args.n).select(
        F.lit(0).alias("band_idx"),
        F.concat(F.lit("u"), (F.col("id") / per_bucket).cast("long").cast("string")).alias("band_sig"),
        F.col("id").alias("doc_id"),
    )
    mega = spark.range(args.mega).select(
        F.lit(0).alias("band_idx"),
        F.lit("MEGA").alias("band_sig"),
        (F.col("id") + args.n).alias("doc_id"),
    )
    expect = (args.n // per_bucket) * (per_bucket * (per_bucket - 1) // 2)

    if want('minhash_capped'):
        # -- 1. MinHash capped pairs: no text -> mega-bucket dropped -------
        t0 = time.perf_counter()
        n_pairs = _capped_pairs(uniform.unionByName(mega)).count()
        wall = time.perf_counter() - t0
        results["minhash_capped"] = {
            "rows": args.n + args.mega,
            "mega_members": args.mega,
            "pairs": n_pairs,
            "pairs_expected": expect,
            "ok": n_pairs == expect,
            "wall_sec": round(wall, 1),
        }
        print(json.dumps({"probe": "minhash_capped", **results["minhash_capped"]}))

    if want('minhash_refine_star'):
        # -- 1b. MinHash refine-then-star: mega-bucket of IDENTICAL texts --
        # With document text supplied, the mega-bucket is no longer dropped:
        # identical texts share every refine minhash, so the refined
        # sub-bucket is still past the cap and the star fallback must emit
        # exactly M−1 anchor pairs. The Arrow refine kernel runs ONLY on the
        # mega members (pruned by the distinct-id join) and its per-batch
        # token memoization makes identical texts the cheap case — the
        # expensive part under test is the (band, sig, rsig) re-window over
        # a 2M-row partition, which must spill rather than buffer.
        texts = spark.range(args.n + args.mega).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") >= args.n, F.lit("mass duplicated boilerplate doc")
            )
            .otherwise(F.concat(F.lit("unique tok"), F.col("id").cast("string")))
            .alias("text"),
        )
        t0 = time.perf_counter()
        out = _capped_pairs(uniform.unionByName(mega), texts)
        n_star = out.filter(F.col("doc_a") == args.n).count()
        n_all = out.count()
        wall = time.perf_counter() - t0
        results["minhash_refine_star"] = {
            "rows": args.n + args.mega,
            "mega_members": args.mega,
            "star_pairs": n_star,
            "star_expected": args.mega - 1,
            "total_pairs": n_all,
            "total_expected": expect + args.mega - 1,
            "ok": n_star == args.mega - 1 and n_all == expect + args.mega - 1,
            "wall_sec": round(wall, 1),
        }
        print(
            json.dumps(
                {"probe": "minhash_refine_star", **results["minhash_refine_star"]}
            )
        )

    if want('embedding_star'):
        # -- 2. Embedding star path: mega-bucket of identical vectors ------
        # Small 8-dim vectors keep synthesis cheap; the path under test is
        # the window/star machinery, not the cosine kernel.
        dim_vec = F.array(*[F.lit(1.0) for _ in range(8)])
        emb_n = max(args.n // 10, 1_000_000)
        uniform_e = spark.range(emb_n).select(
            F.col("id").alias("vec_id"),
            dim_vec.alias("v"),
            F.lit(2.8284271247461903).alias("nrm"),
            F.array((F.col("id") / 5).cast("int") + 1000).alias("bands"),
        )
        mega_e = spark.range(args.mega).select(
            (F.col("id") + emb_n).alias("vec_id"),
            dim_vec.alias("v"),
            F.lit(2.8284271247461903).alias("nrm"),
            F.array(F.lit(7)).alias("bands"),
        )
        t0 = time.perf_counter()
        out = _emb_bucket_pairs(uniform_e.unionByName(mega_e))
        n_star = out.filter(F.col("id_a") == emb_n).count()
        n_all = out.count()
        wall = time.perf_counter() - t0
        expect_star = args.mega - 1
        expect_uniform = (emb_n // 5) * (5 * 4 // 2)
        results["embedding_star"] = {
            "rows": emb_n + args.mega,
            "mega_members": args.mega,
            "star_pairs": n_star,
            "star_expected": expect_star,
            "total_pairs": n_all,
            "total_expected": expect_star + expect_uniform,
            "ok": n_star == expect_star and n_all == expect_star + expect_uniform,
            "wall_sec": round(wall, 1),
        }
        print(json.dumps({"probe": "embedding_star", **results["embedding_star"]}))

    if want('rank_select'):
        # -- 3. Exact rank selection over 10^7 longs ------------------------
        vals = spark.range(args.n).select(
            (F.xxhash64(F.col("id")) % 1_000_000_007).alias("v")
        )
        t0 = time.perf_counter()
        got = exact_rank_values(
            vals,
            "v",
            lambda n: {"med": (n + 1) // 2, "p99": max(1, (99 * n + 99) // 100)},
        )
        wall = time.perf_counter() - t0
        results["rank_select"] = {
            "rows": args.n,
            "med": got[None]["med"],
            "p99": got[None]["p99"],
            "ok": got[None]["med"] < got[None]["p99"],
            "wall_sec": round(wall, 1),
        }
        print(json.dumps({"probe": "rank_select", **results["rank_select"]}))

    if want('cc_chain_forest'):
        # -- 4. Connected components: high-diameter chain forest -----------
        # CHAINS disjoint paths of DIAM edges each; vertex (c, j) gets id
        # j*chains + c (stride layout), so within every chain the minimum
        # id (j=0, value c) sits at one END and min-label propagation must
        # walk the full diameter — one hop per round, the worst case for
        # the round count. max_iter is pinned at diam+1 (diam lowering
        # rounds + the fixpoint-detection round): convergence inside it IS
        # the bounded-rounds assertion (connected_components raises past
        # max_iter). Correctness is exact and total: every vertex's
        # cluster_id must equal its chain id (= id % chains).
        from bq_nvd_spark.operators.graph import connected_components

        diam = 16
        chains = max(args.n // 2 // diam, 1000)
        k = spark.range(chains * diam)
        c = (F.col("id") / diam).cast("long")
        j = F.col("id") % diam
        edges = k.select(
            (j * chains + c).alias("src"),
            ((j + F.lit(1)) * chains + c).alias("dst"),
        )
        t0 = time.perf_counter()
        labels = connected_components(edges, max_iter=diam + 1)
        n_vertices = labels.count()
        n_wrong = labels.filter(
            F.col("cluster_id") != F.pmod(F.col("id"), F.lit(chains))
        ).count()
        wall = time.perf_counter() - t0
        results["cc_chain_forest"] = {
            "edges": chains * diam,
            "chains": chains,
            "diameter": diam,
            "vertices": n_vertices,
            "vertices_expected": chains * (diam + 1),
            "mislabeled": n_wrong,
            "ok": n_vertices == chains * (diam + 1) and n_wrong == 0,
            "wall_sec": round(wall, 1),
        }
        print(json.dumps({"probe": "cc_chain_forest", **results["cc_chain_forest"]}))

    ok = all(r["ok"] for r in results.values())
    print(json.dumps({"probe": "ALL", "ok": ok}))
    spark.stop()
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
