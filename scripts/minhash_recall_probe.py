"""Measure the MinHash-LSH pair recall contract on realistic near-dups.

Round 11 ported refine-then-star to the MinHash capped-pairs path
(`plans/llm.py::_capped_pairs`). Its unit test and degenerate-scale
probe use IDENTICAL documents (refine signatures equal by
construction → pure star), so two claims still carried no number for
*realistic* near-duplicates, where members differ and the refine
hashes genuinely split a bucket:

1. **Pair recall** — a true pair (bigram-shingle Jaccard ≥ 0.8, the
   `jaccard_verified_pairs` contract) missed by one band's bucket or
   split across refined sub-buckets surfaces via another band; with
   4 bands of 4 hashes the textbook hit probability for a pair at
   token-Jaccard J is 1−(1−J⁴)⁴ (~0.99 at J=0.9, ~0.84 at J=0.8).
2. **Refine-then-star connectivity** — a sub-bucket still past
   PAIR_BUCKET_CAP emits only min-id anchor pairs, so pair recall
   inside it is ~2/m BY DESIGN; the contract is that per-band-
   independent refine hashes split the cluster along different
   boundaries in each band, so the union of per-band stars plus the
   ≤CAP sub-bucket cliques keeps a mass near-dup cluster CONNECTED
   for the downstream connected components.

The probe is GROUNDED in the real pipeline: it writes a synthetic
documents.parquet fixture and runs the registered
`jaccard_verified_pairs` and `dedup_clusters` queries on it — the
numbers are evidence about the operator, not about a model of it.

Corpus (seeded):
- 2000 background docs, 40 tokens each from a 5000-token vocab —
  pairwise Jaccard ≈ 0, a handful of incidental shared shingles;
- 300 planted near-dup partners at graded token replacements 1..8
  (bigram-Jaccard ~0.95 down to ~0.62, straddling the 0.8 verify
  threshold);
- one 120-member mass near-dup cluster: each member replaces 2 of the
  base doc's 40 tokens (pairwise token-J ≈ 0.90, NOT identical), so
  its level-1 buckets are oversized and its refined sub-buckets both
  pass and fail the cap — the exact mixed configuration the star
  fallback exists for.

Usage: python scripts/minhash_recall_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

VOCAB = 5000
DOC_LEN = 40
N_BACKGROUND = 2000
N_PLANTED = 300
CLUSTER_M = 120
CLUSTER_EDITS = 2
SEED = 7


def _bigrams(tokens: list[str]) -> set[str]:
    return {f"{a} {b}" for a, b in zip(tokens, tokens[1:])}


def build_corpus():
    rng = np.random.default_rng(SEED)
    docs: list[tuple[int, list[str]]] = []
    next_id = 0

    def fresh_tokens(n: int) -> list[str]:
        return [f"t{k}" for k in rng.integers(0, VOCAB, size=n)]

    # background
    for _ in range(N_BACKGROUND):
        docs.append((next_id, fresh_tokens(DOC_LEN)))
        next_id += 1

    # planted graded pairs: partner replaces `edits` tokens of a base
    planted_pairs = []
    for i in range(N_PLANTED):
        base = fresh_tokens(DOC_LEN)
        edits = 1 + i % 8
        partner = list(base)
        for pos in rng.choice(DOC_LEN, size=edits, replace=False):
            partner[pos] = f"p{next_id}x{pos}"
        docs.append((next_id, base))
        a = next_id
        next_id += 1
        docs.append((next_id, partner))
        planted_pairs.append((a, next_id))
        next_id += 1

    # mass near-dup cluster (members differ: refine sigs split it).
    # Unique tokens are APPENDED, not substituted: substitution costs
    # ~2 bigram shingles per edit and would park member-pair Jaccard at
    # ~0.81, on top of the 0.8 verify threshold; appending keeps the
    # base's shingles intact (pairwise ≈ 0.91, solidly a near-dup
    # cluster) while still giving every member distinct refine hashes.
    cluster_base = fresh_tokens(DOC_LEN)
    cluster_ids = []
    for j in range(CLUSTER_M):
        member = list(cluster_base) + [
            f"c{next_id}x{k}" for k in range(CLUSTER_EDITS)
        ]
        docs.append((next_id, member))
        cluster_ids.append(next_id)
        next_id += 1

    meta = {"planted_pairs": planted_pairs, "cluster_ids": cluster_ids}
    return [(i, " ".join(toks)) for i, toks in docs], meta, docs


def exact_truth(docs: list[tuple[int, list[str]]]) -> dict:
    """All-pairs bigram-shingle Jaccard ≥ JACCARD_MIN, the verify
    contract's exact truth. ~3M set intersections; seconds in CPython
    because non-overlapping vocabularies short-circuit on length."""
    from bq_nvd_spark.plans.llm import JACCARD_MIN

    sh = [(i, _bigrams(t)) for i, t in docs]
    true_pairs = {}
    for x in range(len(sh)):
        ix, sx = sh[x]
        for y in range(x + 1, len(sh)):
            iy, sy = sh[y]
            inter = len(sx & sy)
            if inter == 0:
                continue
            j = inter / (len(sx) + len(sy) - inter)
            if j >= JACCARD_MIN:
                true_pairs[(min(ix, iy), max(ix, iy))] = j
    return true_pairs


def main() -> None:
    rows, meta, token_docs = build_corpus()
    truth = exact_truth([(i, t) for i, t in token_docs])

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minhash-recall-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bq_nvd_spark.plans import QUERIES

    workdir = tempfile.mkdtemp(prefix="minhash_recall_")
    try:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            4
        ).write.mode("overwrite").parquet(f"{workdir}/documents.parquet")

        found = {
            (r.doc_a, r.doc_b)
            for r in QUERIES["jaccard_verified_pairs"](spark, workdir)
            .select("doc_a", "doc_b")
            .collect()
        }

        # recall stratified by true shingle-Jaccard regime
        # floors: measured 1.0 in both populated strata; set below the
        # textbook hit probability so environment noise can't flake the
        # gate, but a broken candidate path (recall collapse) fails it
        strata = [(0.8, 0.9, 0.75), (0.9, 0.95, 0.9), (0.95, 1.01, 0.9)]
        cluster = set(meta["cluster_ids"])
        recall_ok = True
        for lo, hi, floor in strata:
            in_s = [p for p, j in truth.items() if lo <= j < hi]
            noncluster = [
                p for p in in_s if not (p[0] in cluster and p[1] in cluster)
            ]
            hits = sum(1 for p in in_s if p in found)
            nc_hits = sum(1 for p in noncluster if p in found)
            if noncluster and nc_hits / len(noncluster) < floor:
                recall_ok = False
            print(
                json.dumps(
                    {
                        "probe": "pair_recall",
                        "jaccard": f"[{lo},{hi})",
                        "true_pairs": len(in_s),
                        "recall": round(hits / len(in_s), 3) if in_s else None,
                        "non_cluster_true": len(noncluster),
                        "non_cluster_recall": round(nc_hits / len(noncluster), 3)
                        if noncluster
                        else None,
                    }
                )
            )

        # connectivity: every cluster member with LEVEL-1 evidence (a
        # shared band bucket anywhere) must close into ONE component.
        # A member whose band signature is deviant in ALL bands is a
        # textbook LSH miss — P ≈ (1−(40/42)⁴)⁴ ≈ 0.1% per member here,
        # irreducible without more bands — and is reported, not failed.
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from bq_nvd_spark.plans.llm import band_sigs_np

        docs_df = spark.read.parquet(f"{workdir}/documents.parquet")
        bands = docs_df.select(
            "doc_id",
            F.posexplode(band_sigs_np("text")).alias("band_idx", "band_sig"),
        )
        w = Window.partitionBy("band_idx", "band_sig")
        max_bucket = {
            r.doc_id: r.mb
            for r in bands.select(
                "doc_id", F.count(F.lit(1)).over(w).alias("c")
            )
            .groupBy("doc_id")
            .agg(F.max("c").alias("mb"))
            .filter(F.col("doc_id").isin(meta["cluster_ids"]))
            .collect()
        }
        lsh_misses = [i for i in meta["cluster_ids"] if max_bucket[i] == 1]
        evidenced = [i for i in meta["cluster_ids"] if max_bucket[i] > 1]

        comp = {
            r.doc_id: r.cluster_id
            for r in QUERIES["dedup_clusters"](spark, workdir).collect()
        }
        reps = {comp.get(i) for i in evidenced}
        n_isolated = sum(1 for i in evidenced if i not in comp)
        ok = len(reps) == 1 and n_isolated == 0 and recall_ok
        print(
            json.dumps(
                {
                    "probe": "cluster_connectivity",
                    "members": CLUSTER_M,
                    "lsh_misses": len(lsh_misses),
                    "evidenced": len(evidenced),
                    "components": len(reps),
                    "isolated": n_isolated,
                    "ok": ok,
                }
            )
        )
        raise SystemExit(0 if ok else 1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
