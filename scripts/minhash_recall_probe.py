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

Round 12 adds a GRADED CANDIDATE-recall table × band sweep (the
MinHash twin of `emb_recall_probe.py`'s table): a CPython simulation
of the full capped/refine/star rule at 2/4/8 bands of 4 hashes,
grounded at the shipped B=4 by exact pair-set equality with the
registered `minhash_pairs_capped` query, reports recall of exact
shingle-Jaccard truth pairs per stratum (0.4–0.6 / 0.6–0.8 /
0.8–0.95 / ≥0.95) with asserted floors and per-config cluster
connectivity. Results are recorded in SCALE.md.

Corpus (seeded):
- 2000 background docs, 40 tokens each from a 5000-token vocab —
  pairwise Jaccard ≈ 0, a handful of incidental shared shingles;
- 300 planted near-dup partners at graded token replacements 1..8
  (bigram-shingle Jaccard ~0.90 down to ~0.42, spanning all four
  graded strata and straddling the 0.8 verify threshold), plus 40
  first-token-substitution pairs at shingle-J exactly 0.95 (an END
  edit kills one bigram, not two) populating the ≥0.95 stratum;
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

    # high-similarity planted pairs: substituting the FIRST token
    # kills exactly one bigram -> shingle-J = 38/40 = 0.95, populating
    # the [0.95, 1.01) stratum the graded table reports (interior
    # substitutions kill two bigrams and top out at ~0.90).
    for _ in range(40):
        base = fresh_tokens(DOC_LEN)
        partner = list(base)
        partner[0] = f"h{next_id}"
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


def exact_truth(docs: list[tuple[int, list[str]]], j_min: float = 0.4) -> dict:
    """All-pairs bigram-shingle Jaccard ≥ ``j_min`` via an inverted
    shingle index: only pairs sharing at least one shingle are scored,
    so the cost is Σ|posting list|² over shingles, not |docs|² — the
    background's 25M-bigram space keeps posting lists near length 1."""
    from collections import Counter, defaultdict

    sh = {i: _bigrams(t) for i, t in docs}
    inv: dict[str, list[int]] = defaultdict(list)
    for i, s in sh.items():
        for g in s:
            inv[g].append(i)
    inter: Counter = Counter()
    for ids in inv.values():
        if len(ids) < 2:
            continue
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                inter[(ids[x], ids[y])] += 1
    true_pairs = {}
    for (a, b), c in inter.items():
        j = c / (len(sh[a]) + len(sh[b]) - c)
        if j >= j_min:
            true_pairs[(a, b)] = j
    return true_pairs


def simulate_capped_pairs(
    token_docs: list[tuple[int, list[str]]],
    n_bands: int,
    cap: int,
    all_digests: dict,
) -> tuple[set, set]:
    """CPython twin of ``plans/llm.py::_capped_pairs`` at an arbitrary
    band count: 4 md5-keyed minhashes per band (salts 0..4B−1), per-band
    refine signatures from the NEXT 4B salts (4B..8B−1 — exactly the
    engine's layout at B=4, where level-1 uses salts 0..15 and refine
    16..31), the ≤CAP all-pairs / refined-sub-bucket / min-id-star /
    core-anchor-link rule verbatim. Grounded: at B=4 the output is
    asserted EQUAL to the registered ``minhash_pairs_capped`` query's
    pair set, so the 2/8-band sweep numbers describe the real operator,
    not a drifted model of it. ``all_digests`` memoizes each distinct
    token's 64 salted digests across band configs. Returns
    ``(pairs, evidenced)`` — ``evidenced`` is the set of docs sharing a
    level-1 bucket with at least one other doc, derived from the bucket
    structure (NOT from the emitted pairs)."""
    import hashlib
    from collections import defaultdict

    H = 4 * n_bands
    sigs: dict[int, list[str]] = {}
    rsigs: dict[int, list[str]] = {}
    for doc_id, toks in token_docs:
        per = []
        for t in {t.encode() for t in toks}:
            d = all_digests.get(t)
            if d is None:
                d = [hashlib.md5(f"{i}:".encode() + t).hexdigest() for i in range(64)]
                all_digests[t] = d
            per.append(d)
        mins = [min(d[i] for d in per) for i in range(2 * H)]
        sigs[doc_id] = ["".join(mins[b * 4 : (b + 1) * 4]) for b in range(n_bands)]
        rsigs[doc_id] = [
            "".join(mins[H + b * 4 : H + (b + 1) * 4]) for b in range(n_bands)
        ]
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for doc_id, s in sigs.items():
        for b in range(n_bands):
            buckets[(b, s[b])].append(doc_id)
    pairs: set = set()
    evidenced: set = set()  # docs sharing a level-1 bucket with anyone
    for (b, _sig), members in buckets.items():
        if len(members) < 2:
            continue
        evidenced.update(members)
        members.sort()
        if len(members) <= cap:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    pairs.add((members[x], members[y]))
            continue
        subs: dict[str, list[int]] = defaultdict(list)
        for d in members:
            subs[rsigs[d][b]].append(d)
        anchors = []  # (size, min_id) per sub-bucket, singletons included
        for mem in subs.values():
            mem.sort()
            anchors.append((len(mem), mem[0]))
            if 2 <= len(mem) <= cap:
                for x in range(len(mem)):
                    for y in range(x + 1, len(mem)):
                        pairs.add((mem[x], mem[y]))
            elif len(mem) > cap:
                for d in mem[1:]:
                    pairs.add((mem[0], d))
        core = min(anchors, key=lambda t: (-t[0], t[1]))[1]
        for _, anc in anchors:
            if anc != core:
                pairs.add((min(anc, core), max(anc, core)))
    return pairs, evidenced


def _components(pairs: set, nodes: set) -> list[set]:
    """Union-find components of ``nodes`` under ``pairs`` restricted to
    nodes (pairs through outsiders don't count — verification would cut
    them in the real chain)."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    groups: dict[int, set] = {}
    for n in nodes:
        groups.setdefault(find(n), set()).add(n)
    return list(groups.values())


def main() -> None:
    from bq_nvd_spark.plans.llm import JACCARD_MIN

    rows, meta, token_docs = build_corpus()
    truth04 = exact_truth([(i, t) for i, t in token_docs], j_min=0.4)
    truth = {p: j for p, j in truth04.items() if j >= JACCARD_MIN}

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

        # -- graded CANDIDATE recall × band sweep (round 12) -----------
        # Candidate pairs (pre-verify) from the CPython twin of
        # _capped_pairs at 2/4/8 bands of 4 hashes; the B=4 twin is
        # grounded below against the registered minhash_pairs_capped
        # query (exact pair-set equality), so the sweep rows describe
        # the shipped operator. Recall is over NON-cluster truth pairs
        # per shingle-Jaccard stratum (the 120-member cluster rides the
        # star path where pair recall is ~2/m BY DESIGN — its contract
        # is the connectivity column: components among its members with
        # level-1 evidence, pairs through outsiders excluded).
        from bq_nvd_spark.plans.llm import PAIR_BUCKET_CAP

        cluster = set(meta["cluster_ids"])
        strata4 = [(0.4, 0.6), (0.6, 0.8), (0.8, 0.95), (0.95, 1.01)]
        by_stratum = {
            s: [
                p
                for p, j in truth04.items()
                if s[0] <= j < s[1]
                and not (p[0] in cluster and p[1] in cluster)
            ]
            for s in strata4
        }
        # floors: set below the measured values (B=4: 0.64/0.92/
        # 1.00/1.00; B=8: 0.83/0.98/1.00/1.00) and consistent with the
        # textbook hit probability 1−(1−Jt⁴)^B — substitution edits
        # keep token-J well above shingle-J (e edits: token-J
        # (40−e)/(40+e) vs shingle-J ≈ (39−2e)/(39+2e)), so even the
        # 0.4–0.6 SHINGLE stratum sits at token-J ≈ 0.67–0.77 where
        # theory gives ~0.59–0.85 at B=4. Floors bind a recall
        # collapse, not seed jitter; only the shipped B=4 (and the
        # monotone B=8) assert — B=2 rows are information, not
        # contract.
        floors = {
            (4, (0.4, 0.6)): 0.5,
            (4, (0.6, 0.8)): 0.8,
            (4, (0.8, 0.95)): 0.95,
            (4, (0.95, 1.01)): 0.95,
            (8, (0.8, 0.95)): 0.95,
            (8, (0.95, 1.01)): 0.95,
        }
        digest_memo: dict = {}
        sweep_ok = True
        sim4: set = set()
        print("| bands×hashes | " + " | ".join(f"[{lo},{hi})" for lo, hi in strata4)
              + " | cluster components |")
        for n_bands in (2, 4, 8):
            sim, sim_evidenced = simulate_capped_pairs(
                token_docs, n_bands, PAIR_BUCKET_CAP, digest_memo
            )
            if n_bands == 4:
                sim4 = sim
            cells = []
            for s in strata4:
                pool = by_stratum[s]
                rec = (
                    sum(1 for p in pool if p in sim) / len(pool) if pool else None
                )
                floor = floors.get((n_bands, s))
                if rec is not None and floor is not None and rec < floor:
                    sweep_ok = False
                    print(
                        json.dumps(
                            {
                                "probe": "graded_recall_FLOOR",
                                "bands": n_bands,
                                "stratum": list(s),
                                "recall": round(rec, 3),
                                "floor": floor,
                            }
                        )
                    )
                cells.append("—" if rec is None else f"{rec:.2f}")
            # evidence comes from the BUCKET structure, not from the
            # emitted pairs — deriving it from pairs would be circular
            # and mask exactly the singleton-isolation defect the
            # connectivity column exists to catch.
            comps = _components(sim, sim_evidenced & cluster)
            n_comp = len(comps)
            if n_bands >= 4 and n_comp != 1:
                sweep_ok = False
                print(
                    json.dumps(
                        {
                            "probe": "graded_recall_SPLIT",
                            "bands": n_bands,
                            "components": n_comp,
                        }
                    )
                )
            print(
                f"| {n_bands}×4 | " + " | ".join(cells) + f" | {n_comp} |"
            )
        for s in strata4:
            print(
                json.dumps(
                    {
                        "probe": "stratum_population",
                        "stratum": list(s),
                        "non_cluster_true_pairs": len(by_stratum[s]),
                    }
                )
            )

        # ground the B=4 simulation against the registered query
        spark_pairs = {
            (r.doc_a, r.doc_b)
            for r in QUERIES["minhash_pairs_capped"](spark, workdir)
            .select("doc_a", "doc_b")
            .collect()
        }
        grounded = spark_pairs == sim4
        print(
            json.dumps(
                {
                    "probe": "grounding_b4",
                    "spark_pairs": len(spark_pairs),
                    "sim_pairs": len(sim4),
                    "equal": grounded,
                }
            )
        )
        if not grounded:
            sweep_ok = False

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
        ok = len(reps) == 1 and n_isolated == 0 and recall_ok and sweep_ok
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
