"""Measure the embedding-LSH pair recall contract across band counts.

`plans/similarity_search.py::_emb_bucket_pairs` documents two recall
claims that until round 11 carried no number:

1. **Band sensitivity** — a similar pair missed in one band's bucket
   (or split across refined sub-buckets of an oversized one) surfaces
   via any OTHER band where it shares a ≤CAP bucket; the fixture runs
   4 bands of 8 bits. This probe sweeps n_bands ∈ {2,4,8} at a
   CONSTANT 8 bits/band (16/32/64 planes from the same open-ended md5
   generator — holding total bits constant instead would shrink the
   bucket domain to 16 at 8 bands and measure domain collapse, not
   band count) and reports pair recall against the exact all-pairs
   cosine truth, stratified by similarity regime.
2. **Refine-then-star connectivity** — a sub-bucket still past
   EMB_BUCKET_CAP after refinement emits only anchor pairs, so pair
   recall there is ~2/m BY DESIGN; the contract is that the star keeps
   a mass-duplicate cluster CONNECTED for the downstream connected
   components. The probe plants such a cluster (m >> CAP) among
   background vectors that contaminate its level-1 buckets — the exact
   configuration where the round-10 raw-bucket star anchored on an
   outsider and split the cluster into ~m components (this probe is
   what found that) — and asserts one component over the found pairs.

The n_bands=4 simulation is GROUNDED against the real pipeline: the
probe writes the synthetic corpus as an embeddings.parquet fixture,
runs the registered `embedding_similar_pairs` query on it, and asserts
the Spark pair set equals the simulated one exactly (same planes, same
matmul sign computation, same cap/star rule) — so the 2/8-band numbers
are evidence about the operator, not about a loose model of it.

Corpus (seeded, float32-quantized exactly like the parquet fixture):
- 2000 background vectors (N(0,1), dim 64) — pairwise cosine ~N(0, 1/8),
  a handful of incidental ≥0.40 pairs;
- 300 planted near-dup partners at graded target cosines 0.5–0.99;
- one 120-member mass-duplicate cluster (pairwise cosine ≈ 0.995+,
  m > EMB_BUCKET_CAP in every band → pure star path).

Usage: python scripts/emb_recall_probe.py [--skip-spark]
"""

from __future__ import annotations

import argparse
import itertools
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bq_nvd_spark.operators.similarity import (  # noqa: E402
    DIM,
    REFINE_BITS,
    _plane_component,
)
from bq_nvd_spark.plans.similarity_search import (  # noqa: E402
    EMB_BUCKET_CAP,
    SIMILAR_COS,
)

N_BACKGROUND = 2000
N_PLANTED = 300
CLUSTER_M = 120  # > EMB_BUCKET_CAP: every band degenerates to the star
SEED = 1107

# Measured bounds this probe enforces (see the table it prints; numbers
# recorded in SCALE.md §"Embedding LSH band/cap recall"). High-sim
# (≥0.95) pairs OUTSIDE the mass-dup cluster are the dedup-critical
# regime; theory for per-bit agreement p = 1 − θ/π gives band recall
# 1 − (1 − p^bits)^bands — more, narrower bands trade precision for
# recall exactly as documented.
MIN_RECALL_HIGH_SIM = {2: 0.55, 4: 0.80, 8: 0.95}
BITS_PER_BAND = 8


def build_corpus() -> tuple[np.ndarray, int]:
    """(vectors float64-of-float32, first_cluster_id)."""
    rng = np.random.default_rng(SEED)
    base = rng.standard_normal((N_BACKGROUND, DIM))
    planted = []
    for i in range(N_PLANTED):
        src = base[i]
        # graded target cosine in [0.5, 0.99]: unit-orthogonal mix
        c = 0.5 + 0.49 * (i / (N_PLANTED - 1))
        noise = rng.standard_normal(DIM)
        u = src / np.linalg.norm(src)
        noise -= (noise @ u) * u
        noise /= np.linalg.norm(noise)
        partner = c * u + np.sqrt(1 - c * c) * noise
        planted.append(partner * np.linalg.norm(src))
    center = rng.standard_normal(DIM)
    cluster = center + 0.03 * rng.standard_normal((CLUSTER_M, DIM))
    mat = np.vstack([base, np.array(planted), cluster])
    # float32 quantization: the parquet fixture stores FLOAT[], and the
    # engine casts back to double — signatures/cosines must be computed
    # on the SAME values or borderline signs could differ.
    mat = mat.astype(np.float32).astype(np.float64)
    return mat, N_BACKGROUND + N_PLANTED


def truth_pairs(mat: np.ndarray) -> dict[tuple[int, int], float]:
    nrm = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(nrm, nrm)
    ia, ib = np.where(np.triu(sims >= SIMILAR_COS, k=1))
    return {(int(a), int(b)): float(sims[a, b]) for a, b in zip(ia, ib)}


def _planes(first_bit: int, n: int) -> np.ndarray:
    """(DIM, n) plane matrix from the engine's open-ended md5 generator;
    bits 0..N_BITS-1 are exactly operators.similarity.hyperplanes()."""
    return np.array(
        [
            [_plane_component(first_bit + bit, i) for i in range(DIM)]
            for bit in range(n)
        ]
    ).T


def band_ids(mat: np.ndarray, n_bands: int) -> tuple[np.ndarray, np.ndarray]:
    """((n, n_bands) band bucket ids, (n, n_bands) refine sub-bucket ids).

    8 bits/band always; refine bits are PER-BAND (band b refines on
    bits n_bits + b*REFINE_BITS), so n_bands=4 reproduces the engine's
    exact layout (bands: bits 0..31, refine: bits 32..95 in
    16-bit slices)."""
    n_bits = BITS_PER_BAND * n_bands
    bits = (mat @ _planes(0, n_bits)) > 0
    weights = 1 << np.arange(BITS_PER_BAND)
    bands = np.stack(
        [
            bits[:, b * BITS_PER_BAND : (b + 1) * BITS_PER_BAND] @ weights
            for b in range(n_bands)
        ],
        axis=1,
    )
    rbits = (mat @ _planes(n_bits, n_bands * REFINE_BITS)) > 0
    rw = 1 << np.arange(REFINE_BITS)
    rbs = np.stack(
        [
            rbits[:, b * REFINE_BITS : (b + 1) * REFINE_BITS] @ rw
            for b in range(n_bands)
        ],
        axis=1,
    )
    return bands, rbs


def candidate_pairs(ids: np.ndarray, rbs: np.ndarray) -> set[tuple[int, int]]:
    """The _emb_bucket_pairs rule: all pairs for 2..CAP-member buckets;
    oversized buckets refine on the extra bits, sub-buckets past the
    cap star to their min id; dedup across bands."""
    found: set[tuple[int, int]] = set()
    n_bands = ids.shape[1]
    for b in range(n_bands):
        buckets: dict[int, list[int]] = {}
        for vid, bucket in enumerate(ids[:, b]):
            buckets.setdefault(int(bucket), []).append(vid)
        for members in buckets.values():
            if len(members) < 2:
                continue
            if len(members) <= EMB_BUCKET_CAP:
                found.update(itertools.combinations(sorted(members), 2))
                continue
            subs: dict[int, list[int]] = {}
            for m in members:
                subs.setdefault(int(rbs[m, b]), []).append(m)
            for sub in subs.values():
                if len(sub) < 2:
                    continue
                if len(sub) <= EMB_BUCKET_CAP:
                    found.update(itertools.combinations(sorted(sub), 2))
                else:
                    anchor = min(sub)
                    found.update((anchor, m) for m in sub if m != anchor)
    return found


def components(n: int, pairs: set[tuple[int, int]]) -> int:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(i) for i in range(n)})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--skip-spark",
        action="store_true",
        help="skip grounding the n_bands=4 simulation against the real query",
    )
    args = ap.parse_args()

    mat, cluster_start = build_corpus()
    n = len(mat)
    truth = truth_pairs(mat)
    in_cluster = lambda p: p[0] >= cluster_start and p[1] >= cluster_start  # noqa: E731
    strata = {
        "0.40-0.60": lambda s: 0.40 <= s < 0.60,
        "0.60-0.80": lambda s: 0.60 <= s < 0.80,
        "0.80-0.95": lambda s: 0.80 <= s < 0.95,
        ">=0.95 (non-cluster)": lambda s: s >= 0.95,
    }
    print(
        f"corpus n={n} truth_pairs={len(truth)} "
        f"(cluster pairs: {sum(1 for p in truth if in_cluster(p))}, "
        f"CAP={EMB_BUCKET_CAP}, threshold={SIMILAR_COS})"
    )

    header = f"| n_bands | bits/band | " + " | ".join(strata) + " | cluster components |"
    print(header)
    print("|" + "---|" * (len(strata) + 3))
    failures = []
    sim4: set[tuple[int, int]] = set()
    for n_bands in (2, 4, 8):
        ids, rbs = band_ids(mat, n_bands)
        cand = candidate_pairs(ids, rbs)
        found = {p for p in cand if p in truth}
        if n_bands == 4:
            sim4 = cand
        cells = []
        for label, pred in strata.items():
            if label.startswith(">="):
                denom_pairs = [
                    p for p, s in truth.items() if pred(s) and not in_cluster(p)
                ]
            else:
                denom_pairs = [p for p, s in truth.items() if pred(s)]
            got = sum(1 for p in denom_pairs if p in found)
            rec = got / len(denom_pairs) if denom_pairs else float("nan")
            cells.append(f"{rec:.3f} ({got}/{len(denom_pairs)})")
            if label.startswith(">="):
                bound = MIN_RECALL_HIGH_SIM[n_bands]
                if denom_pairs and rec < bound:
                    failures.append(
                        f"n_bands={n_bands}: high-sim recall {rec:.3f} < {bound}"
                    )
        cluster_pairs = {p for p in found if in_cluster(p)}
        cluster_comps = components(
            n - cluster_start,
            {(a - cluster_start, b - cluster_start) for a, b in cluster_pairs},
        )
        if cluster_comps != 1:
            failures.append(
                f"n_bands={n_bands}: mass-dup cluster split into "
                f"{cluster_comps} components (star connectivity broken)"
            )
        print(
            f"| {n_bands} | {BITS_PER_BAND} | "
            + " | ".join(cells)
            + f" | {cluster_comps} |"
        )

    if not args.skip_spark:
        from pyspark.sql import SparkSession

        tmp = tempfile.mkdtemp(prefix="emb_recall_")
        try:
            spark = (
                SparkSession.builder.master("local[8]")
                .config("spark.ui.enabled", "false")
                .config("spark.sql.shuffle.partitions", "8")
                .config("spark.sql.session.timeZone", "UTC")
                .getOrCreate()
            )
            import pandas as pd

            pdf = pd.DataFrame(
                {
                    "vec_id": np.arange(n, dtype=np.int64),
                    "embedding": [
                        [float(x) for x in row.astype(np.float32)]
                        for row in mat
                    ],
                    "label": np.zeros(n, dtype=np.int32),
                }
            )
            from pyspark.sql.types import (
                ArrayType,
                FloatType,
                IntegerType,
                LongType,
                StructField,
                StructType,
            )

            schema = StructType(
                [
                    StructField("vec_id", LongType()),
                    StructField("embedding", ArrayType(FloatType())),
                    StructField("label", IntegerType()),
                ]
            )
            spark.createDataFrame(pdf, schema).coalesce(4).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmp, "embeddings.parquet"))
            from bq_nvd_spark.plans import QUERIES

            rows = QUERIES["embedding_similar_pairs"](spark, tmp).collect()
            spark_pairs = {(r["id_a"], r["id_b"]) for r in rows}
            sim_found = {p for p in sim4 if p in truth}
            if spark_pairs != sim_found:
                only_spark = sorted(spark_pairs - sim_found)[:5]
                only_sim = sorted(sim_found - spark_pairs)[:5]
                failures.append(
                    f"grounding mismatch at n_bands=4: spark={len(spark_pairs)} "
                    f"sim={len(sim_found)} only_spark={only_spark} only_sim={only_sim}"
                )
            else:
                print(
                    f"grounding: Spark embedding_similar_pairs == simulation "
                    f"at n_bands=4 ({len(spark_pairs)} pairs) — sweep numbers "
                    "are evidence about the real operator"
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if failures:
        print("FAIL:", *failures, sep="\n  ")
        return 1
    print("all recall bounds and star connectivity hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
