"""Reusable operator library (EXT surface, SURVEY.md §2.10–§2.11).

Implementation modules for operators Spark lacks as built-ins; the
oracle-checked queries that exercise them live in ``bq_nvd_spark.plans``.

- ``similarity``  — sign-LSH band buckets (HOF + Arrow/numpy twins),
  fold-ordered dot products, DuckDB oracle twins
- ``temporal``    — generic as-of join and bucket-banded range join
- ``skew``        — salted join / salted two-stage aggregation
- ``text``        — n-gram language ID, BPE-ish token counting
  (vectorized pandas_udfs)
- ``multimodal``  — Arrow-batched binary decode / frame sampling
  (mapInPandas; real decoders stubbed)
- ``graph``       — connected components (min-label propagation) for
  closing near-dup pairs into dedup clusters
- ``checkpoint``  — lineage-truncating materialization with a reliable
  (checkpoint-dir) upgrade path for cluster deployments
"""

from bq_nvd_spark.operators.checkpoint import (
    release_stage_checkpoints,
    stage_checkpoint,
)
from bq_nvd_spark.operators.graph import connected_components
from bq_nvd_spark.operators.multimodal import decode_media, frame_sample
from bq_nvd_spark.operators.similarity import (
    band_buckets,
    band_buckets_np,
    fold_dot,
    fold_dot_np,
)
from bq_nvd_spark.operators.skew import salted_agg, salted_join
from bq_nvd_spark.operators.temporal import asof_join, banded_range_join
from bq_nvd_spark.operators.text import bpe_token_count, langid_predict

__all__ = [
    "asof_join",
    "connected_components",
    "band_buckets",
    "band_buckets_np",
    "banded_range_join",
    "bpe_token_count",
    "decode_media",
    "fold_dot",
    "fold_dot_np",
    "frame_sample",
    "langid_predict",
    "salted_agg",
    "salted_join",
    "release_stage_checkpoints",
    "stage_checkpoint",
]
