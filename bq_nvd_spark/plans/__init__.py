"""Query plans: the engine's user-facing query surface.

Importing this package populates the registry (``QUERIES`` / ``ORACLES``)
with every declared operator from SURVEY.md §2.
"""

from bq_nvd_spark.plans import (  # noqa: F401
    events,
    llm,
    nested,
    nvd_ingest,
    python_udfs,
    relational,
    sampling,
    similarity_search,
    skew_scale,
    temporal_joins,
)
from bq_nvd_spark import streaming  # noqa: F401  (registers streaming queries)
from bq_nvd_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
