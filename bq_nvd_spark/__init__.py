"""bq_nvd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of redteam-project/bq-nvd, extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis), every operator designed for 100 TB scale.

Architecture (see SURVEY.md): everything is expressed as declarative
DataFrame / Spark SQL plans so Catalyst performs predicate pushdown, column
pruning, join selection and AQE re-planning; no RDDs, no custom Catalyst
rules, no driver-side collects in any operator.
"""

from bq_nvd_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
