"""Registry pairing each Spark query plan with its ANSI-SQL oracle.

Contract (``/root/repo/__spark_entry__.py``): the driver executes the Spark
callable and the DuckDB oracle side by side and compares row-count + schema
+ order-insensitive value-hash, so every computed column MUST carry the same
alias in both formulations, and float-producing expressions are rounded
identically on both sides to make the hash deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan; ``oracle`` is the DuckDB-runnable ANSI SQL.

    Pass ``oracle=None`` only for genuinely non-SQL-expressible operators
    (the driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
