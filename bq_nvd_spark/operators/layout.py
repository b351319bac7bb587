"""Physical data-layout operators — the write-side levers for 100 TB scans.

At cluster scale the cheapest query is the one that never reads the data:
parquet row-group min/max statistics prune whole files when the rows a
predicate wants are physically clustered. These operators control that
clustering at write time:

- ``morton_code`` / ``morton_sql``: bit-interleave two bucketed dimensions
  into a Z-value so that sorting by ONE column co-locates rows that are
  close in BOTH dimensions (multi-dimensional clustering, a la Z-ordering
  in lakehouse table formats). The Spark Column and the ANSI-SQL text
  compute the identical integer, so the oracle gate covers the encoding.
- ``zorder_partitions``: range-partition + sort by the Z-value — the
  layout write itself. ``repartitionByRange`` samples the key distribution
  (one pass) and produces equal-sized output files regardless of skew in
  either source dimension.
- ``compact_parquet``: small-file compaction. A streaming ingest that
  lands a file per micro-batch per partition produces millions of KB-sized
  files at 100 TB; scan throughput then bottlenecks on file-open overhead
  and the driver's split enumeration. Compaction rewrites to
  ``target_file_bytes`` chunks using ``coalesce`` (narrow, shuffle-free)
  when reducing file count.

The reference delegates physical layout entirely to BigQuery's managed
storage (capacitor re-clustering); these are the explicit Spark-side
equivalents a self-managed lake needs.
"""

from __future__ import annotations

import math
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints (a even
    positions, b odd) into a single Z-value Column.

    Pure integer bit arithmetic — stays inside whole-stage codegen; no
    UDF. ``bits`` is small (4-6 for bucketed dims), so the expression is
    a flat sum of ``2*bits`` shift/mask terms.
    """
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(add, terms)


def morton_sql(a: str, b: str, bits: int) -> str:
    """The same interleave as ``morton_code`` as engine-portable SQL text
    (``>>``/``<<``/``&`` — valid in DuckDB and Spark SQL), so oracle
    queries can pin the encoding bit for bit."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_partitions(df: DataFrame, zcol: Column, num_partitions: int) -> DataFrame:
    """Cluster ``df`` into ``num_partitions`` output chunks by Z-value.

    ``repartitionByRange`` does a sampled range split (contiguous Z-value
    intervals per partition — that contiguity is what shrinks per-file
    bounding boxes), then an in-partition sort tightens row-group stats
    inside each file. One shuffle, paid once at write time, repaid on
    every subsequent multi-dimensional scan.
    """
    return df.repartitionByRange(num_partitions, zcol.alias("__z")).sortWithinPartitions(
        zcol.alias("__z")
    )


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a small-file parquet directory into ~``target_file_bytes``
    files; returns the output file count.

    Sizing reads the source's byte size through the Hadoop FileSystem
    API (works for local paths and object stores alike — no driver-side
    listing of file contents, just the directory's ContentSummary).
    Reducing file count uses ``coalesce`` — a narrow dependency that
    merges input splits without a shuffle; at 100 TB a full repartition
    of the data just to glue files together would itself be the most
    expensive query of the day.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = path.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(in_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_dir)
    out_path = jvm.org.apache.hadoop.fs.Path(out_dir)
    statuses = fs.listStatus(out_path)
    return sum(
        1 for s in statuses if s.getPath().getName().endswith(".parquet")
    )
