"""TableIO seam: Iceberg when a runtime jar is on the classpath,
Parquet (identical partition layout) otherwise.

The engine targets Iceberg tables (BASELINE.json input_hint). This
sandbox has no Iceberg runtime jar and is offline, so reads/writes fall
back to directory-partitioned Parquet with the same layout
(partition columns in the path). On a real cluster, launch with:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.lake.type=hadoop \
        --conf spark.sql.catalog.lake.warehouse=<warehouse-uri> ...

and pass table identifiers like ``lake.db.documents``; everything else
is unchanged — all operators are plain DataFrame transforms.

Atomicity: Iceberg commits are atomic snapshots. The Parquet fallback
writes each run under a unique run directory and publishes via the
manifest (plans/manifest.py), so readers never observe partial output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _require_runtime_for_identifier(spark: SparkSession, location: str) -> bool:
    """True → treat ``location`` as an Iceberg identifier. A dotted
    identifier WITHOUT the Iceberg runtime is a config error and must
    fail loudly — silently treating 'lake.db.documents' as a relative
    parquet path would write/read a stray local directory while the job
    reports success."""
    if "/" in location:
        return False
    if iceberg_available(spark):
        return True
    raise RuntimeError(
        f"'{location}' looks like an Iceberg table identifier but no Iceberg "
        "runtime is on the classpath — add the iceberg-spark-runtime package "
        "to spark-submit, or pass a filesystem path (containing '/')"
    )


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read a table by Iceberg identifier (contains no '/') or
    parquet path."""
    if _require_runtime_for_identifier(spark, location):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if _require_runtime_for_identifier(df.sparkSession, location):
        writer.format("iceberg").saveAsTable(location)
    else:
        writer.parquet(location)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) table keyed on the join column.

    The co-located-join primitive for repeated big-big joins at 10^12
    docs: two tables bucketed on the same key with the same bucket count
    join WITHOUT any Exchange (and without even a Sort when sorted) —
    the shuffle is paid once at write time and amortized over every
    later join/aggregation on that key. On Iceberg the equivalent is a
    `bucket(N, key)` partition transform + storage-partitioned joins."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
