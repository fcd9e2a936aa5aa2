"""Integration catalog + policy lookups (reference R1/R2/R13).

The reference stores pipeline→component coverage and healing/
notification policies in a Neo4j graph (infra/neo4j/init_schema.cypher:
50-95) and resolves them per request with three Cypher reads
(source_schema_identifier_agent.py:118-190). Here they are small
dimension DataFrames; lookups are filters/joins, and the policy rows
broadcast-join onto verdicts when applied in bulk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType(), False),
        T.StructField("source_type", T.StringType(), True),
        T.StructField("source_component", T.StringType(), True),
        T.StructField("target_component", T.StringType(), True),
    ]
)

HEALING_POLICY_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType(), False),
        T.StructField("auto_heal", T.BooleanType(), True),
        T.StructField("strategy", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
    ]
)

NOTIFICATION_POLICY_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType(), False),
        T.StructField("enabled", T.BooleanType(), True),
        T.StructField("preferred_channel", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
    ]
)


def fetch_integration_catalog(catalog: DataFrame, pipeline: str) -> dict | None:
    """R1: resolve catalog entry by pipeline — filter + limit 1
    (source_schema_identifier_agent.py:118-122)."""
    rows = catalog.filter(F.col("pipeline") == pipeline).limit(1).collect()
    return rows[0].asDict() if rows else None


def fetch_healing_policy(
    policies: DataFrame, strategies: DataFrame | None, pipeline: str
) -> dict | None:
    """R2: healing policy with optional strategy — the Cypher OPTIONAL
    MATCH becomes a left join (source_schema_identifier_agent.py:125-137).

    Strategy columns that collide with policy column names are prefixed
    ``strategy_`` (Row.asDict silently keeps only the last duplicate
    otherwise), and the joined rows are ordered before limit(1) so a
    multi-strategy pipeline resolves deterministically."""
    p = policies.filter(F.col("pipeline") == pipeline)
    if strategies is not None:
        pol_cols = set(p.columns)
        s = strategies
        for c in s.columns:
            if c != "pipeline" and c in pol_cols:
                s = s.withColumnRenamed(c, f"strategy_{c}")
        p = p.join(F.broadcast(s), "pipeline", "left")
        order_col = next((c for c in s.columns if c != "pipeline"), None)
        if order_col is not None:
            p = p.orderBy(F.col(order_col).asc_nulls_last())
    rows = p.limit(1).collect()
    return rows[0].asDict() if rows else None


def fetch_notification_policy(policies: DataFrame, pipeline: str) -> dict | None:
    rows = policies.filter(F.col("pipeline") == pipeline).limit(1).collect()
    return rows[0].asDict() if rows else None


def impacted_pipelines_for(catalog: DataFrame, entities: DataFrame) -> DataFrame:
    """R13: DISTINCT pipelines covering any snapshotted component —
    semi-join against the (tiny, broadcast) entity list."""
    return (
        catalog.join(
            F.broadcast(entities.select(F.col("entity").alias("source_component")).distinct()),
            "source_component",
            "left_semi",
        )
        .select("pipeline")
        .distinct()
    )


def demo_catalog(spark: SparkSession) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The reference's seeded graph rows (init_schema.cypher) as
    DataFrames, for tests."""
    cat = spark.createDataFrame(
        [
            ("CRM-To-Finance-PeopleData", "csv", "people-info.csv", "finance-people"),
            ("Docs-To-Corpus", "iceberg", "documents", "corpus"),
        ],
        CATALOG_SCHEMA,
    )
    heal = spark.createDataFrame(
        [
            ("CRM-To-Finance-PeopleData", True, "add_column_default", 1),
            ("Docs-To-Corpus", True, "quarantine_partition", 1),
        ],
        HEALING_POLICY_SCHEMA,
    )
    notif = spark.createDataFrame(
        [
            ("CRM-To-Finance-PeopleData", True, "email", "ops@example.com"),
            ("Docs-To-Corpus", True, "teams", None),
        ],
        NOTIFICATION_POLICY_SCHEMA,
    )
    return cat, heal, notif
