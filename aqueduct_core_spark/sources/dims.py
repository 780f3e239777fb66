"""Routing dimension tables + broadcast lookups (reference J4/J5).

The reference resolves a consumer's location to cluster ids and
location groups before every read:

- cluster UUID → id semi-join against the tiny ``CLUSTERS`` table
  (``/root/reference/pipe-storage-postgresql/.../ClusterStorage.java:29,
  190-210``, DDL ``PostgresqlStorageIntegrationSpec.groovy:100-103``);
- location UUID → ``BIGINT[]`` groups lookup against
  ``LOCATION_GROUPS`` (``PostgresqlStorage.java:109-132``, DDL
  ``PostgresqlStorageIntegrationSpec.groovy:114-117``).

Spark-first shape: both dims are broadcast hash joins — the dim side is
O(thousands of rows), so at 100 TB the changes scan is never shuffled
for routing; the lookup rides map-side in the same stage as the scan
filters.  The dim tables here are deterministic synthetics (same rule
expressed in the DuckDB oracles), standing in for the remote
location-service cache (J6 is cluster-internal and not ported,
SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("cluster_uuid", T.StringType(), False),
        T.StructField("cluster_id", T.LongType(), False),
    ]
)

LOCATION_GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("location_uuid", T.StringType(), False),
        T.StructField("groups", T.ArrayType(T.LongType()), False),
    ]
)


def cluster_dim(spark: SparkSession, n: int = 8) -> DataFrame:
    """Deterministic CLUSTERS dim: id 0..n-1, uuid ``uuid-%04d``."""
    return spark.range(n).select(
        F.format_string("uuid-%04d", F.col("id")).alias("cluster_uuid"),
        F.col("id").alias("cluster_id"),
    )


def location_groups_dim(spark: SparkSession, n: int = 10) -> DataFrame:
    """Deterministic LOCATION_GROUPS dim: location ``loc-%04d`` →
    groups ``[i % 5, (i * 2 + 1) % 5]`` (distinct, sorted)."""
    return spark.range(n).select(
        F.format_string("loc-%04d", F.col("id")).alias("location_uuid"),
        F.array_sort(
            F.array_distinct(F.array(F.col("id") % 5, (F.col("id") * 2 + 1) % 5))
        ).alias("groups"),
    )


def resolve_cluster_ids(changes: DataFrame, clusters: DataFrame, uuids: list[str]) -> DataFrame:
    """J4: cluster UUID → id broadcast semi-join, then route the log.

    The dim filter + join are broadcast (``ClusterStorage.java:29``:
    ``WHERE cluster_uuid = ANY(string_to_array(?))``); the big side is
    only scanned once with the routing predicate applied map-side.
    """
    ids = clusters.where(F.col("cluster_uuid").isin(uuids)).select("cluster_id")
    return changes.join(F.broadcast(ids), on="cluster_id", how="inner")


def route_for_location(
    changes: DataFrame,
    loc_dim: DataFrame,
    location_uuid: str,
    cluster_ids: list[int] | None = None,
) -> DataFrame:
    """J5 + F3: resolve the location's groups, then keep rows for the
    given clusters that are either broadcast (NULL group) or targeted
    at one of the location's groups (reference
    ``PostgresqlStorage.java:109-132`` + ``:469-473``, behavior tests
    ``PostgresqlStorageIntegrationSpec.groovy:881-948``).

    An unknown location fails loudly (the reference 404s the read via
    the location service) — silently cross-joining an empty dim would
    drop even the broadcast rows every consumer is entitled to."""
    groups = loc_dim.where(F.col("location_uuid") == location_uuid).select("groups")
    if groups.isEmpty():
        raise KeyError(f"unknown location_uuid {location_uuid!r}")
    out = changes.join(F.broadcast(groups))
    if cluster_ids:
        out = out.where(F.col("cluster_id").isin([int(c) for c in cluster_ids]))
    return out.where(
        F.col("location_group").isNull()
        | F.array_contains(F.col("groups"), F.col("location_group"))
    ).drop("groups")
