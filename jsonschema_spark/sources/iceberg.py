"""Iceberg table wiring — the north-star storage layer, config-gated.

BASELINE.json's target table is Iceberg; this sandbox ships no
iceberg-spark runtime jar, so everything here is a thin adapter over the
PUBLIC Spark<->Iceberg integration surface (catalog config keys, the
``iceberg`` datasource, time-travel read options, metadata tables) that
activates when the runtime is on the classpath (`--packages
org.apache.iceberg:iceberg-spark-runtime-<ver>` or a jar in
``$SPARK_HOME/jars``) and degrades to a clear error here.  The rest of
the engine is storage-agnostic: every operator takes a DataFrame, so an
Iceberg scan slots in wherever a parquet scan does, and
``ValidationRun``'s manifest-as-commit-record protocol maps 1:1 onto
validating a pinned snapshot (pass ``read_iceberg(..., snapshot_id=)``
and record the id in the run's lineage dict).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

#: Class the iceberg-spark runtime must provide.
_RUNTIME_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_catalog_conf(name: str, warehouse: str,
                         catalog_impl: str = "hadoop") -> dict[str, str]:
    """Spark conf entries registering an Iceberg catalog `name` — pass
    to ``SparkSession.builder.config(...)`` (or spark-defaults).

    `catalog_impl`: 'hadoop' (warehouse-dir catalog, no metastore
    service — the simple cluster default), 'hive', or 'rest'."""
    base = f"spark.sql.catalog.{name}"
    conf = {base: "org.apache.iceberg.spark.SparkCatalog"}
    if catalog_impl == "hadoop":
        conf[f"{base}.type"] = "hadoop"
        conf[f"{base}.warehouse"] = warehouse
    elif catalog_impl == "hive":
        conf[f"{base}.type"] = "hive"
        conf[f"{base}.uri"] = warehouse
    elif catalog_impl == "rest":
        conf[f"{base}.type"] = "rest"
        conf[f"{base}.uri"] = warehouse
    else:
        raise ValueError(f"unknown catalog_impl {catalog_impl!r}")
    return conf


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_RUNTIME_CLASS)
        return True
    except Exception:
        return False


def read_iceberg(spark: SparkSession, table: str,
                 snapshot_id: Optional[int] = None,
                 as_of_timestamp_ms: Optional[int] = None) -> DataFrame:
    """Scan an Iceberg table, optionally pinned to a snapshot.

    Pinning matters for resumable validation: a run that may be retried
    hours later must validate the SAME snapshot it started on, not
    whatever commits landed since — resolve the current snapshot once
    with :func:`current_snapshot_id`, stash it in the run's lineage,
    and pass it here on every (re)attempt."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg-spark runtime not on the classpath; submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-3.5 "
            "(or drop the jar into $SPARK_HOME/jars)")
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    return reader.load(table)


def current_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    """Latest committed snapshot id via the ``<table>.snapshots``
    metadata table (None for an empty table)."""
    if not iceberg_available(spark):
        raise RuntimeError("iceberg-spark runtime not on the classpath")
    from pyspark.sql import functions as F
    row = (spark.read.format("iceberg").load(f"{table}.snapshots")
           .orderBy(F.col("committed_at").desc()).limit(1)
           .select("snapshot_id").collect())
    return row[0]["snapshot_id"] if row else None


# ------------------------------------------------- manifest MERGE path ----

#: column list for the ValidationRun manifest table (matches
#: runner.MANIFEST_SCHEMA)
_MANIFEST_DDL = ("(partition_key string, run_id string, rows bigint, "
                 "invalid_rows bigint, violation_rows bigint, "
                 "passed boolean, started_at double, finished_at double, "
                 "input_lineage string)")


def ensure_manifest_table(spark: SparkSession, table: str) -> None:
    """``CREATE TABLE IF NOT EXISTS <table> USING iceberg`` with the
    ValidationRun manifest schema (requires the runtime jar)."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg-spark runtime not on the classpath; submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-3.5 "
            "(or drop the jar into $SPARK_HOME/jars)")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} {_MANIFEST_DDL} "
              f"USING iceberg")


def merge_manifest(spark: SparkSession, table: str,
                   rows_df: DataFrame) -> None:
    """Idempotent manifest commit: ``MERGE INTO`` keyed on
    ``(partition_key, input_lineage)`` — a retried group *replaces* its
    previous commit record for the same input snapshot instead of
    appending a duplicate, and records for a different snapshot (new
    lineage) coexist, so resume is snapshot-scoped.  Iceberg serializes
    the commit optimistically; concurrent retries converge on one row
    per key (SURVEY.md §2.6 checkpoint row: Iceberg snapshot IDs +
    idempotent MERGE)."""
    import uuid as _uuid

    ensure_manifest_table(spark, table)
    tmp = f"_manifest_updates_{_uuid.uuid4().hex[:8]}"
    rows_df.createOrReplaceTempView(tmp)
    try:
        spark.sql(merge_manifest_sql(table, tmp))
    finally:
        spark.catalog.dropTempView(tmp)


#: MERGE key — a retried group replaces its previous commit record for
#: the same input snapshot; different snapshots (new lineage) coexist
MERGE_KEYS = ("partition_key", "input_lineage")


def merge_manifest_sql(table: str, source: str) -> str:
    """The exact MERGE statement :func:`merge_manifest` executes —
    exposed so tests can run the literal text through Spark's SQL
    parser and so :func:`merge_manifest_local` provably implements the
    same statement's semantics."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in MERGE_KEYS)
    return (f"MERGE INTO {table} t USING {source} s "
            f"ON {on} "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *")


def merge_manifest_local(spark: SparkSession, path: str,
                         rows_df: DataFrame) -> None:
    """Local catalog stand-in for :func:`merge_manifest`: the same
    MERGE semantics (matched on :data:`MERGE_KEYS` -> the update
    replaces the target row; not matched -> insert) executed as a
    left-anti join + union over a parquet-backed manifest directory,
    because no open v2 catalog in this sandbox executes MERGE INTO
    (Iceberg jar absent; DuckDB < 1.4).

    NOT transactional: the read-rewrite is a single atomic directory
    swap locally but has no optimistic-concurrency story — Iceberg's
    snapshot commit (the jar-gated real path) is what makes concurrent
    retries safe on a cluster.  Used by tests to execute the MERGE
    semantics end-to-end (double-commit idempotency, lineage
    coexistence) and usable as a jarless dev fallback."""
    import os
    import shutil
    import uuid as _uuid

    cols = rows_df.columns
    if os.path.isdir(path) and any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in os.listdir(path)):
        cur = spark.read.parquet(path)
        kept = cur.join(rows_df.select(*MERGE_KEYS).distinct(),
                        on=list(MERGE_KEYS), how="left_anti")
        merged = kept.select(*cols).unionByName(rows_df)
    else:
        merged = rows_df
    tmp = f"{path}__merge_{_uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{_uuid.uuid4().hex[:8]}"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
