"""Table readers — the engine's scan surface.

The reference reads JSON instance files / stdin
(/root/reference/jsonschema/cli.py:50-62,259-270); the engine's analogue
reads instance *tables*: parquet (columnar, the scale path), NDJSON
(line-delimited instances — the direct lift of the reference's input
mode), CSV, and ORC.  Iceberg works through the same `spark.read.table`
path when a catalog is configured (not bundled in this sandbox).

Schema handling: JSON/CSV readers infer by default, which samples the
input once; pass an explicit `schema` (DDL string or StructType) in
production so the scan is single-pass and types are stable.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "json", "csv", "orc")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: Optional[Any] = None,
               **options: str) -> DataFrame:
    """Read an instance table.  `fmt`: parquet | json (NDJSON) | csv |
    orc, or a table name prefixed 'table:' for catalog tables."""
    if fmt.startswith("table:") or path.startswith("table:"):
        name = path[6:] if path.startswith("table:") else path
        return spark.read.table(name)
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema",
                           "true" if schema is None else "false")
    return reader.options(**options).format(fmt).load(path)


def validate_json_lines(spark: SparkSession, path: str, spec: dict,
                        id_cols=(), schema: Optional[Any] = None,
                        registry=None) -> DataFrame:
    """The reference's CLI flow lifted: NDJSON instances -> violation
    rows (`python -m jsonschema -i instance.json schema.json` becomes one
    distributed scan)."""
    from ..validator import CompiledValidator
    df = read_table(spark, path, "json", schema=schema)
    return CompiledValidator(spec, df, registry).violations(df, id_cols)
