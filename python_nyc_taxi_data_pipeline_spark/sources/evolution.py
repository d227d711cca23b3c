"""Schema evolution over append-only parquet tables.

The reference pins one schema forever (19 fixed bronze columns,
`/root/reference/src/db_setup.py:78-102`); a long-lived lakehouse
table instead accretes columns across years of appends. Plain parquet
supports this safely for ADDITIVE evolution (new nullable columns):
readers merge footers; old files surface NULL for new columns.

Policy implemented here (the conservative subset that cannot corrupt
data silently):
- ADD nullable column: allowed (mergeSchema read).
- DROP / RENAME / RETYPE: refused by ``validate_append`` — these are
  rewrite migrations, not appends (rename loses lineage; retype makes
  files disagree on a column's physical type, which fails or coerces
  at read time depending on the reader — never acceptable silently).

Scale notes: ``mergeSchema`` reads every file footer — O(#files) on
the driver — so evolved tables should pass an explicit unified schema
once known (``read_evolved`` derives it once, then re-reads with the
explicit schema; at 100 TB you cache that schema in a catalog, which
is what table formats like Delta/Iceberg institutionalize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SchemaEvolutionError(ValueError):
    pass


def validate_append(existing: StructType, incoming: StructType) -> list[str]:
    """Check incoming batch schema against the table schema. Returns the
    list of NEW column names (additive evolution); raises on drops or
    type changes."""
    old = {f.name: f.dataType for f in existing.fields}
    new = {f.name: f.dataType for f in incoming.fields}
    missing = [c for c in old if c not in new]
    if missing:
        raise SchemaEvolutionError(
            f"append drops columns {missing}; dropping requires a rewrite migration"
        )
    retyped = [
        f"{c}: {old[c].simpleString()} -> {new[c].simpleString()}"
        for c in old
        if old[c] != new[c]
    ]
    if retyped:
        raise SchemaEvolutionError(
            f"append changes column types {retyped}; retyping requires a rewrite"
        )
    return [c for c in new if c not in old]


def append_evolved(df: DataFrame, path: str, table_schema: StructType | None) -> list[str]:
    """Append a batch that may carry new nullable columns. Returns the
    added column names (for catalog/metadata logging)."""
    added = validate_append(table_schema, df.schema) if table_schema else []
    df.write.mode("append").parquet(path)
    return added


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read an evolved table: one mergeSchema pass derives the unified
    schema (old files yield NULL for later columns)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def backfill_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """Project NULLs from pre-evolution files onto explicit defaults —
    the read-side backfill that avoids rewriting historical files."""
    out = df
    for col, val in defaults.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return out
