"""CSV / JSON-lines source & sink with declared schemas.

The reference's only interchange formats are parquet-in (pandas read,
`/root/reference/src/incremental_ingestion.py:30`) and headerless CSV
as a COPY vehicle (`:39-53`, NULLs as empty strings). This module
makes both directions first-class Spark sources/sinks so a user can
land the same tables from CSV or JSONL drops, with the same
no-inference stance as the reference (§1.3): the schema is always
declared, never sampled.

Scale notes:
- ``mode="FAILFAST"`` by default — silent row corruption at 100 TB is
  unrecoverable; the dead-letter variant (``with_corrupt_capture``)
  routes bad records to a ``_corrupt_record`` column instead, the
  CSV/JSON analog of the reference's invalid_records table.
- multiline JSON is refused: JSON-LINES splits by newline so a 1 TB
  file still parallelizes; a single multi-GB JSON document does not.
- CSV writes are headerless + explicit NULL token, matching the
  reference's COPY format, so round-trips are byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

NULL_TOKEN = ""  # reference: COPY ... NULL '' (incremental_ingestion.py:49)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    failfast: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("nullValue", NULL_TOKEN)
        .option("mode", "FAILFAST" if failfast else "PERMISSIVE")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = False) -> None:
    """NULL writes as the bare token (``NULL ''`` — the reference COPY
    contract, `incremental_ingestion.py:49`); a non-null empty string
    writes as a QUOTED empty field (``""``) — a COPY-CSV consumer like
    the reference's Postgres stage reads the two back distinctly.

    Caveat, pinned by ``tests/test_formats.py``: Spark's own CSV
    *reader* cannot make that distinction (the univocity parser applies
    ``emptyValue`` substitution before the ``nullValue`` match), so
    ``read_csv`` maps both back to NULL — the same conflation the
    reference itself has on its pandas ``to_csv`` write side."""
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", '""')
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    failfast: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("multiLine", "false")
        .option("mode", "FAILFAST" if failfast else "PERMISSIVE")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def with_corrupt_capture(schema: StructType) -> StructType:
    """Schema + ``_corrupt_record`` column: malformed rows surface as
    data (PERMISSIVE mode) for dead-letter routing instead of failing
    the job — pair with ``failfast=False``."""
    return StructType(
        [*schema.fields, StructField("_corrupt_record", StringType(), True)]
    )
