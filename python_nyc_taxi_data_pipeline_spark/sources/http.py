"""HTTP parquet source (SURVEY §2.1 S1).

The reference reads monthly files straight off cloudfront with pandas
(`/root/reference/src/incremental_ingestion.py:14,17-20,30`). Spark
cannot scan ``https://`` natively, so the Spark-first equivalent is a
download step to a local/shared staging path followed by a
schema-enforced parquet scan. Network access is gated — everything
degrades to reading an already-downloaded file.
"""

from __future__ import annotations

import os
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

URL_TEMPLATE = (
    "https://d37ci6vzurychx.cloudfront.net/trip-data/"
    "yellow_tripdata_{year}-{month:02d}.parquet"
)


def download_url_template(year: int, month: int) -> str:
    """URL builder (`incremental_ingestion.py:14,17-20`); unit-tested in
    the reference (`test/test_download_url.py:13-15`) and here."""
    return URL_TEMPLATE.format(year=year, month=month)


def fetch_month(
    year: int,
    month: int,
    staging_dir: str,
    timeout: float = 60.0,
    url_template: str | None = None,
) -> str:
    """Download one monthly file into ``staging_dir`` (idempotent: skips
    when the file already exists). Returns the local path.

    ``url_template`` overrides the cloudfront template — any scheme
    urllib can open works (``file://`` lets integration tests exercise
    the full download→ingest seam without network)."""
    os.makedirs(staging_dir, exist_ok=True)
    dest = os.path.join(staging_dir, f"yellow_tripdata_{year}-{month:02d}.parquet")
    if os.path.exists(dest):
        return dest
    url = (
        url_template.format(year=year, month=month)
        if url_template
        else download_url_template(year, month)
    )
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(
        dest + ".part", "wb"
    ) as out:
        while chunk := resp.read(1 << 20):
            out.write(chunk)
    os.replace(dest + ".part", dest)
    return dest


def read_parquet_with_schema(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-enforced scan (no inference, SURVEY §1.3). Columns are
    selected/cast to the declared schema — the positional-CSV-COPY hop
    the reference needs (`incremental_ingestion.py:39-53`) disappears."""
    raw = spark.read.parquet(path)
    cols = []
    lower = {c.lower(): c for c in raw.columns}
    for field in schema.fields:
        src = lower.get(field.name.lower())
        if src is None:
            from pyspark.sql import functions as F

            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(raw[src].cast(field.dataType).alias(field.name))
    return raw.select(*cols)
