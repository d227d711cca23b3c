"""Oracle-parity check for the STAGED round-7 candidate queries.

Same canonicalization as ``tools/oracle_check.py`` (the driver-gate
replica), pointed at ``llm/staged_r7.STAGED`` instead of the live
registry — the staged queries must clear the exact bar they will face
when registered in round 7.

Usage: python tools/staged_check.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import compare  # noqa: E402

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES  # noqa: E402
from python_nyc_taxi_data_pipeline_spark.llm.staged_r7 import STAGED  # noqa: E402
from python_nyc_taxi_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_session("staged-check")
    failures = 0
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in FIXTURE_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, q in STAGED.items():
            try:
                sdf = q.fn(spark, sf_dir).toPandas()
                ddf = con.execute(q.oracle).fetchdf()
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                print(f"FAIL {name} @ {sf_dir}: {type(exc).__name__}: {exc}")
                failures += 1
                continue
            problems = compare(name, sdf, ddf)
            if problems:
                failures += 1
                print(f"FAIL {name} @ {sf_dir} ({len(sdf)} spark / {len(ddf)} duck rows)")
                for p in problems:
                    print(f"  - {p}")
            else:
                print(f"PASS {name} @ {sf_dir} ({len(sdf)} rows)")
        con.close()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
