"""Oracle-parity check for the STAGED next-round candidate queries.

Same canonicalization as ``tools/oracle_check.py`` (the driver-gate
replica), pointed at a ``llm/staged_rN.STAGED`` slate instead of the
live registry — the staged queries must clear the exact bar they will
face when registered next round.

Usage: python tools/staged_check.py [--module rN] [--only a,b] [sf_dir ...]
(default module: the first slate whose queries are not yet in the live
registry — self-healing as slates get promoted round over round)
"""

from __future__ import annotations

import importlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import compare  # noqa: E402

from python_nyc_taxi_data_pipeline_spark.catalog import FIXTURE_TABLES  # noqa: E402
from python_nyc_taxi_data_pipeline_spark.session import get_session  # noqa: E402


def _default_module() -> str:
    """First staged slate not yet promoted into the live registry —
    slates discovered by glob (llm/staged_rN.py, ascending N), the
    same rule bench.py's _staged_modules uses, so a brand-new slate
    module is checkable without touching this list."""
    import glob
    import re

    from python_nyc_taxi_data_pipeline_spark.registry import all_queries

    live = set(all_queries())
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "python_nyc_taxi_data_pipeline_spark",
        "llm",
    )
    slates = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(pkg, "staged_r*.py"))
        if (m := re.match(r"^staged_r(\d+)\.py$", os.path.basename(p)))
    )
    for n in slates:
        module = f"r{n}"
        try:
            mod = importlib.import_module(
                f"python_nyc_taxi_data_pipeline_spark.llm.staged_{module}"
            )
        except ModuleNotFoundError:
            continue
        if any(q not in live for q in mod.STAGED):
            return module
    return f"r{slates[-1]}" if slates else "r10"


def main() -> int:
    argv = sys.argv[1:]
    module = _default_module()
    only: set[str] | None = None
    rest: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--module":
            module = argv[i + 1]
            i += 2
        elif argv[i] == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    mod = importlib.import_module(
        f"python_nyc_taxi_data_pipeline_spark.llm.staged_{module}"
    )
    STAGED = {
        n: q for n, q in mod.STAGED.items() if only is None or n in only
    }
    sf_dirs = rest or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
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
