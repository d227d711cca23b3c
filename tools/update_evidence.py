"""Derive the query-registration order from driver evidence.

Scans every ``CORRECTNESS_r*.json`` at the repo root and rewrites
``python_nyc_taxi_data_pipeline_spark/evidence.json`` with, per query,
the newest round whose row was fully green (rows+schema+hash, or
rows-only for oracle-less queries). The registry orders its listing by
(last_green_round ascending, name) so the driver's 50-query correctness
window always re-checks the queries with no or the stalest evidence:
never-checked and never-green queries sort first, then oldest-green.

Run after each round lands a new CORRECTNESS file:

    python tools/update_evidence.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    ROOT, "python_nyc_taxi_data_pipeline_spark", "evidence.json"
)


def green(name, row: dict) -> bool:
    if row.get("err"):
        return False
    if row.get("rows_match") is None:
        # Rows-only run: only green for queries that genuinely have no
        # oracle (a rows-only row for an oracle-backed query means no
        # comparison happened — "checked, never green", round 0).
        return name in oracle_free and row.get("spark_rows") is not None
    return bool(
        row.get("rows_match")
        and (row.get("schema_match") is not False)
        and (row.get("hash_match") is not False)
    )


def _oracle_free_queries() -> set[str]:
    import sys

    sys.path.insert(0, ROOT)
    from python_nyc_taxi_data_pipeline_spark.registry import all_queries

    return {n for n, q in all_queries().items() if q.oracle is None}


oracle_free: set[str] = set()


def main() -> None:
    global oracle_free
    oracle_free = _oracle_free_queries()
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if green(name, row):
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_green.setdefault(name, 0)  # checked, never green
    with open(OUT, "w") as f:
        json.dump(dict(sorted(last_green.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    never = sorted(n for n, r in last_green.items() if r == 0)
    print(f"wrote {OUT}: {len(last_green)} queries with driver evidence")
    print(f"never-green ({len(never)}): {never}")


if __name__ == "__main__":
    main()
