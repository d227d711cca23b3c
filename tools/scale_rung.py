"""Persisted scale-rung benchmark — extrapolation evidence for the
100 TB claim that the in-memory 1x/2x/4x stress sweep (interpolation)
does not provide.

The stress harness (`tools/scale_stress.py`) measures SHUFFLE-GROWTH
exponents on fixtures rebuilt in-process per run; this tool measures
WALL-CLOCK on a fixture materialized ONCE to parquet (the
`build_inflated` machinery at 8x over sf0.1 ~= an sf0.8/sf1-class rung:
8x documents/embeddings/orders/lineitem/customer/events, dims
symlinked), using the same fresh-JVM-per-query `bench.py --one`
subprocess the isolated bench uses.

For each query it records cold + warm-min at the rung, joins the sf0.1
isolated/in-suite time, and reports the implied time-scaling exponent
``log(t_rung / t_sf01) / log(k)`` — sublinear (<1) means
fixed-overhead-dominated, ~1 is linear scan behavior, >1.15 is flagged
(a super-linear stage the stress ledger should already have named).

Usage:
    python tools/scale_rung.py [--build] [--names a,b,...] [rung_dir]

--build (re)materializes the rung fixture first. Default names: the
top-10 in-suite queries of the latest BENCH_local.json plus
medallion_e2e. Writes BENCH_rung.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_RUNG_DIR = "/tmp/sf_rung_8x"
INFLATION = 8
BASE_SF_DIR = "/root/testdata/sf0.1"
# Implied-exponent gate, aligned with scale_stress's shuffle-growth
# bar; wall-clock at small absolute times is noisier, so queries under
# the floor are reported but not gated.
MAX_EXPONENT = 1.15
MIN_BASE_SEC = 0.5

# Known fixed-config pins whose REGISTERED form is deliberately
# super-linear on an inflated fixture (the oracle pins a constant that
# production derives from the data). Flagged entries matching a key
# here are reported with their adjudication instead of failing the
# gate — only NEW surprises should fail a rung run. The production
# variants were measured at the 8x rung on 2026-08-15 (see
# BENCH_rung.json "adjudications"): semdedup scaled-k 1.123,
# margin-mining fixedq 0.637.
EXPECTED_SUPERLINEAR = {
    "embeddings_semdedup": (
        "k pinned at 8 for the oracle; within-cluster pair scan is "
        "O(n^2/k) at fixed k — production uses semdedup(k=None) = n/64"
    ),
    "embeddings_semdedup_ivf_contract": (
        "contract runs both variants incl. fixed-k=8; same O(n^2/k) term"
    ),
    "embeddings_margin_mining": (
        "held-out block is 10% of the corpus (q grows with n); "
        "production pins the query side (fixedq stress variant: 0.637)"
    ),
    "embeddings_semdedup_ivf_scaledk": (
        "flat Lloyd assignment against k data-derived centroids is "
        "O(n*k*d) compute with k = n/64 — intrinsically quadratic "
        "(16x rung measured 1.162); the at-scale path is the "
        "hierarchical RP-tree clusterer (embeddings_semdedup_hier_"
        "scaledk, O(n*log k*d), probed on the same rung)"
    ),
}


def top_queries(n: int = 10) -> list[str]:
    with open(os.path.join(ROOT, "BENCH_local.json")) as f:
        q = json.load(f)["queries"]
    names = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])]
    names = [k for k in names if k != "medallion_e2e"][:n]
    return names + ["medallion_e2e"]


def run_one(name: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--one", name],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        capture_output=True,
        text=True,
        timeout=1800,
    )
    last = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        return json.loads(last)
    except ValueError:
        return {"error": proc.stderr[-500:]}


def main() -> int:
    global INFLATION
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--inflation="):
            INFLATION = int(a[len("--inflation=") :])
    rung_dir = (
        args[0]
        if args
        else (
            DEFAULT_RUNG_DIR
            if INFLATION == 8
            else f"/tmp/sf_rung_{INFLATION}x"
        )
    )
    if "--build" in sys.argv[1:] or not os.path.exists(
        os.path.join(rung_dir, "documents.parquet")
    ):
        from scale_stress import build_inflated

        print(f"# building {INFLATION}x rung at {rung_dir}", file=sys.stderr)
        build_inflated(BASE_SF_DIR, INFLATION, rung_dir)

    names = None
    for a in sys.argv[1:]:
        if a.startswith("--names="):
            names = [n for n in a[len("--names=") :].split(",") if n]
    if names is None:
        names = top_queries()

    # sf0.1 comparison base: prefer the isolated warm number (same
    # fresh-JVM harness as the rung run), fall back to in-suite.
    iso: dict = {}
    try:
        with open(os.path.join(ROOT, "BENCH_isolated.json")) as f:
            iso = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass
    suite: dict = {}
    try:
        with open(os.path.join(ROOT, "BENCH_local.json")) as f:
            suite = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass

    results: dict[str, dict] = {}
    flagged: dict[str, float] = {}
    for name in names:
        got = run_one(name, rung_dir)
        entry: dict = {
            "cold": got.get("cold"),
            "warm_min": got.get("warm_min"),
        }
        if "error" in got:
            entry["error"] = got["error"]
        if name == "medallion_e2e":
            entry["rows"] = got.get("rows")
            if got.get("warm_min") and got.get("rows"):
                entry["rows_per_sec"] = round(got["rows"] / got["warm_min"], 1)
        base = None
        base_src = None
        iso_row = iso.get(name) or {}
        if isinstance(iso_row, dict) and iso_row.get("warm_min"):
            base, base_src = iso_row["warm_min"], "isolated_warm"
        elif isinstance(suite.get(name), (int, float)):
            base, base_src = suite[name], "in_suite"
        else:
            # Unregistered production variants (scale_stress EXTRA_FNS)
            # have no isolated/in-suite history — measure the sf0.1
            # base with the same fresh-JVM harness right now, so the
            # rung exponent is computed against a same-session number.
            got_base = run_one(name, BASE_SF_DIR)
            if got_base.get("warm_min"):
                base, base_src = got_base["warm_min"], "measured_base_warm"
        if base and entry.get("warm_min"):
            entry["sf01_base_sec"] = base
            entry["sf01_base_src"] = base_src
            ratio = entry["warm_min"] / base
            entry["time_ratio"] = round(ratio, 3)
            exp = math.log(max(ratio, 1e-9)) / math.log(INFLATION)
            entry["implied_exponent"] = round(exp, 3)
            if base >= MIN_BASE_SEC and exp > MAX_EXPONENT:
                if name in EXPECTED_SUPERLINEAR:
                    entry["adjudicated"] = EXPECTED_SUPERLINEAR[name]
                else:
                    flagged[name] = entry["implied_exponent"]
        results[name] = entry
        print(f"# rung {name}: {entry}", file=sys.stderr)

    out_name = (
        "BENCH_rung.json"
        if INFLATION == 8
        else f"BENCH_rung_{INFLATION}x.json"
    )
    out_path = os.path.join(ROOT, out_name)
    # Merge with a prior snapshot of the SAME rung, so an incremental
    # `--names=a,b` probe (e.g. adjudicating a flagged trio later in
    # the round) extends the persisted evidence instead of discarding
    # the full sweep. Flags likewise merge: prior flags stand unless
    # their query was re-run.
    prior_q: dict = {}
    prior_flags: dict = {}
    prior_extra: dict = {}
    try:
        with open(out_path) as f:
            prior = json.load(f)
        if (
            prior.get("inflation") == INFLATION
            and prior.get("rung_dir") == rung_dir
            and prior.get("base_sf_dir") == BASE_SF_DIR
        ):
            prior_q = prior.get("queries", {})
            prior_flags = prior.get("flagged", {})
            prior_extra = {
                k: v
                for k, v in prior.items()
                if k in ("adjudications", "ok_after_adjudication")
            }
    except (OSError, ValueError):
        pass
    merged_q = {**prior_q, **results}
    merged_flags = {
        **{k: v for k, v in prior_flags.items() if k not in results},
        **flagged,
    }
    payload = {
        "metric": "scale_rung",
        "rung_dir": rung_dir,
        "inflation": INFLATION,
        "base_sf_dir": BASE_SF_DIR,
        "unit": "sec",
        "max_exponent": MAX_EXPONENT,
        "queries": merged_q,
        "flagged": merged_flags,
        "ok": not merged_flags,
        **prior_extra,
    }
    flagged = merged_flags
    with open(out_path, "w") as f:
        f.write(json.dumps(payload, indent=1) + "\n")
    print(json.dumps({k: payload[k] for k in ("metric", "inflation", "ok", "flagged")}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
