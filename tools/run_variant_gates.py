"""Round-close ritual: the FULL oracle gate under every hardening variant.

Round-6 and round-7 both ended with the variant record stale (full runs
at N queries, late registrations only spot-checked). This one-liner runs
`tools/check_correctness.py` as a fresh subprocess per variant — each
variant needs its own JVM/session — so the record can never again lag
the registry:

    python tools/run_variant_gates.py [sf_dir] [variant ...] [-- query ...]

Variants (default: all six):
  default     pinned-UTC ANSI-on session (the driver contract)
  ansi_off    spark.sql.ansi.enabled=false
  tz_newyork  spark.sql.session.timeZone=America/New_York
  storage     SPARK_GRAFT_MATERIALIZE_MODE=storage
  partitions  SPARK_GRAFT_CPUS=4 + spark.sql.shuffle.partitions=7
              (partition-count invariance: the hash contract must not
              depend on harness parallelism)

Prints one summary line per variant (pass/fail counts + wall time) and a
final PASS/FAIL verdict; exit code 1 if any variant has failures.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VARIANTS: dict[str, dict[str, str]] = {
    "default": {},
    "ansi_off": {"SPARK_GRAFT_EXTRA_CONF": "spark.sql.ansi.enabled=false"},
    "tz_newyork": {
        "SPARK_GRAFT_EXTRA_CONF": (
            "spark.sql.session.timeZone=America/New_York"
        )
    },
    "storage": {"SPARK_GRAFT_MATERIALIZE_MODE": "storage"},
    "partitions": {
        "SPARK_GRAFT_CPUS": "4",
        "SPARK_GRAFT_EXTRA_CONF": "spark.sql.shuffle.partitions=7",
    },
    # VERDICT r10 #2: the CLAUDE.md AQE-recoverable broadcast exception
    # (triangle_counts' degree joins, and any future site leaning on it)
    # makes some plans' SCALE-safety contingent on AQE. Correctness must
    # never be: this variant runs the full registry with AQE off so a
    # query that silently depends on AQE's runtime re-planning for right
    # ANSWERS (not just good plans) fails the gate.
    "aqe_off": {
        "SPARK_GRAFT_EXTRA_CONF": "spark.sql.adaptive.enabled=false"
    },
}


def run_variant(name: str, sf_dir: str, queries: list[str]) -> dict:
    env = dict(os.environ)
    # clear any ambient variant config so each run is exactly one variant
    for k in ("SPARK_GRAFT_EXTRA_CONF", "SPARK_GRAFT_MATERIALIZE_MODE",
              "SPARK_GRAFT_CPUS"):
        env.pop(k, None)
    env.update(VARIANTS[name])
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_correctness.py"),
         sf_dir, *queries],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
    )
    out = proc.stdout.replace("\r", "\n")
    n_pass = len(re.findall(r"^PASS ", out, re.M))
    fails = re.findall(r"^FAIL (\S+):", out, re.M)
    wall = time.time() - t0
    return {
        "variant": name,
        "pass": n_pass,
        "fail": fails,
        "wall_sec": round(wall, 1),
        "exit": proc.returncode,
        "tail": out[-2000:] if proc.returncode not in (0, 1) else "",
    }


def main() -> int:
    args = sys.argv[1:]
    queries: list[str] = []
    if "--" in args:
        i = args.index("--")
        queries = args[i + 1:]
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] if len(args) > 1 else list(VARIANTS)
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        print(f"unknown variants: {unknown}; have {list(VARIANTS)}")
        return 2

    # Round-8 ADVICE low: a typo'd query filter (check_correctness skips
    # unknown names, exits 0) or any zero-query run used to print a
    # vacuous ALL GREEN from the tool whose purpose is preventing stale
    # records. Pin the EXPECTED count up front: the requested subset
    # size, else the full registry.
    if queries:
        expected = len(queries)
    else:
        sys.path.insert(0, str(REPO))
        from kafka_clickhouse_ingest_pipeline_spark import registry

        registry.load_all()
        expected = len(registry.REGISTRY)
    print(f"expecting {expected} queries per variant")

    any_fail = False
    for name in names:
        r = run_variant(name, sf_dir, queries)
        short = r["pass"] + len(r["fail"]) != expected
        status = (
            "OK "
            if not r["fail"] and r["exit"] in (0,) and not short
            else "FAIL"
        )
        print(
            f"{status} {name:<11} pass={r['pass']:<4} "
            f"fail={len(r['fail'])} wall={r['wall_sec']}s"
            + (f" failed={r['fail']}" if r["fail"] else "")
            + (
                f" SHORT RUN: pass+fail={r['pass'] + len(r['fail'])}"
                f" != expected {expected} (typo'd --query filter or"
                " crashed gate?)"
                if short
                else ""
            )
        )
        if r["tail"]:
            print(f"  (abnormal exit {r['exit']}) tail:\n{r['tail']}")
        if r["fail"] or r["exit"] != 0 or short:
            any_fail = True
    print("VARIANT GATES:", "FAIL" if any_fail else "ALL GREEN")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
