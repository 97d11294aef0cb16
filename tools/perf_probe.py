"""Per-query perf probe for the optimization rounds.

Usage: python tools/perf_probe.py [--tag before|after] [--sf SF_DIR]
           [--runs N] query [query ...]

For each named registered query: builds the DataFrame, runs one warm
noop-sink save (JIT/IO cache), then times N noop saves and reports the
best (the bench methodology), and writes the AQE-initial formatted plan
to plans/r12/<query>_<tag>.txt along with a one-line summary of the
scale-relevant plan features (Exchange count, join strategies, Python
eval nodes, PushedFilters presence).
"""

from __future__ import annotations

import argparse
import io
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_clickhouse_ingest_pipeline_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all,
)
from kafka_clickhouse_ingest_pipeline_spark.session import (  # noqa: E402
    build_session,
)

PLANS_DIR = Path(__file__).resolve().parent.parent / "plans" / "r13"

FEATURES = [
    ("Exchange", "Exchange"),
    ("BroadcastHashJoin", "BHJ"),
    ("ShuffledHashJoin", "SHJ"),
    ("SortMergeJoin", "SMJ"),
    ("BroadcastNestedLoopJoin", "BNLJ"),
    ("CartesianProduct", "CARTESIAN"),
    ("ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas|PythonMapInArrow", "py"),
    ("TakeOrderedAndProject", "topk"),
    ("PushedFilters: \\[[^]]", "pushed"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="write plan to plans/r12/<q>_<tag>.txt")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = build_session(app_name="perf_probe")
    load_all()
    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        df = REGISTRY[name].fn(spark, args.sf)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df.write.mode("overwrite").format("noop").save()  # warm
        best = float("inf")
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        feats = []
        for pat, label in FEATURES:
            n = len(re.findall(pat, plan))
            if n:
                feats.append(f"{label}={n}")
        print(f"{name}: best={best:.3f}s runs={times} | {' '.join(feats)}")
        if args.tag:
            out = PLANS_DIR / f"{name}_{args.tag}.txt"
            out.write_text(plan)
            print(f"  plan -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
