"""AQE-off plan audit of the CLAUDE.md AQE-recoverable exception sites
(VERDICT r11 #6): `graph_triangle_counts` and
`graph_clustering_coefficient` keep their degree joins un-hinted because
their underestimated sides sit behind genuine in-plan shuffle exchanges,
so AQE re-plans the join from runtime sizes and demotes any oversized
broadcast. The aqe_off variant gate proves CORRECTNESS holds without
AQE; this audit checks plan QUALITY at scale: with AQE disabled and a
64x corpus, does a corpus-sized side statically broadcast? (It should
not — static stats for in-plan aggregates derive from real file scans,
which exceed the 10 MB broadcast threshold at depth. Verify, don't
assume.)

Usage: python tools/aqe_off_plan_audit.py [n_copies]
Prints every BroadcastExchange/BroadcastHashJoin line of the executed
plans at 1x and n_copies-x, with AQE on and off.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.session import build_session
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table
from tools.scale_probe import _write_chunked, scaled_docs

SF_DIR = "/root/testdata/sf0.1"
QUERIES = ["graph_triangle_counts", "graph_clustering_coefficient"]


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = build_session(app_name="aqe-off-audit")
    registry.load_all()
    docs = load_table(spark, SF_DIR, "documents")
    base = Path(tempfile.mkdtemp(prefix="aqe_audit_"))
    dirs = {1: SF_DIR}
    d = base / f"x{n_copies}"
    d.mkdir()
    _write_chunked(scaled_docs, docs, n_copies, str(d / "documents.parquet"))
    for p in Path(SF_DIR).glob("*.parquet"):
        if p.stem != "documents":
            (d / p.name).symlink_to(p)
    dirs[n_copies] = str(d)

    for scale, sf in dirs.items():
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            for q in QUERIES:
                df = registry.REGISTRY[q].fn(spark, sf)
                plan = df._jdf.queryExecution().executedPlan().toString()
                bc = [
                    ln.strip()[:160]
                    for ln in plan.splitlines()
                    if "BroadcastExchange" in ln or "BroadcastHashJoin" in ln
                ]
                print(f"=== {q} @{scale}x aqe={aqe}: "
                      f"{len(bc)} broadcast nodes", flush=True)
                for ln in bc:
                    print(f"    {ln}", flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
