"""One-off probe: total shuffle bytes written for a named query.

Usage: python tools/shuffle_probe.py <query_name> [sf_dir]
Runs the query through a noop sink on a fresh session, then sums
shuffle write bytes across all stages via the local status REST API.
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_clickhouse_ingest_pipeline_spark.registry import (  # noqa: E402
    REGISTRY,
    load_all,
)
from kafka_clickhouse_ingest_pipeline_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = build_session(
        app_name="shuffle_probe", extra_conf={"spark.ui.enabled": "true"}
    )
    load_all()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    # Only COMPLETE attempts, one (final) attempt per stageId: failed or
    # retried attempts would double-count the same shuffle and inflate
    # the numbers the repo's key-representation decisions rest on
    # (round-7 ADVICE).
    final: dict[int, dict] = {}
    for s in stages:
        if s.get("status") != "COMPLETE":
            continue
        sid = s["stageId"]
        if sid not in final or s.get("attemptId", 0) > final[sid].get(
            "attemptId", 0
        ):
            final[sid] = s
    kept = list(final.values())
    wr = sum(s.get("shuffleWriteBytes", 0) for s in kept)
    rd = sum(s.get("shuffleReadBytes", 0) for s in kept)
    recs = sum(s.get("shuffleWriteRecords", 0) for s in kept)
    print(
        json.dumps(
            {
                "query": name,
                "shuffle_write_bytes": wr,
                "shuffle_read_bytes": rd,
                "shuffle_write_records": recs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
