"""Measure the nightly MATERIALIZED LSH band table (VERDICT r11 #5 /
ROUND11_NOTES #5): band-table writes only pay on cross-run reuse, so the
question is serving-shape probe time — an increment judged against the
STORED bucketed band/signature tables vs re-deriving the corpus index
in-session (what a cold `dedup_minhash_pairs_incremental` run does).

Variants, each best-of-3 noop-sink after a warm run:
  rebuild  — per-run: corpus signatures + band table materialized
             in-session, then the increment probe (the cold path).
  stored   — one-time: plans/layout.write_bucketed writes the band table
             bucketed on (band, k0..k3) and the signature table bucketed
             on doc_id; per-run: increment probe against the stored
             tables (the nightly serving path). The bucketed scan
             arrives hash-partitioned on the join key, so the corpus
             side of the probe join needs NO exchange — verified by
             grepping the executed plan.

Usage: python tools/band_probe.py [sf_dir] [n_copies]
  n_copies > 1 scales the corpus with tools/scale_probe.scaled_docs
  (id-offset perturbed copies) to give the corpus side real weight.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import dedup as D
from kafka_clickhouse_ingest_pipeline_spark.plans.layout import write_bucketed
from kafka_clickhouse_ingest_pipeline_spark.plans.materialize import materialize
from kafka_clickhouse_ingest_pipeline_spark.queries.dedup import (
    PLANT_EVERY,
    PLANT_OFFSET,
)
from kafka_clickhouse_ingest_pipeline_spark.session import build_session
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table
from tools.scale_probe import scaled_docs

BUCKETS = 32


def _best_of(fn, n=3):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = build_session(app_name="band-probe")
    docs = load_table(spark, sf_dir, "documents")
    if n_copies > 1:
        docs = scaled_docs(docs, n_copies).localCheckpoint(eager=True)
    docs = docs.select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    variants = docs.where(
        (F.col("doc_id") % PLANT_EVERY == 0) & (F.size(words) > 6)
    ).select(
        (F.col("doc_id") + F.lit(PLANT_OFFSET * max(n_copies, 1) * 2)).alias(
            "doc_id"
        ),
        F.concat_ws(" ", F.slice(words, 1, F.size(words) - 3)).alias("text"),
    )
    n_docs, n_new = docs.count(), variants.count()
    print(f"corpus={n_docs} docs, increment={n_new} docs", flush=True)

    # the increment's own signature cost is part of BOTH variants
    def probe_from(cband, csig, tag):
        nsig = materialize(
            D.minhash_signatures(variants, "text", "doc_id"),
            f"bp_nsig_{tag}_{time.monotonic_ns()}",
        )
        return D.lsh_pairs_against_corpus(nsig, cband, csig, "doc_id")

    def run_rebuild():
        csig = materialize(
            D.minhash_signatures(docs, "text", "doc_id"),
            f"bp_csig_{time.monotonic_ns()}",
        )
        cband = materialize(
            D.lsh_band_table(csig, "doc_id"),
            f"bp_cband_{time.monotonic_ns()}",
        )
        probe_from(cband, csig, "rb").write.mode("overwrite").format(
            "noop"
        ).save()

    t_rebuild = _best_of(run_rebuild)
    print(f"rebuild (in-session corpus index + probe): {t_rebuild:.3f}s",
          flush=True)

    # one-time nightly write (bucketed on the join keys)
    csig0 = materialize(
        D.minhash_signatures(docs, "text", "doc_id"), "bp_csig_write"
    )
    t0 = time.time()
    write_bucketed(
        D.lsh_band_table(csig0, "doc_id"),
        "bp_band_tbl",
        BUCKETS,
        ("band", "k0", "k1", "k2", "k3"),
    )
    write_bucketed(csig0, "bp_sig_tbl", BUCKETS, ("doc_id",))
    t_write = time.time() - t0
    print(f"one-time bucketed write (band + sig tables): {t_write:.3f}s",
          flush=True)

    cband_s = spark.table("bp_band_tbl")
    csig_s = spark.table("bp_sig_tbl")

    def run_stored():
        probe_from(cband_s, csig_s, "st").write.mode("overwrite").format(
            "noop"
        ).save()

    t_stored = _best_of(run_stored)
    print(f"stored (bucketed tables + probe): {t_stored:.3f}s", flush=True)

    plan = (
        probe_from(cband_s, csig_s, "plan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    band_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "band" in ln
    ]
    # exactly ONE band-key exchange is the good state: the increment
    # side must shuffle to meet the bucketed corpus scan, which itself
    # arrives pre-partitioned (no exchange above the bpl_band FileScan —
    # pinned by tests/test_plans.py::test_bucketed_band_table_scan_needs_no_exchange)
    print(
        f"band-key exchanges in stored plan: {len(band_exchanges)} "
        f"(1 = increment side only; corpus scan pre-partitioned)",
        flush=True,
    )
    print(
        f"RESULT rebuild={t_rebuild:.3f}s stored={t_stored:.3f}s "
        f"write_once={t_write:.3f}s speedup={t_rebuild / t_stored:.2f}x "
        f"breakeven_runs={t_write / max(t_rebuild - t_stored, 1e-9):.1f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
