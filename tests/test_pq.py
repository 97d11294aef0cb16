"""Product-quantization invariants (oracle pins exact values; these pin
the structural guarantees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_clickhouse_ingest_pipeline_spark.operators import similarity as S
from kafka_clickhouse_ingest_pipeline_spark.queries.similarity import (
    pq_adc_topk,
    pq_encode_codes,
)
from kafka_clickhouse_ingest_pipeline_spark.tables import load_table


def test_pq_codes_cover_corpus_and_bounds(spark, sf_dir):
    df = pq_encode_codes(spark, sf_dir).cache()
    try:
        n = load_table(spark, sf_dir, "embeddings").count()
        assert df.count() == n  # every vector encoded exactly once
        for m in range(4):
            c = F.col(f"code_{m}")
            assert df.where((c < 0) | (c >= 16)).count() == 0
        assert df.where(F.col("recon_err") < 0).count() == 0
        # codebooks are actually used: more than one code per subspace
        assert df.select("code_0").distinct().count() > 1
    finally:
        df.unpersist()


def test_pq_quantization_reduces_distance_info_not_order(spark, sf_dir):
    rows = pq_adc_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    # estimates are sorted ascending and non-negative
    ests = [r.est_dist for r in rows]
    assert ests == sorted(ests) and ests[0] >= 0
    # ADC under-estimates on average vs true distance (quantization
    # collapses within-cell variance); allow equality for robustness
    assert sum(r.est_dist for r in rows) <= sum(r.true_dist for r in rows)


def test_pq_adc_recall_against_exact_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    adc_ids = {r.vec_id for r in S.pq_adc_topk(emb, q, k_top=10).collect()}
    corpus = emb.select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    qv = q.select(S.as_double(F.col("embedding")).alias("qv"))
    d = S._l2sq(F.col("v"), F.col("qv"))
    exact = (
        corpus.crossJoin(F.broadcast(qv))
        .where(F.col("vec_id") != 0)
        .select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    exact_ids = {r.vec_id for r in exact}
    # 4x16-code PQ on 64 dims is coarse; still expect some of the true
    # top-10 to survive — a floor of 2/10 catches gross breakage
    assert len(adc_ids & exact_ids) >= 2


def test_random_projection_distortion_concentrates_near_one(spark, sf_dir):
    from kafka_clickhouse_ingest_pipeline_spark.queries.similarity import (
        random_projection_distortion,
    )

    rows = random_projection_distortion(spark, sf_dir).collect()
    assert len(rows) == 190  # C(20, 2)
    ratios = sorted(r.ratio for r in rows)
    assert all(r > 0 for r in ratios)
    # JL with 16 target dims: sd(ratio) ~ sqrt(2/16) = 0.35; the median
    # should sit well inside one sd of 1 and the bulk inside ~3 sd
    median = ratios[len(ratios) // 2]
    assert 0.6 < median < 1.5
    inside = sum(1 for r in ratios if 0.25 < r < 2.5)
    assert inside / len(ratios) > 0.9


def test_pq_adc_rejects_multi_row_query(spark, sf_dir):
    """ADVICE r3: dtab drops q_id after the crossJoin, so a >1-row query
    frame would silently mix distances across queries — must fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_clickhouse_ingest_pipeline_spark.operators.similarity import (
        pq_adc_topk,
    )
    from kafka_clickhouse_ingest_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    two = emb.orderBy("vec_id").limit(2)
    with pytest.raises(ValueError, match="exactly one query row"):
        pq_adc_topk(emb, two)
    with pytest.raises(ValueError, match="exactly one query row"):
        pq_adc_topk(emb, emb.where(F.lit(False)))
