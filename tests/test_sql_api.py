"""The SQL surface: every table registers as a temp view
(tables.register_views), and Spark SQL text produces the same result as
the DataFrame plans — the dual API SURVEY.md §0 promises."""

from __future__ import annotations

from kafka_clickhouse_ingest_pipeline_spark import registry
from kafka_clickhouse_ingest_pipeline_spark.tables import TABLES, register_views

registry.load_all()


def test_register_views_exposes_all_tables(spark, sf_dir):
    frames = register_views(spark, sf_dir)
    assert set(frames) == set(TABLES)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").first().n > 0


def test_sql_text_matches_dataframe_plan(spark, sf_dir):
    """Spark SQL over the views computes the same answer as the
    registered DataFrame query (TPC-H Q5 shape)."""
    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT n.n_name AS nation,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n    ON c.c_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY revenue DESC, nation
        """
    ).collect()
    df_rows = registry.REGISTRY["q5_region_revenue"].fn(spark, sf_dir).collect()
    assert [(r.nation, r.revenue) for r in sql_rows] == [
        (r.nation, r.revenue) for r in df_rows
    ]
