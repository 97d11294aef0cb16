"""Sequence packing: assign documents to fixed token-budget bins.

LLM pre-training consumes fixed-length contexts; the standard data-prep
step is to pack variable-length documents into ~budget-token bins. This
implements deterministic *sequential* packing: within each shard
(`group_col`), documents are laid out in `order_col` order along a global
token offset, and a document belongs to the bin its start offset falls in
(`bin_id = start_offset div budget`). A document that straddles a boundary
stays in its start bin, so a bin can overflow by at most one document —
the same overflow rule most packers (e.g. t5-style) use before truncation.

Scale shape: one window per shard — the shuffle is a single hash exchange
on `group_col`, and each shard's running sum is computed in one pass on
one executor. At 100 TB the shard key (source / date / path-prefix) keeps
every partition bounded; there is deliberately NO global ordering, which
would serialize the whole corpus through a single range partitioner.

No reference counterpart (SURVEY.md tier C is driver-mandated; the
reference pipeline at `consumer2/.../MessageProcessor.kt:27-71` batches by
count, not by token budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2048


def pack_sequential(
    df: DataFrame,
    *,
    tokens_col: Column,
    order_col: str,
    group_col: str,
    budget: int = DEFAULT_BUDGET,
) -> DataFrame:
    """Add `n_tokens`, `bin_id`, `bin_offset` columns.

    `bin_offset` is the document's start position within its bin; integer
    arithmetic throughout (floor of an exact small-int double division), so
    results are bit-portable across engines.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_toks = df.withColumn("n_tokens", tokens_col)
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    bin_id = F.floor(cum_before / F.lit(float(budget))).cast("long")
    return with_toks.select(
        "*",
        bin_id.alias("bin_id"),
        (cum_before - bin_id * F.lit(budget)).cast("long").alias("bin_offset"),
    )
