"""Partitioning discipline for 10^12-turn scale (SURVEY §4 items 1-2).

The scoring stage is map-only (no shuffle), so partition skew only matters
when (a) reading few huge files, or (b) running conversation-level
aggregates/ordering.  For those we provide:

* ``salted_repartition`` -- break conv_id skew by hashing (conv_id, salt)
  where salt = turn_idx // block, keeping blocks of a conversation together
  (stable intra-block order) while splitting mega-conversations across
  partitions.
* ``stable_order_within_partitions`` -- the north_rule's stable
  (conv_id, turn_idx) ordering: repartition by conv_id hash then
  sortWithinPartitions, giving a deterministic per-partition order without a
  global sort (a global orderBy would be a full range-shuffle at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    block_size: int = 1024,
) -> DataFrame:
    """Hash-repartition on (key, order_col // block_size).

    A conversation owning 10% of all turns (the skewed head) is split into
    ~len/block_size partitions instead of landing on one executor, while any
    window of ``block_size`` consecutive turns stays co-located.
    """
    salt = (F.col(order_col).cast("long") / F.lit(block_size)).cast("long")
    return df.repartition(num_partitions, F.col(key), salt)


def stable_order_within_partitions(
    df: DataFrame,
    num_partitions: int,
    key: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Repartition by *key* and sort each partition by (key, order_col).

    Gives every downstream per-partition operator a stable, reproducible scan
    order (the invariant the north_rule mandates) at the cost of one shuffle +
    in-partition sort -- no global range shuffle.
    """
    return df.repartition(num_partitions, F.col(key)).sortWithinPartitions(
        key, order_col
    )
