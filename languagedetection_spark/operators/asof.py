"""As-of join -- an operator Spark lacks natively (pyspark_guide 'Common
OLAP patterns').

For each left row, the right row with the greatest ``right.ts <= left.ts``
within the same key.  Implemented with ``applyInPandas`` over the key
(co-grouped), sorting each side and running ``pd.merge_asof`` per group --
the Arrow-batched version of the standard recipe.  The per-key group must
fit in a worker's memory; at 100 TB that holds after keying by entity
(user/conversation), the same assumption a range-bucketed SQL rewrite makes.

Ties: the right side must be unique per (key, ts) -- pre-deduplicate or the
result is engine-defined.  (DuckDB's ASOF JOIN has the same caveat.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: dict[str, str]) -> DataFrame:
    """left/right: DataFrames with *key* and *ts* columns.
    right_cols: {right_col: output_alias} to carry from the matched row."""
    l_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    )
    out_schema = l_fields + ", " + ", ".join(
        f"{alias} {right.schema[c].dataType.simpleString()}"
        for c, alias in right_cols.items()
    )
    rc = dict(right_cols)
    # Rename the right side's ts before the cogroup: a projection on top of
    # FlatMapCoGroupsInPandas lets Catalyst prune child columns whose NAME
    # matches a pruned output column, silently dropping right.ts (verified
    # on Spark 4.1: `.select(...)` after the cogroup -> KeyError 'ts' in the
    # UDF).  A unique name sidesteps the pruning.
    rts = "__asof_rts"
    right = right.withColumnRenamed(ts, rts)

    int_aliases = [
        alias for c, alias in right_cols.items()
        if right.schema[c].dataType.simpleString() in ("bigint", "int")
    ]

    def run(lpdf, rpdf):
        import pandas as pd

        if lpdf.empty:  # key present only on the right: no output rows
            return pd.DataFrame(
                {c: pd.Series(dtype="object")
                 for c in list(lpdf.columns) + list(rc.values())}
            )
        lpdf = lpdf.sort_values(ts, kind="mergesort")
        if rpdf.empty:  # key present only on the left: all unmatched
            rsel = pd.DataFrame({ts: pd.Series(dtype=lpdf[ts].dtype),
                                 **{a: pd.Series(dtype="float64")
                                    for a in rc.values()}})
        else:
            rsel = rpdf[[rts] + list(rc)].rename(columns={rts: ts, **rc})
        rsel = rsel.sort_values(ts, kind="mergesort")
        merged = pd.merge_asof(lpdf, rsel, on=ts, direction="backward",
                               allow_exact_matches=True)
        for a in int_aliases:  # unmatched rows: NaN -> nullable Int64
            merged[a] = merged[a].astype("Int64")
        return merged

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(lambda l, r: run(l, r), schema=out_schema)
    )
