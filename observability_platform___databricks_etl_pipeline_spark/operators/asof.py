"""As-of join — Spark lacks a native one (SURVEY.md §2.3 gap row).

Scale-first implementation: the union-window trick. Tag both sides, union,
then one window pass per key ordered by (time, side) propagates the most
recent right-side row onto each left row via ``last(..., ignorenulls=True)``.
Cost: ONE shuffle on the key + a per-partition sort — no join explosion, no
range cross-product, and skew behaves like any window (hot keys can be
pre-split by time range if needed).

The alternative (``applyInPandas`` + ``pd.merge_asof`` per key group) is
implemented as ``asof_join_pandas`` for very wide payloads where the window
payload struct would be expensive; the union-window form is the default.
Semantics: for each left row, the latest right row with ``right.ts <=
left.ts`` (ties: right row sorts first, so an equal-timestamp right row IS
matched) — matching DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before it.

    ``right_cols`` are the right-side payload columns to carry (renamed with
    ``suffix``). Right-side ``ts`` is carried as ``ts + suffix``.
    """
    lcols = left.columns
    l = left.select(*lcols).withColumn("__side", F.lit(1))
    r = right.select(
        *on,
        F.col(ts),
        *[F.col(c) for c in right_cols if c not in on and c != ts],
    ).where(F.col(ts).isNotNull()).withColumn("__side", F.lit(0))
    # null-ts right rows are dropped on BOTH variants: "latest at-or-before"
    # is undefined for them, and in the window form their payload would
    # otherwise propagate while their timestamp is ignored
    # align schemas: left payload nulls on right rows and vice versa
    carry = [c for c in right_cols if c not in on and c != ts]
    for c in carry:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(r.schema[c].dataType))
    # copy the right payload into __r_* FIRST, then null out left-named
    # columns: the other order overwrote a right column whose name also
    # exists in the left payload (the exact case the _right suffix serves),
    # silently nulling every match
    r2 = r
    for c in carry:
        r2 = r2.withColumn(f"__r_{c}", F.col(c))
    for c in lcols:
        if c not in on and c != ts:
            r2 = r2.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    r2 = r2.select(*lcols, "__side", *[f"__r_{c}" for c in carry])
    l = l.select(*lcols, "__side", *[f"__r_{c}" for c in carry])
    u = l.unionByName(r2)

    # right rows (side=0) sort before left rows (side=1) at equal ts ⇒
    # "at-or-before" semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        f"{ts}{suffix}",
        F.last(F.when(F.col("__side") == 0, F.col(ts)), ignorenulls=True).over(w),
    )
    for c in carry:
        filled = filled.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("__side") == 0, F.col(f"__r_{c}")), ignorenulls=True).over(w),
        )
    return filled.where(F.col("__side") == 1).select(
        *lcols, f"{ts}{suffix}", *[f"{c}{suffix}" for c in carry]
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Grouped-map variant: pd.merge_asof per key group (cogroup).

    Use when the window-payload form is too wide; requires each key group to
    fit in one task's memory (salt/split hot keys first)."""
    import pandas as pd

    carry = [c for c in right_cols if c not in on and c != ts]
    from pyspark.sql.types import StructField, StructType

    # COPY the schema: StructType.add mutates in place, and left.schema is
    # the DataFrame's cached object — mutating it plants phantom columns on
    # the caller's frame (same trap documented at sources/wal.chunked_schema)
    out_schema = StructType(list(left.schema.fields))
    for c in [ts] + carry:
        f = right.schema[c]
        out_schema = out_schema.add(StructField(f"{c}{suffix}", f.dataType))

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # null timestamps: merge_asof raises on null keys. Match the window
        # variant — null-ts LEFT rows keep their row with null match fields;
        # null-ts RIGHT rows are dropped (at-or-before is undefined).
        lnull = l[l[ts].isna()].copy()
        l = l[l[ts].notna()].sort_values(ts)
        r = r[r[ts].notna()].sort_values(ts)[[*on, ts, *carry]].rename(
            columns={c: f"{c}{suffix}" for c in [ts] + carry}
        )
        if r.empty:
            out = pd.concat([l, lnull]) if len(lnull) else l
            for c in [ts] + carry:
                out[f"{c}{suffix}"] = None
            return out
        out = pd.merge_asof(l, r.drop(columns=on), left_on=ts, right_on=f"{ts}{suffix}")
        if len(lnull):
            for c in [ts] + carry:
                lnull[f"{c}{suffix}"] = None
            out = pd.concat([out, lnull])
        return out

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )
