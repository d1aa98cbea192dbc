"""Range (interval) join — Spark lacks a native one (same gap family as the
as-of join; a plain ``ON p BETWEEN lo AND hi`` theta-join plans as
BroadcastNestedLoopJoin, O(|points| x |intervals|), which is a non-starter at
scale).

Scale shape: BINNING. Every interval explodes into the fixed-width bins it
overlaps, every point maps to its single containing bin, and the join becomes
an EQUI-join on (keys..., bin) + a residual range predicate. Cost is
O(|points| + |intervals| x avg_bins_per_interval + |matches|) — the classic
interval-join strategy (DuckDB's ASOF/range optimizer and Flink's interval
join use the same idea). Each (point, interval) pair meets EXACTLY once —
a point has one bin and an interval lists each bin once — so no dedup pass
is needed after the join.

``bin_width`` tuning: bins comparable to the TYPICAL interval length keep
the explode factor ~2 while leaving few false candidates for the residual
filter; much smaller bins amplify the explode, much larger ones amplify the
filtered-out candidates. Skewed hot keys behave like any equi-join and can
be salted on (keys..., bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# numeric dtypes whose cast('long') is a monotone map (truncation toward
# zero is monotone, which is all the binning needs — the residual predicate
# re-checks on the original typed columns)
_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def _to_long(c: Column, typ: str) -> Column:
    """Monotone map of a point/bound column onto the long bin axis.
    Timestamps → epoch seconds, dates → days since epoch, numerics → long
    truncation. Anything else (string, boolean, ...) raises upfront — a
    silent cast('long') would surface later as an opaque AnalysisException
    from the planner under ANSI mode."""
    if typ.startswith("timestamp"):
        return F.unix_timestamp(c)
    if typ == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("long")
    if typ.startswith(_NUMERIC):
        return c.cast("long")
    raise ValueError(
        f"interval_join: unsupported point/bound type {typ!r} — expected "
        f"timestamp, date, or a numeric type"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    bin_width: int = 3600,
) -> DataFrame:
    """Inner join: every (point row, interval row) pair — optionally key-equal
    on ``on`` — with ``lo <= point <= hi`` (inclusive both ends).

    Returns all columns of ``points`` plus all non-key columns of
    ``intervals``; name collisions on non-key columns get an ``_iv`` suffix.
    Null points / null bounds never match (SQL BETWEEN semantics)."""
    on = on or []
    p_typ = dict(points.dtypes)[point_col]
    lo_typ = dict(intervals.dtypes)[lo_col]
    hi_typ = dict(intervals.dtypes)[hi_col]

    overlap = [c for c in intervals.columns if c in points.columns and c not in on]
    iv = intervals
    for c in overlap:
        iv = iv.withColumnRenamed(c, f"{c}_iv")
    lo_out = f"{lo_col}_iv" if lo_col in overlap else lo_col
    hi_out = f"{hi_col}_iv" if hi_col in overlap else hi_col

    lo_l = _to_long(F.col(lo_out), lo_typ)
    hi_l = _to_long(F.col(hi_out), hi_typ)
    p_l = _to_long(F.col(point_col), p_typ)

    # intervals: one row per overlapped bin. sequence() is JVM-native; an
    # inverted/empty/null interval yields no bins (and could never match).
    iv_binned = iv.where(
        F.col(lo_out).isNotNull() & F.col(hi_out).isNotNull() & (lo_l <= hi_l)
    ).withColumn(
        "__bin",
        F.explode(F.sequence(F.floor(lo_l / bin_width), F.floor(hi_l / bin_width))),
    )
    p_binned = points.where(F.col(point_col).isNotNull()).withColumn(
        "__bin", F.floor(p_l / bin_width)
    )
    # residual predicate on the ORIGINAL typed columns (exact — e.g. full
    # sub-second timestamp precision); the epoch-second binning above is a
    # truncation, which is monotone, so lo <= p <= hi always implies the
    # point's bin lies inside the interval's bin range — binning is a
    # superset filter, never a correctness gate
    joined = p_binned.join(iv_binned, [*on, "__bin"]).where(
        (F.col(point_col) >= F.col(lo_out)) & (F.col(point_col) <= F.col(hi_out))
    )
    return joined.drop("__bin")
