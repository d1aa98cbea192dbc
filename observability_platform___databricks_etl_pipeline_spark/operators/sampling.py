"""Deterministic stratified sampling — training-data curation primitive.

Language/domain rebalancing is the standard last step of an LLM data
pipeline: downsample over-represented strata, keep rare ones. Spark's
``sampleBy`` uses an RNG seeded per partition, so results change with
partitioning/task retries — unacceptable for reproducible corpus builds and
for oracle verification. This sampler instead draws from a content hash:

    keep  ⇔  md5long(stratum ':' id) mod 1e6  <  rate(stratum) · 1e6

so membership is a pure function of the row (stable across cluster sizes,
retries, and engines — DuckDB reproduces the draw bit-for-bit via
``MD5LONG_SQL``). Map-only, no shuffle, whole-stage codegen; at 100 TB it
is a narrow filter that parquet scans stream through.

Reference anchor: the source pipeline's synthetic sample generator draws
per-service event mixes (``00_generate_sample_data.py:57``); upgraded here
to keyed per-stratum rates with engine-independent determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.dedup import MD5LONG_SQL, md5long

_MOD = 1_000_000
# NULL strata/ids coalesce to an explicit sentinel IDENTICALLY on both
# engines: concat_ws silently DROPS null args while DuckDB's concat treats
# NULL as '' — without the sentinel the two engines would draw differently
# on null keys (round-2 ADVICE).
_NULL_SENTINEL = "~~null~~"


def _draw(strata_col: Column, id_col: Column) -> Column:
    s = F.coalesce(strata_col.cast("string"), F.lit(_NULL_SENTINEL))
    i = F.coalesce(id_col.cast("string"), F.lit(_NULL_SENTINEL))
    return F.pmod(md5long(F.concat_ws(":", s, i)), F.lit(_MOD))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    id_col: str,
) -> DataFrame:
    """Keep each row iff its deterministic draw falls under its stratum's
    rate. ``rates`` maps stratum value → keep probability; unlisted strata
    use ``default_rate``."""
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.where(_draw(F.col(strata_col), F.col(id_col)) < rate * _MOD)


def stratified_sample_sql(
    strata_col: str, rates: dict[str, float], default_rate: float, id_col: str
) -> str:
    """The identical keep-predicate as ANSI SQL (DuckDB oracle mirror).
    Stratum literals are single-quote-escaped so a quote inside a stratum
    value can't break (or inject into) the oracle SQL."""
    case = " ".join(
        f"WHEN {strata_col} = '{k.replace(chr(39), chr(39) * 2)}' THEN {v}"
        for k, v in sorted(rates.items())
    )
    # empty rates: a CASE with no WHEN arms is a parse error — emit the bare
    # default rate, exactly what the Spark path's untouched lit() computes
    rate_expr = f"(CASE {case} ELSE {default_rate} END)" if case else f"({default_rate})"
    key = (
        f"concat(coalesce(CAST({strata_col} AS VARCHAR), '{_NULL_SENTINEL}'), ':', "
        f"coalesce(CAST({id_col} AS VARCHAR), '{_NULL_SENTINEL}'))"
    )
    draw = MD5LONG_SQL.format(x=key)
    return f"(({draw}) % {_MOD} + {_MOD}) % {_MOD} < {rate_expr} * {_MOD}"
