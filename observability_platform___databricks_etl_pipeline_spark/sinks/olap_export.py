"""OLAP bulk export — the reference's ClickHouse sync (S12) re-expressed.

Reference: ``README.md:332-348`` — notebook 06 pulls the Gold table through
``toLocalIterator`` into pandas chunks and ``client.insert_dataframe``s them
into ClickHouse, 100k rows at a time. DuckDB stands in for the OLAP store
here (same shape: a columnar analytics engine bulk-loaded from Spark).

Two paths, because the reference's driver funnel is exactly what dies at
100 TB:

- ``export_parquet_handoff`` — the scale path. Executors write Parquet in
  parallel; the OLAP engine bulk-ingests the files natively (every serious
  OLAP store — ClickHouse, DuckDB, BigQuery — has a parquet bulk loader).
  The driver never touches a row.
- ``export_stream`` — the reference's literal pattern (batched driver-side
  iterator insert), kept for small dimension tables and parity, with the
  batching done on Arrow record batches instead of per-row Python.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def export_parquet_handoff(
    df: DataFrame,
    duckdb_path: str,
    table: str,
    mode: str = "replace",
) -> int:
    """Distributed export: Spark writes Parquet (parallel, no driver funnel),
    DuckDB bulk-ingests the directory. Returns rows exported.

    ``mode``: 'replace' (CREATE OR REPLACE) or 'append' (INSERT INTO)."""
    import duckdb

    stage = tempfile.mkdtemp(prefix="olap-export-")
    try:
        out_dir = os.path.join(stage, "data")
        df.write.mode("overwrite").parquet(out_dir)
        con = duckdb.connect(duckdb_path)
        try:
            glob = os.path.join(out_dir, "*.parquet")
            t = _quote_ident(table)
            if mode == "replace":
                con.execute(
                    f"CREATE OR REPLACE TABLE {t} AS SELECT * FROM read_parquet('{glob}')"
                )
            elif mode == "append":
                con.execute(f"INSERT INTO {t} SELECT * FROM read_parquet('{glob}')")
            else:
                raise ValueError(f"unknown mode {mode!r}")
            n = con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]
            return int(n)
        finally:
            con.close()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def export_stream(
    df: DataFrame,
    duckdb_path: str,
    table: str,
    batch_rows: int = 100_000,
) -> int:
    """The reference's driver-side batched insert (``README.md:332-348``),
    Arrow-batched: pull the result through the driver ``batch_rows`` at a
    time and insert each chunk. Use only for small tables — this serializes
    through one process by construction (which is WHY the scale path above
    exists). Returns rows exported."""
    import duckdb
    import pyarrow as pa

    con = duckdb.connect(duckdb_path)
    total = 0
    t = _quote_ident(table)
    created = False
    try:
        schema = None
        buf: list = []

        def _flush(rows: list) -> None:
            nonlocal created, total
            if not rows:
                return
            tbl = pa.Table.from_pylist([r.asDict(recursive=True) for r in rows], schema=schema)
            con.register("__export_batch", tbl)
            if not created:
                con.execute(f"CREATE OR REPLACE TABLE {t} AS SELECT * FROM __export_batch")
                created = True
            else:
                con.execute(f"INSERT INTO {t} SELECT * FROM __export_batch")
            con.unregister("__export_batch")
            total += len(rows)

        schema = pa.schema([(f.name, _arrow_type(f.dataType)) for f in df.schema.fields])
        for row in df.toLocalIterator():
            buf.append(row)
            if len(buf) >= batch_rows:
                _flush(buf)
                buf = []
        _flush(buf)
        if not created:  # empty result: still create the (empty) table
            con.register("__export_batch", pa.Table.from_pylist([], schema=schema))
            con.execute(f"CREATE OR REPLACE TABLE {t} AS SELECT * FROM __export_batch")
            con.unregister("__export_batch")
        return total
    finally:
        con.close()


def _arrow_type(dt):
    """Minimal Spark→Arrow type map for the export surface (extend as the
    exported schemas grow)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us")
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    raise TypeError(f"unsupported export type: {dt}")
