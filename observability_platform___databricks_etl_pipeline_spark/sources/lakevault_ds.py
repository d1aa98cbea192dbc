"""LakeVault as a first-class Spark data source (PySpark 4 Python
DataSource API): ``spark.read.format("lakevault")`` and
``spark.readStream.format("lakevault")``.

This is the interchange surface Delta/Iceberg give their tables — any Spark
app (not just this engine's Python API) can scan a LakeVault table, time
travel, and *tail its change feed* as a Structured Streaming source, with
manifest-metadata file pruning driven by Catalyst filter pushdown:

Batch snapshot scan (reference analog: the Delta reads in
``02_enrich_events.py:69-74`` — but snapshot-pinned and manifest-pruned)::

    spark.dataSource.register(LakeVaultDataSource)
    df = (spark.read.format("lakevault")
          .option("snapshotId", 7)          # optional time travel
          .option("tag", "audited")         # or a named tag
          .option("branch", "audit")        # or a branch head
          .load("/data/mytable")
          .where(F.col("repo") == "corpus/gh"))   # pushed → file pruning

Batch change feed (the Delta CDF ``table_changes`` analog)::

    (spark.read.format("lakevault")
     .option("feed", "changes")
     .option("fromSnapshotId", 3).option("toSnapshotId", 7)
     .load("/data/mytable"))

Streaming change feed (``readStream`` over the snapshot diff — the
incremental-consumption primitive downstream pipelines tail instead of
re-reading whole partitions)::

    (spark.readStream.format("lakevault")
     .option("feed", "changes")
     .option("startingSnapshotId", 0)       # default: stream-start head
     .load("/data/mytable"))

Write side (delta UPSERTS by table key; exactly-once per microbatch —
see ``_LakeVaultWriterCore``)::

    df.write.format("lakevault").mode("append").save("/data/mytable")
    (df.writeStream.format("lakevault")
     .option("checkpointLocation", ckpt)    # also seeds the exactly-once id
     .start("/data/mytable"))

Design notes (100 TB):

- **Planning is manifest metadata only.** ``partitions()`` runs on the
  driver against the JSON snapshot/manifest layer (``LakeVault(None, root)``
  — no SparkSession needed) and reuses the exact pruning implementation
  ``scan()`` uses (``LakeVault.pruned_files``): bucket stats, key-range and
  per-column min/max skipping, and ranged bloom probes, all fed by
  ``pushFilters``. Every pushed filter is returned as unsupported so Spark
  re-applies it row-level — manifest pruning is a superset guarantee, so
  claiming the filter would be wrong.
- **Reads are executor-side pyarrow.** One input partition per data file on
  copy-on-write buckets (max parallelism); one partition per BUCKET where
  merge-on-read deltas are live, because the LWW fold is key-scoped and
  keys are bucket-disjoint — the fold is partition-local by construction.
  The fold reproduces ``scan()``'s canonical order exactly: ascending
  ``(last_seq, commit-ordinal[, content_sha256])`` with nulls first,
  last row per key wins (= Spark ``max_by`` struct order).
- **Schema evolution**: each file is aligned to the target schema BY COLUMN
  ID (rename promotion, typed-null backfill, lossless int→long /
  float→double widening) — the same rule as ``scan()``; parity is pinned by
  tests/test_lakevault_ds.py against tables that renamed, added, promoted
  and MOR-merged.
- **Streaming offsets are snapshot ids** (``{"snapshot_id": N}``). Each
  microbatch is the per-key diff between two snapshots, computed per
  affected bucket (buckets whose live FILE SET changed — pure metadata),
  so microbatch cost is O(changed buckets), never O(table). A stream pins
  its output schema at start; snapshots are aligned to it by column id, so
  in-stream schema evolution keeps the stream running (columns added after
  stream start become visible on restart — the Delta CDF contract).
  Offsets older than the retention window fail loudly: ``expire_snapshots``
  deletes the snapshot JSON and ``partitions()`` raises FileNotFoundError,
  mirroring ``CDCEngine.tail``'s retention guard.
- **Limits, honestly**: the Python DataSource API has no column-pruning
  hook, so batch DS reads materialize all columns — for narrow projections
  over wide tables, ``LakeVault.scan()`` (native parquet reader, pruned
  ``ReadSchema``) remains the hot path. The change-feed diff loads both
  sides of each affected bucket into one task; ``scan_changes`` (the
  in-engine DataFrame variant) shards finer and is the bulk-backfill path.

Reference anchors: the reference consumes Delta tables only via full-table
reads inside Databricks (``02_enrich_events.py:69-74``,
``04_hive_sql_analysis.py:236-273``); this module is the from-scratch
equivalent of the format integration those notebooks get from the platform.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import (
    SPARK_TYPE,
    LakeVault,
    Snapshot,
)

_ARROW_TYPE: dict[str, pa.DataType] = {
    "string": pa.string(),
    "long": pa.int64(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "timestamp": pa.timestamp("us"),
    "int": pa.int32(),
    "float": pa.float32(),
}

_CHANGE_TYPE_COL = "_change_type"
_BEFORE_COL = "_before"


# ---------------------------------------------------------------------------
# driver-side planning helpers (metadata only, no SparkSession)
# ---------------------------------------------------------------------------


def _open_vault(options: dict) -> LakeVault:
    path = options.get("path")
    if not path:
        raise ValueError("lakevault: .load(<table root>) path is required")
    v = LakeVault(None, path, branch=options.get("branch"))
    if not os.path.exists(os.path.join(v._ns_dir, "version.json")):
        raise FileNotFoundError(f"no LakeVault table (or branch) at {path}")
    return v


def _resolve_snapshot_id(v: LakeVault, options: dict, key: str) -> int | None:
    """Resolve a snapshot pin: explicit id beats tag; None = current."""
    sid = options.get(key)
    if sid is not None:
        return int(sid)
    tag = options.get("tag")
    if tag is not None:
        return v.resolve_tag(tag)
    return None


def _plain_cols(snap_schema) -> list[dict[str, Any]]:
    return [dict(c) for c in snap_schema.columns]


def _snapshot_ddl(cols: list[dict[str, Any]]) -> str:
    return ", ".join(f"`{c['name']}` {SPARK_TYPE.get(c['type'], c['type'])}" for c in cols)


def _changes_ddl(cols: list[dict[str, Any]], key_cols: list[str]) -> str:
    """keys, _change_type, post/pre image of non-key columns, _before struct
    of the non-key columns — byte-compatible with ``LakeVault.scan_changes``."""
    by_name = {c["name"]: c for c in cols}
    keys = [f"`{k}` {SPARK_TYPE.get(by_name[k]['type'], by_name[k]['type'])}" for k in key_cols]
    non_key = [c for c in cols if c["name"] not in key_cols]
    img = [f"`{c['name']}` {SPARK_TYPE.get(c['type'], c['type'])}" for c in non_key]
    struct_fields = ", ".join(
        f"`{c['name']}`: {SPARK_TYPE.get(c['type'], c['type'])}" for c in non_key
    )
    return ", ".join(
        keys + [f"`{_CHANGE_TYPE_COL}` string"] + img + [f"`{_BEFORE_COL}` struct<{struct_fields}>"]
    )


def _file_entry(f: dict[str, Any]) -> dict[str, Any]:
    """Slim, picklable projection of a manifest file entry for a partition."""
    return {
        "path": f["path"],
        "schema_id": f["schema_id"],
        "ord": f.get("ord", 0),
        "delta": bool(f.get("delta")),
        "eq_delete": bool(f.get("eq_delete")),
        "bucket": f.get("bucket"),
    }


def _schemas_payload(snap: Snapshot, files: list[dict[str, Any]]) -> dict[str, list[dict]]:
    """Only the schema versions the partition's files actually reference."""
    needed = {f["schema_id"] for f in files}
    return {str(sid): _plain_cols(snap.schemas[sid]) for sid in needed}


def _group_read_partitions(
    root: str,
    snap: Snapshot,
    files: list[dict[str, Any]],
    cur_cols: list[dict[str, Any]],
    key_cols: list[str],
) -> list["_ScanPartition"]:
    """COW files → one partition per file; buckets with live MOR deltas →
    one partition per bucket (the LWW fold is key-scoped and keys are
    bucket-disjoint, so folding per bucket equals scan()'s global fold).
    Legacy bucket-less files alongside deltas cannot be fold-scoped: they
    collapse into a single partition (pre-bucket tables only)."""
    entries = [_file_entry(f) for f in files]
    if not entries:
        # Spark schedules at least one partition; an empty file group reads
        # as zero record batches of the declared schema
        return [
            _ScanPartition(
                root=root,
                files=[],
                schemas={},
                cur_cols=cur_cols,
                key_cols=key_cols,
            )
        ]
    merge_buckets = {f["bucket"] for f in entries if f["delta"] or f["eq_delete"]}
    parts: list[_ScanPartition] = []
    if None in merge_buckets or (merge_buckets and any(f["bucket"] is None for f in entries)):
        grp = entries
        return [
            _ScanPartition(
                root=root,
                files=grp,
                schemas=_schemas_payload(snap, grp),
                cur_cols=cur_cols,
                key_cols=key_cols,
            )
        ]
    by_bucket: dict[Any, list[dict]] = {}
    for f in entries:
        if f["bucket"] in merge_buckets:
            by_bucket.setdefault(f["bucket"], []).append(f)
        else:
            parts.append(
                _ScanPartition(
                    root=root,
                    files=[f],
                    schemas=_schemas_payload(snap, [f]),
                    cur_cols=cur_cols,
                    key_cols=key_cols,
                )
            )
    for _, grp in sorted(by_bucket.items()):
        parts.append(
            _ScanPartition(
                root=root,
                files=grp,
                schemas=_schemas_payload(snap, grp),
                cur_cols=cur_cols,
                key_cols=key_cols,
            )
        )
    return parts


def _affected_change_buckets(
    snap_a: Snapshot, snap_b: Snapshot
) -> tuple[list[Any], bool]:
    """Buckets whose live FILE SET differs between two snapshots, plus a
    full-diff flag (legacy bucket-less files or a rebucket in between make
    per-bucket scoping unsound) — the same rule as ``scan_changes``."""

    def per_bucket(snap: Snapshot) -> dict[Any, set]:
        out: dict[Any, set] = {}
        for f in snap.files:
            out.setdefault(f["bucket"], set()).add(f["path"])
        return out

    pb_a, pb_b = per_bucket(snap_a), per_bucket(snap_b)
    affected = sorted(
        b
        for b in set(pb_a) | set(pb_b)
        if b is not None and pb_a.get(b, set()) != pb_b.get(b, set())
    )
    full = (
        pb_a.get(None, set()) != pb_b.get(None, set())
        or snap_a.n_buckets != snap_b.n_buckets
    )
    return affected, full


# ---------------------------------------------------------------------------
# executor-side readers (pyarrow; no SparkSession, no pyspark.sql.functions)
# ---------------------------------------------------------------------------


def _normalize_arrow(arr: pa.ChunkedArray | pa.Array, target: pa.DataType) -> pa.Array:
    """Cast a parquet-read column to the target logical type. Handles the
    same widenings scan() applies via Spark casts (int32→int64,
    float32→float64) plus parquet physical-timestamp variance (INT96 → ns,
    TIMESTAMP_MICROS±UTC flag): Spark writes UTC-adjusted values and the
    engine runs a UTC session, so tz-aware→naive is a reinterpretation,
    never arithmetic."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_timestamp(t) and t.tz is not None:
        arr = arr.cast(pa.timestamp(t.unit))
        t = arr.type
    if not t.equals(target):
        arr = arr.cast(target)
    return arr


def _read_aligned(
    root: str,
    files: list[dict[str, Any]],
    schemas: dict[str, list[dict]],
    cur_cols: list[dict[str, Any]],
    need_merge: bool,
    key_cols: list[str],
    del_files: list[dict[str, Any]] | None = None,
) -> pa.Table:
    """Read data files and align them to ``cur_cols`` by COLUMN ID (the
    scan() rename/backfill/widen rule), apply equality-delete files (rows
    of a deleted key with a smaller commit ordinal die — BEFORE the fold,
    so re-inserts survive, mirroring ``LakeVault._apply_eq_deletes``),
    then LWW-fold if deltas are live."""
    del_files = del_files or []
    need_ord = need_merge or bool(del_files)
    target_fields = [
        pa.field(c["name"], _ARROW_TYPE[c["type"]]) for c in cur_cols
    ]
    target_schema = pa.schema(target_fields)
    tables: list[pa.Table] = []
    for f in files:
        old_by_id = {c["id"]: c for c in schemas[str(f["schema_id"])]}
        phys = [old_by_id[c["id"]]["name"] for c in cur_cols if c["id"] in old_by_id]
        t = pq.read_table(os.path.join(root, f["path"]), columns=phys)
        n = t.num_rows
        arrays = []
        for c in cur_cols:
            at = _ARROW_TYPE[c["type"]]
            oc = old_by_id.get(c["id"])
            if oc is None:
                arrays.append(pa.nulls(n, at))
            else:
                arrays.append(_normalize_arrow(t.column(oc["name"]), at))
        tt = pa.table(arrays, schema=target_schema)
        if need_ord:
            tt = tt.append_column("__ord", pa.array([f["ord"]] * n, pa.int64()))
        tables.append(tt)
    if not tables:
        return pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in target_fields], schema=target_schema
        )
    out = pa.concat_tables(tables)
    if del_files:
        out = _apply_eq_deletes_arrow(out, root, del_files, schemas, cur_cols, key_cols)
    if need_merge:
        tie = ["last_seq", "__ord"]
        if "content_sha256" in out.column_names:
            tie.append("content_sha256")
        out = _lww_fold(out, key_cols, tie)
    if need_ord:
        out = out.drop_columns(["__ord"])
    return out


def _apply_eq_deletes_arrow(
    out: pa.Table,
    root: str,
    del_files: list[dict[str, Any]],
    schemas: dict[str, list[dict]],
    cur_cols: list[dict[str, Any]],
    key_cols: list[str],
) -> pa.Table:
    """Arrow-side equality-delete application: a row survives iff no delete
    of its key carries a larger ordinal. Only the KEY columns + ``__ord``
    round-trip through pandas for the merge; the data table stays arrow."""
    key_col_defs = [c for c in cur_cols if c["name"] in key_cols]
    dparts = []
    for f in del_files:
        old_by_id = {c["id"]: c for c in schemas[str(f["schema_id"])]}
        phys = [old_by_id[c["id"]]["name"] for c in key_col_defs]
        t = pq.read_table(os.path.join(root, f["path"]), columns=phys)
        cols = {
            c["name"]: _normalize_arrow(
                t.column(old_by_id[c["id"]]["name"]), _ARROW_TYPE[c["type"]]
            )
            for c in key_col_defs
        }
        d = pa.table(cols).to_pandas()
        d["__del_ord"] = f["ord"]
        dparts.append(d)
    dels = pd.concat(dparts, ignore_index=True)
    # Spark join semantics: a null-keyed delete row matches NOTHING (nulls
    # never compare equal in joins), while pandas merge pairs NaN keys —
    # drop them explicitly before building the max-ordinal probe (r5 ADVICE;
    # groupby's dropna already did this implicitly, made load-bearing here)
    dels = dels[dels[key_cols].notna().all(axis=1)]
    if dels.empty:
        return out
    dmax = dels.groupby(key_cols, as_index=False)["__del_ord"].max()
    probe = pd.DataFrame({k: out.column(k).to_pandas() for k in key_cols})
    probe["__ord"] = out.column("__ord").to_pandas()
    m = probe.merge(dmax, on=key_cols, how="left")
    keep = m["__del_ord"].isna() | (m["__ord"] >= m["__del_ord"])
    return out.filter(pa.array(keep.to_numpy(dtype=bool)))


def _lww_fold(t: pa.Table, key_cols: list[str], tie_cols: list[str]) -> pa.Table:
    """Arrow-side replica of ``operators.dedup.lww_dedup``'s ``max_by``:
    ascending sort on (keys, tie) with NULLS FIRST (Spark struct order puts
    nulls smallest ascending), then keep the LAST row of each key run."""
    idx = pc.sort_indices(
        t,
        sort_keys=[(c, "ascending") for c in key_cols + tie_cols],
        null_placement="at_start",
    )
    t = t.take(idx)
    n = t.num_rows
    if n == 0:
        return t
    # row i ends its key run iff ANY key column differs from row i+1 —
    # equivalently, it is dropped only when ALL key columns match (same key)
    same = np.ones(max(n - 1, 0), dtype=bool)
    for k in key_cols:
        col = t.column(k).to_numpy(zero_copy_only=False)
        eq = col[:-1] == col[1:]
        if col.dtype.kind == "f":
            # NaN keys: Spark's groupBy folds NaN==NaN into one group; plain
            # numpy == says NaN != NaN and would keep duplicate rows for a
            # NaN-keyed float key (r5 ADVICE)
            eq |= (col != col)[:-1] & (col != col)[1:]
        same &= eq
    keep = np.ones(n, dtype=bool)
    keep[:-1] = ~same
    return t.filter(pa.array(keep))


def _py(v: Any) -> Any:
    """Arrow/pandas scalar → plain Python for Spark's tuple-row converter.
    NaN doubles stay NaN (a value, not a null — Spark agrees)."""
    if v is None or v is pd.NA:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.generic):
        return v.item()
    return v


def _diff_rows(
    before: pa.Table,
    after: pa.Table,
    key_cols: list[str],
    non_key: list[str],
) -> Iterator[tuple]:
    """Per-key full-outer diff of two aligned states → scan_changes rows:
    (keys..., _change_type, post-or-pre image..., _before struct|None)."""
    bdf = before.to_pandas(types_mapper=pd.ArrowDtype)
    adf = after.to_pandas(types_mapper=pd.ArrowDtype)
    # Spark's scan_changes full-outer join never matches null keys, while
    # pandas merge pairs them — route null-keyed rows around the merge so
    # they surface as a bare delete (before side) / insert (after side),
    # exactly like the native path (r5 ADVICE)
    b_nullkey = ~bdf[key_cols].notna().all(axis=1) if len(bdf) else pd.Series(dtype=bool)
    a_nullkey = ~adf[key_cols].notna().all(axis=1) if len(adf) else pd.Series(dtype=bool)
    null_b, bdf = (bdf[b_nullkey], bdf[~b_nullkey]) if len(bdf) else (bdf, bdf)
    null_a, adf = (adf[a_nullkey], adf[~a_nullkey]) if len(adf) else (adf, adf)
    m = bdf.merge(adf, on=key_cols, how="outer", suffixes=("__a", "__b"), indicator=True)
    in_a = (m["_merge"] == "left_only") | (m["_merge"] == "both")
    in_b = (m["_merge"] == "right_only") | (m["_merge"] == "both")
    changed = pd.Series(False, index=m.index)
    for c in non_key:
        a, b = m[f"{c}__a"], m[f"{c}__b"]
        eq = (a == b)
        # parity with scan_changes' eqNullSafe: null==null AND NaN==NaN are
        # both "unchanged" in Spark (NaN is a value that equals itself);
        # plain pandas == says NaN != NaN, which would emit a spurious
        # 'update' for every NaN-carrying row in a touched bucket
        a_nan = (a != a).fillna(False).astype(bool)
        b_nan = (b != b).fillna(False).astype(bool)
        eq = eq.fillna(False) | (a.isna() & b.isna()) | (a_nan & b_nan)
        changed |= ~eq.astype(bool)
    kind = np.where(
        ~in_a.to_numpy(dtype=bool),
        "insert",
        np.where(
            ~in_b.to_numpy(dtype=bool),
            "delete",
            np.where(changed.to_numpy(dtype=bool), "update", ""),
        ),
    )
    m = m[kind != ""]
    kinds = list(kind[kind != ""])
    keys = [m[c].tolist() for c in key_cols]
    a_vals = [m[f"{c}__a"].tolist() for c in non_key]
    b_vals = [m[f"{c}__b"].tolist() for c in non_key]
    for i, k in enumerate(kinds):
        img = a_vals if k == "delete" else b_vals
        image = tuple(_py(col[i]) for col in img)
        before_struct = None if k == "insert" else tuple(_py(col[i]) for col in a_vals)
        yield tuple(_py(col[i]) for col in keys) + (k,) + image + (before_struct,)
    # null-keyed rows bypassed the merge: before-side rows are deletes with
    # themselves as the pre-image, after-side rows are inserts
    for frame, kind in ((null_b, "delete"), (null_a, "insert")):
        for _, r in frame.iterrows():
            image = tuple(_py(r[c]) for c in non_key)
            before_struct = None if kind == "insert" else image
            yield tuple(_py(r[c]) for c in key_cols) + (kind,) + image + (before_struct,)


# ---------------------------------------------------------------------------
# partitions
# ---------------------------------------------------------------------------


class _ScanPartition(InputPartition):
    def __init__(self, root, files, schemas, cur_cols, key_cols):
        self.root = root
        self.files = files
        self.schemas = schemas
        self.cur_cols = cur_cols
        self.key_cols = key_cols


class _ChangesPartition(InputPartition):
    def __init__(self, root, before, after, schemas, cur_cols, key_cols):
        self.root = root
        self.before = before  # file entries at snapshot A (this bucket)
        self.after = after  # file entries at snapshot B (this bucket)
        self.schemas = schemas
        self.cur_cols = cur_cols
        self.key_cols = key_cols


def _state_from_entries(
    root: str,
    entries: list[dict[str, Any]],
    schemas: dict[str, list[dict]],
    cur_cols: list[dict[str, Any]],
    key_cols: list[str],
) -> pa.Table:
    """Split a file group into data vs equality-delete entries and build the
    aligned post-delete, post-fold state."""
    dels = [f for f in entries if f.get("eq_delete")]
    data = [f for f in entries if not f.get("eq_delete")]
    need_merge = any(f["delta"] for f in data)
    return _read_aligned(
        root, data, schemas, cur_cols, need_merge, key_cols, del_files=dels
    )


def _read_scan_partition(p: _ScanPartition) -> Iterator[pa.RecordBatch]:
    t = _state_from_entries(p.root, p.files, p.schemas, p.cur_cols, p.key_cols)
    yield from t.to_batches()


def _read_changes_partition(p: _ChangesPartition) -> Iterator[tuple]:
    before = _state_from_entries(p.root, p.before, p.schemas, p.cur_cols, p.key_cols)
    after = _state_from_entries(p.root, p.after, p.schemas, p.cur_cols, p.key_cols)
    non_key = [c["name"] for c in p.cur_cols if c["name"] not in p.key_cols]
    yield from _diff_rows(before, after, p.key_cols, non_key)


def _plan_changes_partitions(
    v: LakeVault, from_sid: int, to_sid: int, cur_cols: list[dict[str, Any]]
) -> list[_ChangesPartition]:
    snap_a, snap_b = v.snapshot(from_sid), v.snapshot(to_sid)
    affected, full = _affected_change_buckets(snap_a, snap_b)
    key_cols = list(v.key_cols)
    # every referenced schema version from BOTH snapshots, so executors can
    # align either side; ids are table-global so one dict serves both
    all_schemas = {
        str(sid): _plain_cols(ts)
        for sid, ts in {**snap_a.schemas, **snap_b.schemas}.items()
    }
    if full:
        grps = [(list(snap_a.files), list(snap_b.files))]
    else:
        if not affected:
            return []
        a_by, b_by = {}, {}
        for f in snap_a.files:
            a_by.setdefault(f["bucket"], []).append(f)
        for f in snap_b.files:
            b_by.setdefault(f["bucket"], []).append(f)
        grps = [(a_by.get(b, []), b_by.get(b, [])) for b in affected]
    return [
        _ChangesPartition(
            root=v.root,
            before=[_file_entry(f) for f in a_files],
            after=[_file_entry(f) for f in b_files],
            schemas=all_schemas,
            cur_cols=cur_cols,
            key_cols=key_cols,
        )
        for a_files, b_files in grps
    ]


# ---------------------------------------------------------------------------
# batch readers
# ---------------------------------------------------------------------------


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self._equals: dict[str, Any] = {}
        self._ranges: dict[str, list] = {}

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Harvest equality/range predicates for manifest pruning. ALL
        filters are yielded back as unsupported: pruning keeps a superset
        of matching files, so Spark must still apply every predicate."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr is not None and len(attr) == 1:
                col = attr[0]
                if isinstance(f, EqualTo):
                    self._equals[col] = f.value
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo, hi = self._ranges.get(col, [None, None])
                    self._ranges[col] = [f.value if lo is None else max(lo, f.value), hi]
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    lo, hi = self._ranges.get(col, [None, None])
                    self._ranges[col] = [lo, f.value if hi is None else min(hi, f.value)]
            yield f

    def partitions(self):
        v = _open_vault(self.options)
        sid = _resolve_snapshot_id(v, self.options, "snapshotid")
        snap = v.snapshot(sid)
        cur_cols = _plain_cols(snap.schema)
        known = {c["name"] for c in cur_cols}
        key0 = v.key_cols[0]
        ranges = {c: tuple(b) for c, b in self._ranges.items() if c in known}
        equals = {c: val for c, val in self._equals.items() if c in known}
        key_range = None
        if key0 in equals:
            key_range = (equals[key0], equals[key0])
        elif key0 in ranges:
            key_range = ranges[key0]
        # fully-keyed point probe: the driver computes the bucket itself
        # (plans/sparkhash.py is bit-exact with bucket_expr) — one bucket's
        # manifests survive before any stats are consulted
        buckets = None
        if all(k in equals and equals[k] is not None for k in v.key_cols) and not any(
            f.get("bucket") is None for f in snap.files  # legacy files: unscopable
        ):
            from observability_platform___databricks_etl_pipeline_spark.plans.sparkhash import bucket_of

            by_name = {c["name"]: c for c in cur_cols}
            buckets = [
                bucket_of(
                    [equals[k] for k in v.key_cols],
                    snap.n_buckets
                    if snap.n_buckets is not None
                    else v.table_meta["n_buckets"],
                    types=[by_name[k]["type"] for k in v.key_cols],
                )
            ]
        files = v.pruned_files(
            snap,
            buckets=buckets,
            key_range=key_range,
            column_ranges=ranges or None,
            column_equals=equals or None,
        )
        return _group_read_partitions(v.root, snap, files, cur_cols, list(v.key_cols))

    def read(self, partition):
        return _read_scan_partition(partition)


class _ChangesBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self):
        v = _open_vault(self.options)
        from_sid = self.options.get("fromsnapshotid")
        if from_sid is None:
            raise ValueError(
                "lakevault feed=changes batch read requires .option('fromSnapshotId', N)"
            )
        to_sid = _resolve_snapshot_id(v, self.options, "tosnapshotid")
        snap_b = v.snapshot(to_sid)
        parts = _plan_changes_partitions(
            v, int(from_sid), snap_b.snapshot_id, _plain_cols(snap_b.schema)
        )
        if not parts:  # no changed buckets: one empty partition (see above)
            parts = [
                _ChangesPartition(
                    root=v.root,
                    before=[],
                    after=[],
                    schemas={},
                    cur_cols=_plain_cols(snap_b.schema),
                    key_cols=list(v.key_cols),
                )
            ]
        return parts

    def read(self, partition):
        return _read_changes_partition(partition)


# ---------------------------------------------------------------------------
# streaming reader
# ---------------------------------------------------------------------------


class _ChangesStreamReader(DataSourceStreamReader):
    """Structured Streaming source over the snapshot diff. Offsets are
    snapshot ids; the first microbatch starts after ``startingSnapshotId``
    (default: the head at stream start, i.e. new changes only). The output
    schema — including the ``_before`` struct — is pinned at stream start;
    later snapshots are aligned to it by column id."""

    def __init__(self, options: dict, cur_cols: list[dict[str, Any]]):
        self.options = dict(options)
        self.cur_cols = cur_cols

    def _vault(self) -> LakeVault:
        return _open_vault(self.options)

    def initialOffset(self):  # noqa: N802
        start = self.options.get("startingsnapshotid")
        if start is None:
            start = self._vault().current_snapshot_id()
        return {"snapshot_id": int(start)}

    def latestOffset(self):  # noqa: N802
        return {"snapshot_id": self._vault().current_snapshot_id()}

    def partitions(self, start, end):
        a, b = int(start["snapshot_id"]), int(end["snapshot_id"])
        if a == b:
            return []
        return _plan_changes_partitions(self._vault(), a, b, self.cur_cols)

    def read(self, partition):
        return _read_changes_partition(partition)

    def commit(self, end):
        # Retention is the table's concern (expire_snapshots); a cursor that
        # falls behind retention fails loudly in partitions() — same
        # contract as CDCEngine.tail's guard.
        pass


# ---------------------------------------------------------------------------
# writers: df.write / df.writeStream .format("lakevault") — delta-append
# upserts with exactly-once microbatch commits
# ---------------------------------------------------------------------------


class _LakeVaultWriteMessage(WriterCommitMessage):
    def __init__(self, entries: list[dict[str, Any]]):
        self.entries = entries


# string col stats longer than this are not recorded — mirrors the footer
# harvester's soundness cap (lakevault._STAT_STR_MAX): a truncated max is
# not an upper bound, and files without stats are conservatively kept
_WRITE_STAT_STR_MAX = 64


class _LakeVaultWriterCore:
    """Shared executor/driver logic for the batch and streaming writers.

    Rows are committed as DELTA APPENDS (merge-on-read upserts): the scan's
    LWW fold resolves duplicate keys by ``(last_seq, commit ordinal)``, so
    the sink is an UPSERT by table key — the same semantics the CDC engine's
    write path produces, reachable from any Spark job via ``format()``.
    The table must therefore carry ``last_seq``. Bucketing: pre-compute
    ``__bucket`` JVM-side for the fast path::

        from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import LakeVault
        df.withColumn("__bucket", LakeVault(None, root).bucket_expr())

    (``bucket_expr`` needs no SparkSession — it reads table.json only).
    Without ``__bucket`` the writer falls back to hashing keys row-by-row
    in Python via plans/sparkhash.py — bit-identical, but the slow path;
    fine for modest streams, wrong for a 100 TB backfill.

    Exactly-once: each microbatch commits under batch id
    ``lvds-<streamId>-<batchId>``; ``streamId`` defaults to a hash of the
    sink's ``checkpointLocation`` so a restarted query replaying a batch
    is a commit-level no-op. File-level safety: executors write uniquely
    named files and the commit registers ONLY the paths listed in the task
    commit messages, so a retried task's orphan file is never picked up
    (it is swept once the staging dir goes dead — the same attempt-token
    GC path every engine write uses)."""

    def __init__(self, options: dict, input_schema):
        self.options = dict(options)
        v = _open_vault(self.options)
        snap = v.snapshot()
        names = snap.schema.names()
        if "last_seq" not in names:
            raise ValueError(
                "lakevault writer delta-appends upserts resolved by "
                "(last_seq, commit ordinal) — this table has no last_seq "
                "column; write through LakeVault.commit/merge instead"
            )
        in_names = [f.name for f in input_schema.fields]
        data_names = [n for n in in_names if n != "__bucket"]
        if sorted(data_names) != sorted(names):
            raise ValueError(
                f"lakevault writer: input columns {sorted(data_names)} != "
                f"table schema {sorted(names)} (plus optional __bucket)"
            )
        self.root = v.root
        self.key_cols = list(v.key_cols)
        self.schema_id = snap.schema.schema_id
        self.cur_cols = _plain_cols(snap.schema)
        by_name = {c["name"]: c for c in self.cur_cols}
        self.key_types = [by_name[k]["type"] for k in self.key_cols]
        self.n_buckets = (
            snap.n_buckets if snap.n_buckets is not None else v.table_meta["n_buckets"]
        )
        self.write_dir = v.new_write_dir("dswriter")

    # -- executor side ------------------------------------------------------

    # bound on the arrow bytes one write chunk accumulates before flushing —
    # a large backfill partition no longer materializes as ONE in-memory
    # table (r5 ADVICE: executor OOM risk); more chunks mean more small
    # files, which compact() folds afterwards (documented requirement for
    # large batch writes through this slow path).
    _WRITE_CHUNK_BYTES = 256 * 1024 * 1024

    def write_batches(self, iterator) -> _LakeVaultWriteMessage:
        entries: list[dict[str, Any]] = []
        pend: list[pa.RecordBatch] = []
        pend_bytes = 0
        for b in iterator:
            if not b.num_rows:
                continue
            pend.append(b)
            pend_bytes += b.nbytes
            if pend_bytes >= self._WRITE_CHUNK_BYTES:
                entries.extend(self._write_chunk(pa.Table.from_batches(pend)))
                pend, pend_bytes = [], 0
        if pend:
            entries.extend(self._write_chunk(pa.Table.from_batches(pend)))
        return _LakeVaultWriteMessage(entries)

    def _write_chunk(self, t: pa.Table) -> list[dict[str, Any]]:
        import uuid as _uuid

        if "__bucket" in t.column_names:
            buckets = t.column("__bucket").to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.drop_columns(["__bucket"])
        else:
            from observability_platform___databricks_etl_pipeline_spark.plans.sparkhash import bucket_of

            kcols = [t.column(k).to_pylist() for k in self.key_cols]
            buckets = np.fromiter(
                (
                    bucket_of(list(vals), self.n_buckets, types=self.key_types)
                    for vals in zip(*kcols)
                ),
                dtype=np.int64,
                count=t.num_rows,
            )
        # align to the table schema (name → current arrow type)
        arrays = []
        fields = []
        for c in self.cur_cols:
            at = _ARROW_TYPE[c["type"]]
            arrays.append(_normalize_arrow(t.column(c["name"]), at))
            fields.append(pa.field(c["name"], at))
        t = pa.table(arrays, schema=pa.schema(fields))
        # the staging dir lives for the WRITER's lifetime, but its attempt
        # token goes stale after the first commit — a long-idle stream can
        # have it swept by expire_snapshots' orphan GC (empty + past grace).
        # Recreate on demand: a freshly re-made dir has a recent mtime, so
        # the sweep's grace window protects it again while tasks write.
        os.makedirs(self.write_dir, exist_ok=True)
        key0 = self.key_cols[0]
        entries: list[dict[str, Any]] = []
        for b in np.unique(buckets):
            part = t.filter(pa.array(buckets == b))
            full = os.path.join(self.write_dir, f"b{int(b)}-{_uuid.uuid4().hex}.parquet")
            pq.write_table(part, full)
            # stats computed IN MEMORY at write time (Iceberg's rule: never
            # re-open what you just wrote); col_stats mirror the footer
            # harvester's soundness caps
            col_stats: dict[str, list] = {}
            for c in self.cur_cols:
                col = part.column(c["name"])
                if col.null_count == len(col):
                    continue
                mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
                if isinstance(mn, str) and (
                    len(mn) > _WRITE_STAT_STR_MAX or len(mx) > _WRITE_STAT_STR_MAX
                ):
                    continue
                if isinstance(mn, (str, int, float, bool)):
                    col_stats[c["name"]] = [mn, mx]
            k = part.column(key0)
            entry = {
                "path": os.path.relpath(full, self.root),
                "rows": part.num_rows,
                "bytes": os.path.getsize(full),
                "bucket": int(b),
                "schema_id": self.schema_id,
                "min_key": pc.min(k).as_py(),
                "max_key": pc.max(k).as_py(),
            }
            if col_stats:
                entry["col_stats"] = col_stats
            entries.append(entry)
        return entries

    # -- driver side ---------------------------------------------------------

    def commit_entries(self, messages, batch_id: str | None) -> None:
        entries = [e for m in messages if m is not None for e in m.entries]
        # belt for the GC race above: never register a path the sweep won
        # against — fail the batch loudly (the stream restarts and rewrites)
        # instead of committing a manifest that points at deleted files
        gone = [e["path"] for e in entries
                if not os.path.exists(os.path.join(self.root, e["path"]))]
        if gone:
            raise RuntimeError(
                f"lakevault writer: {len(gone)} staged file(s) vanished "
                f"before commit (first: {gone[0]}) — likely swept by "
                "expire_snapshots orphan GC racing this write; raise "
                "orphan_grace_sec above the stream's idle period"
            )
        v = _open_vault_with_spark(self.options)
        if not entries:
            if batch_id is not None:
                # an empty microbatch still burns its batch id so a replay
                # of it stays a no-op
                v.commit(
                    add_write_dir=None, replace_buckets=None, batch_id=batch_id,
                    summary={"operation": "stream-append", "rows": 0},
                )
            return
        v.commit(
            add_write_dir=None,
            add_entries=entries,
            replace_buckets=None,
            batch_id=batch_id,
            delta=True,
            summary={
                "operation": "stream-append",
                "rows": sum(e["rows"] for e in entries),
            },
        )

    def abort_entries(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for e in m.entries:
                try:
                    os.unlink(os.path.join(self.root, e["path"]))
                except OSError:
                    pass

    def batch_tag(self) -> str:
        sid = self.options.get("streamid")
        if sid is None:
            ckpt = self.options.get("checkpointlocation")
            if ckpt:
                import hashlib

                sid = hashlib.sha256(ckpt.encode()).hexdigest()[:12]
        return sid


def _open_vault_with_spark(options: dict) -> LakeVault:
    """Driver-side commit needs no Spark job either (add_entries skips the
    stat harvest), but attach the active session if one exists so future
    maintenance calls on the handle work."""
    from pyspark.sql import SparkSession

    v = _open_vault(options)
    v.spark = SparkSession.getActiveSession()
    return v


class _LakeVaultStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, core: _LakeVaultWriterCore):
        self.core = core

    def write(self, iterator):
        return self.core.write_batches(iterator)

    def commit(self, messages, batchId):  # noqa: N803 (API name)
        sid = self.core.batch_tag()
        batch_id = f"lvds-{sid}-{batchId}" if sid is not None else None
        self.core.commit_entries(messages, batch_id)

    def abort(self, messages, batchId):  # noqa: N803
        self.core.abort_entries(messages)


class _LakeVaultBatchWriter(DataSourceArrowWriter):
    def __init__(self, core: _LakeVaultWriterCore):
        self.core = core

    def write(self, iterator):
        return self.core.write_batches(iterator)

    def commit(self, messages):
        sid = self.core.options.get("batchid")
        self.core.commit_entries(messages, f"lvds-{sid}" if sid is not None else None)

    def abort(self, messages):
        self.core.abort_entries(messages)


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------


class LakeVaultDataSource(DataSource):
    """``format("lakevault")`` — see module docstring for the surface."""

    @classmethod
    def name(cls) -> str:
        return "lakevault"

    def _feed(self) -> str:
        return str(self.options.get("feed", "snapshot")).lower()

    def schema(self) -> str:
        v = _open_vault(self.options)
        feed = self._feed()
        if feed == "snapshot":
            sid = _resolve_snapshot_id(v, self.options, "snapshotid")
            return _snapshot_ddl(_plain_cols(v.snapshot(sid).schema))
        if feed == "changes":
            sid = _resolve_snapshot_id(v, self.options, "tosnapshotid")
            snap = v.snapshot(sid)
            return _changes_ddl(_plain_cols(snap.schema), list(v.key_cols))
        raise ValueError(f"lakevault: unknown feed {feed!r} (use 'snapshot' or 'changes')")

    def reader(self, schema) -> DataSourceReader:
        feed = self._feed()
        if feed == "snapshot":
            return _SnapshotBatchReader(self.options)
        if feed == "changes":
            return _ChangesBatchReader(self.options)
        raise ValueError(f"lakevault: unknown feed {feed!r}")

    def streamReader(self, schema) -> DataSourceStreamReader:  # noqa: N802
        if self._feed() != "changes":
            raise ValueError(
                "lakevault streaming requires .option('feed', 'changes') — a "
                "snapshot is a point-in-time read, only the change feed streams"
            )
        v = _open_vault(self.options)
        return _ChangesStreamReader(self.options, _plain_cols(v.snapshot().schema))

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError(
                "lakevault writer is append-only (delta upserts by table "
                "key); use LakeVault.compact()/delete()/restore() for "
                "rewrites instead of mode('overwrite')"
            )
        return _LakeVaultBatchWriter(_LakeVaultWriterCore(self.options, schema))

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        if overwrite:
            raise ValueError(
                "lakevault streaming sink is append-only delta upserts; "
                "outputMode('complete') truncate-each-batch semantics are "
                "not implemented — use outputMode('append') or 'update' "
                "(per-key upserts are exactly this sink's semantics)"
            )
        return _LakeVaultStreamWriter(_LakeVaultWriterCore(self.options, schema))


def register(spark) -> None:
    """Register the ``lakevault`` format on a session (idempotent), and
    enable Python-data-source filter pushdown (a runtime SQL conf) so
    ``pushFilters`` feeds the manifest pruner."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeVaultDataSource)
