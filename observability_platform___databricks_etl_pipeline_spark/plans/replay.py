"""CDC replay engine: WAL chunks → transform → LWW dedup → COW MERGE commit.

The end-to-end lifecycle the reference spreads over three notebooks + a job
DAG (``jobs/hourly_etl.json:11-107``: ingest→enrich→aggregate) collapsed into
one deterministic micro-batch loop with exactly-once semantics the reference
lacks (its ``batch_id = datetime.now()`` + blind ``mode("append")`` duplicates
data on rerun — ``01_ingest_raw_logs.py:178,213-218``).

Per-batch plan (each stage annotated with its shuffle cost):

1. scan one WAL chunk (partition-pruned parquet read, fixed schema)   [0 shuffles]
2. quarantine malformed rows (null key fields) → dead-letter parquet  [0]
   (reference analog: corrupt-record counting, ``01:132-152`` — but kept,
   not dropped)
3. apply schema-evolution events (add/rename column, column-id based)  [0]
4. vectorized transforms: classify op, sanitize content, sha256, infer
   lang — pandas UDFs + native sha2 (``00_ingest_from_loghub`` per-row
   driver Python, re-expressed vectorized)                             [0]
5. two-level LWW dedup: (repo,path,commit) then (repo,path), both as
   hash aggs with map-side partial aggregation (skew-immune: the hot
   repo collapses to ~1 row/key per mapper before the exchange)        [1 shuffle]
6. MERGE: union with the scan of ONLY the affected buckets (manifest
   file pruning), one more hash agg picks the winner per key           [1 shuffle]
7. write replaced buckets + atomic snapshot/manifest/checkpoint commit

Metrics come from the same pass (small collected aggs over cached deduped
data), replacing the reference's count()-after-every-stage pattern
(``02:76-362`` — 8 extra full jobs per notebook).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from observability_platform___databricks_etl_pipeline_spark.functions.classify import classify_op_udf
from observability_platform___databricks_etl_pipeline_spark.functions.hashing import content_sha256
from observability_platform___databricks_etl_pipeline_spark.functions.langinfer import infer_lang_udf
from observability_platform___databricks_etl_pipeline_spark.functions.sanitize import sanitize_udf
from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import (
    LakeVault,
    TableSchema,
    _atomic_write_json,
)
from observability_platform___databricks_etl_pipeline_spark.sources.wal import (
    list_chunks,
    read_chunk,
    wal_partition,
)

# canonical final-state columns (FIXTURES.md §1 + engine-managed)
BASE_COLUMNS: list[tuple[str, str]] = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
    ("content_sha256", "string"),
    ("last_seq", "long"),
    ("is_deleted", "boolean"),
]
SCHEMA_OPS = ("add_column", "rename_column")


@dataclass
class BatchMetrics:
    batch_id: str
    chunk: int
    rows_read: int = 0
    quarantined: int = 0
    schema_ops: int = 0
    deduped: int = 0  # collapsed at (repo,path,commit) level
    superseded: int = 0  # collapsed at (repo,path) level within the batch
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    delete_noop: int = 0
    stale_ignored: int = 0
    skipped: bool = False

    def conserved(self) -> bool:
        applied = (
            self.inserted
            + self.updated
            + self.deleted
            + self.delete_noop
            + self.stale_ignored
        )
        return (
            self.rows_read
            == self.quarantined + self.schema_ops + self.deduped + self.superseded + applied
        )

    def to_json(self) -> dict[str, Any]:
        return dict(self.__dict__)


@dataclass
class ReplayResult:
    batches: list[BatchMetrics] = field(default_factory=list)
    events_applied: int = 0
    snapshot_id: int = -1


class CDCEngine:
    """Reusable change-event processor over a LakeVault COW table."""

    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        n_buckets: int = 16,
        with_rollup: bool = True,
    ):
        self.spark = spark
        self.root = table_root
        self.with_rollup = with_rollup
        if LakeVault.exists(table_root):
            self.vault = LakeVault.load(spark, table_root)
        else:
            self.vault = LakeVault.create(
                spark, table_root, BASE_COLUMNS, key_cols=("repo", "path"), n_buckets=n_buckets
            )
        self.quarantine_dir = os.path.join(table_root, "quarantine")
        self.metrics_dir = os.path.join(table_root, "ingest_metrics")
        self.checkpoint_path = os.path.join(table_root, "_vault", "checkpoints.json")

    # ---- public API --------------------------------------------------------

    def replay(
        self,
        wal_dir: str,
        chunks: list[int] | None = None,
        max_batches: int | None = None,
        fail_after_batches: int | None = None,
    ) -> ReplayResult:
        """Replay WAL chunks in order; exactly-once per chunk via commit
        manifests. ``fail_after_batches`` simulates a crash for resume tests.
        Safe to call repeatedly — committed chunks are skipped in O(1)."""
        chunks = chunks if chunks is not None else list_chunks(wal_dir)
        committed = self.vault.committed_batches()
        result = ReplayResult()
        done = 0
        for chunk in chunks:
            bid = self.batch_id(wal_dir, chunk)
            if bid in committed:
                result.batches.append(BatchMetrics(batch_id=bid, chunk=chunk, skipped=True))
                continue
            if max_batches is not None and done >= max_batches:
                break
            m = self._apply_chunk(wal_dir, chunk, bid)
            result.batches.append(m)
            result.events_applied += m.inserted + m.updated + m.deleted
            done += 1
            self._write_checkpoint(wal_dir, chunks)
            if fail_after_batches is not None and done >= fail_after_batches:
                raise RuntimeError(f"simulated crash after {done} batches")
        result.snapshot_id = self.vault.current_snapshot_id()
        self._write_checkpoint(wal_dir, chunks)
        return result

    def current_state(self, snapshot_id: int | None = None) -> DataFrame:
        """Live rows of the final-state table (tombstones filtered)."""
        return self.vault.scan(snapshot_id).where(~F.col("is_deleted"))

    @staticmethod
    def batch_id(wal_dir: str, chunk: int) -> str:
        """Deterministic batch identity = hash of the offset range — replaces
        the reference's wall-clock batch id (``01:178``)."""
        return hashlib.sha256(f"{os.path.abspath(wal_dir)}|chunk={chunk}".encode()).hexdigest()[:24]

    # ---- internals -----------------------------------------------------------

    def _write_checkpoint(self, wal_dir: str, chunks: list[int]) -> None:
        snap = self.vault.snapshot()
        committed = set(snap.committed_batches)
        done = [c for c in chunks if self.batch_id(wal_dir, c) in committed]
        _atomic_write_json(
            self.checkpoint_path,
            {
                "wal_dir": os.path.abspath(wal_dir),
                "snapshot_id": snap.snapshot_id,
                "chunks_committed": done,
                "next_chunk": (max(done) + 1) if done else 0,
            },
        )

    def checkpoint(self) -> dict[str, Any] | None:
        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as f:
            return json.load(f)

    def _extra_columns(self, schema: TableSchema) -> list[dict[str, Any]]:
        base_ids = {i + 1 for i in range(len(BASE_COLUMNS))}
        return [c for c in schema.columns if c["id"] not in base_ids]

    def _apply_chunk(self, wal_dir: str, chunk: int, bid: str) -> BatchMetrics:
        spark = self.spark
        m = BatchMetrics(batch_id=bid, chunk=chunk)
        raw = read_chunk(spark, wal_dir, chunk)

        malformed = (
            F.col("seq").isNull()
            | F.col("repo").isNull()
            | F.col("path").isNull()
            | F.col("commit").isNull()
        )

        # one small job: per-WAL-partition row counts, malformed counts, and
        # offset high-water marks (FIXTURES.md §3 offsets map)
        part_stats = (
            raw.groupBy(wal_partition().alias("wpart"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(malformed.cast("long")).alias("bad"),
                F.max("seq").alias("hwm"),
            )
            .collect()
        )
        m.rows_read = sum(r["n"] for r in part_stats)
        m.quarantined = sum(r["bad"] or 0 for r in part_stats)
        offsets = {str(r["wpart"]): r["hwm"] for r in part_stats}

        if m.quarantined:
            # per-batch subdir + overwrite ⇒ idempotent under crash-retry
            (
                raw.where(malformed)
                .write.mode("overwrite")
                .parquet(os.path.join(self.quarantine_dir, f"batch_id={bid}"))
            )
        events = raw.where(~malformed)

        # schema-evolution events: tiny; applied in seq order before the data
        # pass (chunk-aligned barrier semantics — documented in module docs)
        schema_rows = sorted(
            events.where(F.col("op").isin(*SCHEMA_OPS)).collect(), key=lambda r: r["seq"]
        )
        m.schema_ops = len(schema_rows)
        schema = self.vault.snapshot().schema
        for r in schema_rows:
            p = r["props"] or {}
            if r["op"] == "add_column":
                before = schema.names()
                schema = schema.add_column(p["column"], p.get("type", "string"))
                for c in schema.columns:
                    if c["name"] == p["column"] and c["name"] not in before:
                        c["prop"] = p["column"]  # stable props-key across renames
            else:
                schema = schema.rename_column(p["from"], p["to"])
        extra_cols = self._extra_columns(schema)

        data = events.where(~F.col("op").isin(*SCHEMA_OPS) | F.col("op").isNull())

        # vectorized transform stage (north rule: pandas/Arrow UDFs only)
        t = (
            data.withColumn("__op", classify_op_udf(F.col("op"), F.col("content")))
            .withColumn(
                "__content",
                F.when(F.col("content").isNull(), F.lit(None).cast("string")).otherwise(
                    sanitize_udf(F.col("content"))
                ),
            )
            .withColumn("content_sha256", content_sha256("__content"))
            .withColumn(
                "__lang",
                F.coalesce(F.col("lang"), infer_lang_udf(F.col("path"), F.col("__content"))),
            )
        )
        for c in extra_cols:
            t = t.withColumn(
                f"__x_{c['id']}",
                F.col("props").getItem(c.get("prop", c["name"])).cast(c["type"]),
            )

        # two-level LWW dedup — hash aggs (map-side combine ⇒ skew-immune)
        pay_cols = ["seq", "repo", "path", "commit", "__op", "__lang", "__content", "content_sha256"] + [
            f"__x_{c['id']}" for c in extra_cols
        ]
        payload = F.struct(*[F.col(c) for c in pay_cols])
        lvl1 = (
            t.groupBy("repo", "path", "commit")
            .agg(
                F.max_by(payload, F.struct(F.col("seq"), F.col("content_sha256"))).alias("w"),
                F.count(F.lit(1)).alias("n1"),
            )
            .select(*[F.col(f"w.{c}").alias(c) for c in pay_cols], "n1")
        )
        lvl2 = (
            lvl1.groupBy("repo", "path")
            .agg(
                F.max_by(F.struct(*[F.col(c) for c in pay_cols]), F.col("seq")).alias("w"),
                F.count(F.lit(1)).alias("n2"),
                F.sum("n1").alias("sum_n1"),
            )
            .select(*[F.col(f"w.{c}").alias(c) for c in pay_cols], "n2", "sum_n1")
        )
        lvl2 = lvl2.withColumn("__bucket", self.vault.bucket_expr()).cache()

        # one small job over the deduped batch: dedup accounting + affected
        # buckets + per-repo rollup feed
        bstats = (
            lvl2.groupBy("__bucket")
            .agg(
                F.count(F.lit(1)).alias("keys"),
                F.sum("n2").alias("lvl1_rows"),
                F.sum("sum_n1").alias("data_rows"),
            )
            .collect()
        )
        affected = [int(r["__bucket"]) for r in bstats]
        lvl1_rows = sum(r["lvl1_rows"] for r in bstats)
        data_rows = sum(r["data_rows"] for r in bstats)
        keys = sum(r["keys"] for r in bstats)
        m.deduped = data_rows - lvl1_rows
        m.superseded = lvl1_rows - keys

        if keys == 0:
            # nothing to merge — still commit (records the batch + offsets)
            new_schema = schema if m.schema_ops else None
            self.vault.commit(
                add_write_dir=None,
                replace_buckets=[],
                batch_id=bid,
                manifest=self._manifest(bid, wal_dir, chunk, offsets, m),
                new_schema=new_schema,
                summary={"operation": "merge", "chunk": chunk},
            )
            lvl2.unpersist()
            return m

        # MERGE: existing rows of affected buckets ∪ batch winners → LWW
        # scan() reads the PARENT snapshot's files: columns added/renamed this
        # batch aren't in it yet, so backfill/realign against the new schema.
        existing = self.vault.scan(buckets=affected)
        cur_names = [c["name"] for c in schema.columns]
        from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import SPARK_TYPE

        ex = existing.select(
            *[
                (
                    F.col(c["name"])
                    if c["name"] in existing.columns
                    else F.lit(None).cast(SPARK_TYPE.get(c["type"], c["type"])).alias(c["name"])
                )
                for c in schema.columns
            ]
        )
        ex = ex.withColumn("__src", F.lit(0)).withColumn("__bucket", self.vault.bucket_expr())
        extra_sel = [F.col(f"__x_{c['id']}").alias(c["name"]) for c in extra_cols]
        wn = lvl2.select(
            F.col("repo"),
            F.col("path"),
            F.col("commit"),
            F.col("__lang").alias("lang"),
            F.when(F.col("__op") == "delete", F.lit(None).cast("string"))
            .otherwise(F.col("__content"))
            .alias("content"),
            F.col("content_sha256"),
            F.col("seq").alias("last_seq"),
            (F.col("__op") == "delete").alias("is_deleted"),
            *extra_sel,
            F.lit(1).alias("__src"),
            F.col("__bucket"),
        )
        both = ex.unionByName(wn)
        val_cols = [c for c in cur_names if c not in ("repo", "path")]
        wpay = F.struct(*[F.col(c) for c in val_cols], F.col("__src"), F.col("__bucket"))
        merged = (
            both.groupBy("repo", "path")
            .agg(
                F.max_by(wpay, F.struct(F.col("last_seq"), F.col("__src"))).alias("w"),
                F.max(F.when(F.col("__src") == 0, F.col("last_seq"))).alias("old_seq"),
                F.max(F.when(F.col("__src") == 1, F.col("last_seq"))).alias("new_seq"),
                F.max(F.when(F.col("__src") == 0, F.col("is_deleted"))).alias("old_deleted"),
            )
            .select(
                "repo",
                "path",
                *[F.col(f"w.{c}").alias(c) for c in val_cols],
                F.col("w.__src").alias("__src"),
                F.col("w.__bucket").alias("__bucket"),
                "old_seq",
                "new_seq",
                "old_deleted",
            )
        )
        live_old = F.col("old_seq").isNotNull() & ~F.coalesce(F.col("old_deleted"), F.lit(False))
        action = (
            F.when(F.col("new_seq").isNull(), "carry")
            .when(F.col("__src") == 0, "stale")
            .when(F.col("is_deleted") & live_old, "delete")
            .when(F.col("is_deleted"), "delete_noop")
            .when(live_old, "update")
            .otherwise("insert")
        )
        merged = merged.withColumn("__action", action).cache()

        acts = {r["__action"]: r["n"] for r in merged.groupBy("__action").agg(F.count(F.lit(1)).alias("n")).collect()}
        m.inserted = acts.get("insert", 0)
        m.updated = acts.get("update", 0)
        m.deleted = acts.get("delete", 0)
        m.delete_noop = acts.get("delete_noop", 0)
        m.stale_ignored = acts.get("stale", 0)

        out = merged.select(*cur_names, "__bucket")
        n_out = max(len(affected), 1)
        wd = self.vault.new_write_dir(bid[:8])
        (
            out.repartition(n_out, "__bucket")
            .sortWithinPartitions("repo", "path")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(wd)
        )

        if self.with_rollup:
            self._write_rollup(lvl2, bid)

        new_schema = schema if schema.schema_id != self.vault.snapshot().schema.schema_id else None
        self.vault.commit(
            add_write_dir=wd,
            replace_buckets=affected,
            batch_id=bid,
            manifest=self._manifest(bid, wal_dir, chunk, offsets, m),
            new_schema=new_schema,
            summary={"operation": "merge", "chunk": chunk},
        )
        merged.unpersist()
        lvl2.unpersist()
        return m

    def _manifest(
        self, bid: str, wal_dir: str, chunk: int, offsets: dict[str, int], m: BatchMetrics
    ) -> dict[str, Any]:
        return {
            "batch_id": bid,
            "offsets": offsets,
            "metrics": m.to_json(),
            "lineage": [f"{os.path.abspath(wal_dir)}/chunk={chunk}"],
        }

    def _write_rollup(self, lvl2: DataFrame, bid: str) -> None:
        """Per-batch per-repo ingest rollup — the Gold-layer analog
        (``03_build_flow_dataset.py:66-114``): counts, op mix, byte volume,
        content-length percentiles, seq range, sample commits."""
        (
            lvl2.groupBy("repo")  # noqa: SIM117
            .agg(
                F.count(F.lit(1)).alias("events"),
                F.sum((F.col("__op") == "insert").cast("long")).alias("inserts"),
                F.sum((F.col("__op") == "update").cast("long")).alias("updates"),
                F.sum((F.col("__op") == "delete").cast("long")).alias("deletes"),
                F.sum(F.coalesce(F.length("__content"), F.lit(0))).alias("bytes"),
                F.expr("percentile_approx(length(__content), 0.5)").alias("p50_content_len"),
                F.expr("percentile_approx(length(__content), 0.95)").alias("p95_content_len"),
                F.min("seq").alias("first_seq"),
                F.max("seq").alias("last_seq"),
                F.slice(F.collect_set("commit"), 1, 5).alias("sample_commits"),
            )
            .write.mode("overwrite")  # per-batch subdir ⇒ idempotent on retry
            .parquet(os.path.join(self.metrics_dir, f"batch_id={bid}"))
        )
