"""Write-time LSH ANN index AS A LAKEVAULT TABLE (r4 verdict #5).

``build_lsh_index`` (similarity.py) persists the sign-bucketed corpus as a
bare parquet directory — fine for a one-shot index, but at 100 TB the index
must stay TRANSACTIONALLY CONSISTENT with the corpus it mirrors: rebuilds
must be atomic, readers must never see a half-written bucket, old versions
must expire, and a corpus replay batch must be able to refresh exactly the
sign-buckets its rows touched. All of that is what LakeVault already does —
so the index here IS a LakeVault table whose physical bucket id is the
hyperplane SIGN bucket:

- every rebuild/refresh is a ``commit()`` → snapshot isolation + the atomic
  version-pointer swap; a crashed refresh leaves only orphans (GC'd by
  ``expire_snapshots``), never a torn index;
- probes read via ``scan(buckets=probe_set)`` → manifest-level file pruning,
  same superset guarantee as every other bucket-pruned scan;
- ``refresh(changes)`` consumes a ``scan_changes`` feed FROM THE CORPUS
  TABLE and replaces only the affected sign-buckets
  (``commit(replace_buckets=...)``) — O(changed rows + touched buckets),
  never O(index). Old sign-buckets come from the feed's ``_before`` images,
  so the refresh NEVER scans the index to locate moved rows.

The murmur3 ``bucket_expr`` contract does not apply to this table: the
partition value is the sign bucket by construction and the index is
maintained exclusively through this class (never ``compact()``/merges —
``table.json`` is stamped with a dedicated bucket_fn tag so any
bucket-scoped LakeVault operation fails loudly instead of silently
re-clustering by the wrong function).

Reference parity: the reference has no ANN index at all; this is part of
the beyond-reference training-data surface (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from observability_platform___databricks_etl_pipeline_spark.operators.similarity import (
    _corpus_bucket_udf,
    _hyperplanes,
    _valid_vectors,
    _vec_dim,
    brute_force_topk,
    _probe_buckets_udf,
    _query_probe_frame,
    _score_topk_per_query,
)
from observability_platform___databricks_etl_pipeline_spark.plans.lakevault import (
    LakeVault,
    _atomic_write_json,
)

_INDEX_BUCKET_FN = "lsh-sign-v1"


class LshVaultIndex:
    """A hyperplane-LSH ANN index stored and maintained as a LakeVault
    table. Construct via :meth:`build` (full rebuild from a corpus frame)
    or :meth:`load`, keep current via :meth:`refresh`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.vault = LakeVault.load(spark, root)
        with open(os.path.join(root, "_vault", "lsh.json")) as f:
            p = json.load(f)
        self.dim = int(p["dim"])
        self.n_planes = int(p["n_planes"])
        self.seed = int(p["seed"])
        self.id_col = p["id_col"]
        self.vec_col = p["vec_col"]
        self.planes = _hyperplanes(self.dim, self.n_planes, self.seed)

    # ---- build -----------------------------------------------------------

    @staticmethod
    def build(
        spark: SparkSession,
        root: str,
        corpus: DataFrame,
        n_planes: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        seed: int = 42,
        dim: int | None = None,
    ) -> "LshVaultIndex":
        """Full (re)build: bucket the whole corpus in one Arrow matmul pass,
        cluster rows by sign bucket (ONE shuffle — each output file holds
        one bucket), commit with ``replace_all``. Building over an existing
        index root is itself atomic: readers see the old snapshot until the
        pointer swaps."""
        dim = _vec_dim(corpus, vec_col) if dim is None else dim
        if not LakeVault.exists(root):
            v = LakeVault.create(
                spark,
                root,
                [(id_col, "long"), (vec_col, "array<double>"), ("__b", "long")],
                key_cols=(id_col,),
                n_buckets=2**n_planes,
            )
            # dedicated bucket-fn tag: the physical bucket is the SIGN
            # bucket, so any murmur3-keyed LakeVault operation (merge,
            # bucket-scoped compact) must refuse this table
            meta_path = os.path.join(v.vault_dir, "table.json")
            with open(meta_path) as f:
                meta = json.load(f)
            meta["bucket_fn"] = _INDEX_BUCKET_FN
            _atomic_write_json(meta_path, meta)
        else:
            v = LakeVault.load(spark, root)
            # the physical bucket count (2^n_planes) is fixed at table
            # creation; a rebuild must keep the same plane count or the
            # sign buckets no longer line up with the manifest buckets —
            # different params need a fresh root (swap atomically above it)
            existing = v.table_meta.get("n_buckets")
            if existing != 2**n_planes:
                raise ValueError(
                    f"lsh index at {root} was built with "
                    f"{existing.bit_length() - 1} planes ({existing} sign "
                    f"buckets); rebuilding with n_planes={n_planes} would "
                    "misalign sign buckets with manifest buckets — build "
                    "a new root and swap, or keep n_planes"
                )
            # ALL plane parameters are pinned, not just the count: lsh.json
            # is rewritten before the data commit, so a changed seed/dim
            # would leave a crash window (and a concurrent-reader window)
            # where probes hash with new planes against data bucketed under
            # the old ones — silent near-zero recall. Same remedy: a new
            # parameterization is a new root, swapped atomically above it.
            try:
                with open(os.path.join(v.vault_dir, "lsh.json")) as f:
                    prev = json.load(f)
            except FileNotFoundError:
                prev = None  # crashed before first params write: free to set
            want = {"dim": dim, "seed": seed, "id_col": id_col, "vec_col": vec_col}
            stale = (
                {k: (prev[k], want[k]) for k in want if prev[k] != want[k]}
                if prev is not None
                else {}
            )
            if stale:
                raise ValueError(
                    f"lsh index at {root} pins plane parameters "
                    f"{ {k: v0 for k, (v0, _) in stale.items()} }; a rebuild "
                    f"passed { {k: v1 for k, (_, v1) in stale.items()} } — "
                    "build a new root and swap"
                )
        _atomic_write_json(
            os.path.join(v.vault_dir, "lsh.json"),
            {
                "dim": dim,
                "n_planes": n_planes,
                "seed": seed,
                "id_col": id_col,
                "vec_col": vec_col,
            },
        )
        planes = _hyperplanes(dim, n_planes, seed)
        assigned = (
            _valid_vectors(corpus, vec_col, dim)
            .select(
                F.col(id_col),
                F.col(vec_col).cast("array<double>").alias(vec_col),
                _corpus_bucket_udf(planes)(F.col(vec_col).cast("array<double>")).alias("__b"),
            )
        )
        wd = v.new_write_dir("lsh-build")
        (
            assigned.withColumn("__bucket", F.col("__b"))
            .repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(wd)
        )
        v.commit(
            add_write_dir=wd,
            replace_buckets=None,
            batch_id=None,
            replace_all=True,
            summary={"operation": "lsh_index_build", "n_planes": n_planes, "dim": dim},
        )
        return LshVaultIndex(spark, root)

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LshVaultIndex":
        return LshVaultIndex(spark, root)

    # ---- incremental maintenance ----------------------------------------

    def refresh(self, changes: DataFrame) -> list[int]:
        """Apply a corpus change feed — the output of
        ``LakeVault.scan_changes`` on the corpus table (``_change_type``,
        post-image columns, ``_before`` struct) — replacing ONLY the
        affected sign-buckets:

        - new/updated rows are bucketed by one Arrow pass over the feed;
        - moved/deleted rows' OLD buckets come from the ``_before`` vector
          (no index scan to find them);
        - affected = old ∪ new buckets; their rebuilt content = (current
          index rows in those buckets MINUS changed ids) ∪ new assignments,
          committed via ``replace_buckets`` — untouched sign-buckets are
          carried by manifest reference.

        Returns the affected sign-bucket list. Cost: O(changed rows +
        affected-bucket rows), metadata for everything else."""
        id_c, vec_c = self.id_col, self.vec_col
        udf = _corpus_bucket_udf(self.planes)
        # pin the snapshot the kept-rows scan reads: a rebuild/refresh that
        # lands in between must surface as CommitConflict, not be silently
        # clobbered by this commit's replace_buckets (same rule as every
        # bucket-scoped rewrite — compact/delete/update/merge)
        base_sid = self.vault.current_snapshot_id()

        post = _valid_vectors(
            changes.where(F.col("_change_type") != "delete"), vec_c, self.dim
        ).select(
            F.col(id_c),
            F.col(vec_c).cast("array<double>").alias(vec_c),
            udf(F.col(vec_c).cast("array<double>")).alias("__b"),
        ).localCheckpoint(eager=True)

        pre_vec = F.col("_before")[vec_c].cast("array<double>")
        pre = (
            changes.where(
                F.col("_before").isNotNull()
                & pre_vec.isNotNull()
                & (F.size(pre_vec) == F.lit(self.dim))
            )
            .select(udf(pre_vec).alias("__b"))
        )
        affected = sorted(
            {int(r["__b"]) for r in post.select("__b").distinct().collect()}
            | {int(r["__b"]) for r in pre.distinct().collect()}
        )
        if not affected:
            return []
        changed_ids = changes.select(F.col(id_c)).distinct()
        kept = (
            self.vault.scan(snapshot_id=base_sid, buckets=affected)
            .join(F.broadcast(changed_ids), id_c, "left_anti")
        )
        rebuilt = kept.unionByName(post).withColumn("__bucket", F.col("__b"))
        wd = self.vault.new_write_dir("lsh-refresh")
        (
            rebuilt.repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(wd)
        )
        self.vault.commit(
            add_write_dir=wd,
            replace_buckets=affected,
            batch_id=None,
            base_snapshot_id=base_sid,
            summary={"operation": "lsh_index_refresh", "buckets": affected},
        )
        return affected

    # ---- query -----------------------------------------------------------

    def _probe(self, query: list[float], multiprobe_hamming: int) -> list[int]:
        q = np.asarray(query, dtype="float64")
        qbits = sum((1 << i) for i, p in enumerate(self.planes) if float(p @ q) > 0)
        probe = [qbits]
        if multiprobe_hamming >= 1:
            probe += [qbits ^ (1 << i) for i in range(self.n_planes)]
        return probe

    def topk(
        self, query: list[float], k: int = 10, multiprobe_hamming: int = 1
    ) -> DataFrame:
        """Single-query ANN against the committed index snapshot: probe
        buckets computed driver-side, pushed as manifest bucket pruning —
        only the probed buckets' files are scanned and exactly scored.
        Result-identical to ``lsh_topk`` over the same corpus/params."""
        cand = self.vault.scan(buckets=self._probe(query, multiprobe_hamming))
        return brute_force_topk(cand, query, k, self.id_col, self.vec_col)

    def topk_batch(
        self,
        queries: DataFrame,
        k: int = 10,
        qid_col: str = "qid",
        qvec_col: str = "qvec",
        multiprobe_hamming: int = 1,
    ) -> DataFrame:
        """Batch ANN: per-query probe sets in one Arrow matmul, the probe
        union (≤ 2^n_planes) pruned at the manifest level, then the shared
        broadcast-join + per-query top-k tail."""
        qf = _query_probe_frame(
            queries,
            qid_col,
            qvec_col,
            _probe_buckets_udf(self.planes, multiprobe_hamming),
            self.dim,
        ).localCheckpoint(eager=True)
        probe = [int(r["__probe"]) for r in qf.select("__probe").distinct().collect()]
        corpus = self.vault.scan(buckets=probe)
        return _score_topk_per_query(
            corpus, qf, "__b", self.dim, k, qid_col, self.id_col, self.vec_col
        )
