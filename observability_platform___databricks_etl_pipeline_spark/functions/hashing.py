"""Content hashing — the per-row correctness invariant of the engine.

``BASELINE.json`` mandates per-row ``sha256(content)`` equality vs the oracle
after full replay. Native ``F.sha2`` (JVM, codegen) — never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(col: str | Column = "content") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # sha2 of null is null; coalesce to '' so deletes/schema-ops hash stably.
    return F.sha2(F.coalesce(c, F.lit("")), 256)
