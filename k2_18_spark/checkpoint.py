"""Superstep checkpoint + per-partition lineage store.

north_rule: every superstep checkpoints the frontier/rank vectors with
per-partition lineage rows (partition_id, iteration, rows_in, rows_out,
checksum, wall_ms) so a killed job resumes mid-iteration without
recomputation.

Backed by parquet directories (an Iceberg catalog is a drop-in swap:
same layout, `MERGE INTO`/snapshot semantics instead of directory
markers — this sandbox has no Iceberg jars, so parquet + atomic
`_ITER_OK` markers implement the same contract).

Layout::

    {root}/{job}/state/iteration={N}/...parquet   (+ _ITER_OK marker)
    {root}/{job}/lineage/...parquet                (append-only)

The checkpoint write doubles as plan truncation: each superstep's state
is read back from parquet, so the logical plan never grows with the
iteration count (no lineage blow-up, flat per-iteration planning cost).
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark import schemas

_ITER_RE = re.compile(r"^iteration=(\d+)$")


class CheckpointStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        job: str,
        state_version: str = "v1",
    ):
        """``state_version`` names the state encoding (e.g. the vertex-id
        scheme). It is stamped into every ``_ITER_OK`` marker, and resume
        REFUSES markers written under a different version — a checkpoint
        written with string vertex ids silently joined against
        long-encoded vertices would produce empty output, not an error."""
        self.spark = spark
        self.root = root
        self.job = job
        self.state_version = state_version
        self.job_dir = os.path.join(root, job)
        os.makedirs(os.path.join(self.job_dir, "state"), exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.job_dir, "state", f"iteration={iteration}")

    def _marker(self, iteration: int) -> str:
        return os.path.join(self._iter_dir(iteration), "_ITER_OK")

    def _lineage_dir(self) -> str:
        return os.path.join(self.job_dir, "lineage")

    # -- state ---------------------------------------------------------
    def save_state(
        self,
        iteration: int,
        state: DataFrame,
        rows_in: int | None = None,
        extra: dict | None = None,
    ) -> DataFrame:
        """Write state for ``iteration``; returns the re-read DataFrame
        (plan truncated). Appends one lineage row per output partition."""
        t0 = time.monotonic()
        path = self._iter_dir(iteration)
        state.write.mode("overwrite").parquet(path)
        wall_ms = (time.monotonic() - t0) * 1000.0
        reread = self.spark.read.parquet(path)
        self._append_lineage(iteration, reread, rows_in, wall_ms)
        meta = {
            "iteration": iteration,
            "wall_ms": wall_ms,
            "state_version": self.state_version,
        }
        if extra:
            meta.update(extra)
        with open(self._marker(iteration), "w", encoding="utf-8") as f:
            json.dump(meta, f)
        return reread

    def latest_iteration(self) -> int | None:
        """Highest iteration with a complete (_ITER_OK) state write.

        Raises ``ValueError`` if a complete marker was written under a
        different ``state_version`` — resuming across an encoding change
        must be an explicit decision (clear the checkpoint dir), never a
        silent empty-join."""
        state_dir = os.path.join(self.job_dir, "state")
        best = None
        for name in os.listdir(state_dir):
            m = _ITER_RE.match(name)
            if m and os.path.exists(self._marker(int(m.group(1)))):
                n = int(m.group(1))
                found = self.load_marker(n).get("state_version", "v1")
                if found != self.state_version:
                    raise ValueError(
                        f"checkpoint {self.job_dir} iteration={n} was written "
                        f"with state_version={found!r} but this job expects "
                        f"{self.state_version!r}; delete the checkpoint dir to "
                        "restart from scratch"
                    )
                best = n if best is None or n > best else best
        return best

    def load_state(self, iteration: int) -> DataFrame:
        return self.spark.read.parquet(self._iter_dir(iteration))

    def load_marker(self, iteration: int) -> dict:
        with open(self._marker(iteration), encoding="utf-8") as f:
            return json.load(f)

    def annotate(self, iteration: int, **extra) -> None:
        """Merge extra keys (e.g. converged=True) into the _ITER_OK
        marker without touching the state files."""
        meta = self.load_marker(iteration)
        meta.update(extra)
        with open(self._marker(iteration), "w", encoding="utf-8") as f:
            json.dump(meta, f)

    # -- lineage -------------------------------------------------------
    def _append_lineage(
        self,
        iteration: int,
        state: DataFrame,
        rows_in: int | None,
        wall_ms: float,
    ) -> None:
        """One row per partition of the checkpointed state: row count and
        an order-insensitive xxhash64 checksum (sum of row hashes)."""
        first_col = state.columns[0]
        per_part = (
            state.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("rows_out"),
                # mod keeps the running sum inside long range (ANSI mode)
                F.sum(
                    F.pmod(F.xxhash64(*[F.col(c) for c in state.columns]), F.lit(1_000_000_007))
                ).alias("checksum"),
            )
            .select(
                F.lit(self.job).alias("job"),
                F.lit(iteration).alias("iteration"),
                F.col("partition_id").cast("int"),
                F.lit(rows_in if rows_in is not None else -1)
                .cast("long")
                .alias("rows_in"),
                F.col("rows_out").cast("long"),
                F.coalesce(F.col("checksum"), F.lit(0)).cast("long").alias("checksum"),
                F.lit(float(wall_ms)).alias("wall_ms"),
            )
        )
        per_part.write.mode("append").parquet(self._lineage_dir())
        _ = first_col  # (kept for clarity; checksum covers all columns)

    def lineage(self) -> DataFrame:
        return self.spark.read.schema(schemas.LINEAGE).parquet(self._lineage_dir())
