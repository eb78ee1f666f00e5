"""Stage checkpointing + resumable runs (SURVEY.md §7 stage 10).

Each pipeline stage writes its output DataFrame to
<root>/<stage>/data.parquet and appends a manifest entry on success.
A restarted run skips stages already in the manifest and reads their
snapshots instead of recomputing — the batch analogue of the
reference's "caller saves" contract (README.md:44), scaled to
mid-pipeline restartability (north_rule: "resumable from checkpoint").

The writer interface is format-agnostic: parquet in this sandbox, an
Iceberg `writeTo(...).append()` on clusters with the runtime jar (the
try-import keeps this module importable either way).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    """Stage snapshot writer.

    table_format:
      * "parquet" (default) — <root>/<stage>/ directories + MANIFEST.jsonl.
      * "iceberg" — every stage appends/replaces an Iceberg table
        `<table_prefix>.<stage>` via the DataFrameWriterV2 API
        (`df.writeTo(...).using("iceberg")`), per the north_rule's
        "checkpoints per-partition lineage + counters to Iceberg".
        Needs a Spark session configured with an Iceberg catalog
        (spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog);
        the sandbox image carries no Iceberg runtime jar, so the branch
        is exercised by a writer-interface test and fails with a clear
        message when the catalog is absent.
    """

    def __init__(
        self,
        root: str,
        run_id: str = "run-0",
        table_format: str = "parquet",
        table_prefix: str | None = None,
    ) -> None:
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table_format {table_format!r}")
        if table_format == "iceberg" and not table_prefix:
            raise ValueError("iceberg format needs table_prefix, e.g. 'lake.dedup'")
        self.root = root
        self.run_id = run_id
        self.table_format = table_format
        self.table_prefix = table_prefix
        os.makedirs(root, exist_ok=True)

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "MANIFEST.jsonl")

    def _read_manifest(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        out[rec["stage"]] = rec
        return out

    def completed(self, stage: str) -> bool:
        return stage in self._read_manifest()

    def stage_path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _iceberg_table(self, stage: str) -> str:
        return f"{self.table_prefix}.{stage}"

    def _write_iceberg(self, stage: str, df: DataFrame) -> DataFrame:
        """DataFrameWriterV2 createOrReplace against the stage table —
        deliberately REPLACE semantics: a stage snapshot is the current
        run's checkpoint (rerun-idempotent, like the parquet branch's
        overwrite), not an event log; prior state stays reachable
        through Iceberg's snapshot history/time-travel. Atomicity comes
        from Iceberg's snapshot commit (no tmp-dir dance like the
        parquet branch needs)."""
        target = self._iceberg_table(stage)
        try:
            df.writeTo(target).using("iceberg").createOrReplace()
        except Exception as e:  # most commonly: catalog/jar missing
            raise RuntimeError(
                f"Iceberg write to {target} failed — is an Iceberg catalog "
                "configured on this session (spark.sql.catalog.*)?"
            ) from e
        return df.sparkSession.read.table(target)

    def write_stage(self, stage: str, df: DataFrame, **meta) -> DataFrame:
        """Materialize a stage output; idempotent on rerun."""
        if self.completed(stage):
            # a resume must read the snapshot with the format that wrote
            # it: silently reading a stale parquet dir (or a nonexistent
            # Iceberg table) under a different table_format would hand
            # back wrong data instead of failing
            written = self._read_manifest()[stage].get("format", "parquet")
            if written != self.table_format:
                raise RuntimeError(
                    f"stage {stage!r} was checkpointed as {written!r} but "
                    f"this store is configured for {self.table_format!r}; "
                    "resume with the original format or invalidate the stage"
                )
            return self.read_stage(df.sparkSession, stage)
        if self.table_format == "iceberg":
            out = self._write_iceberg(stage, df)
        else:
            path = self.stage_path(stage)
            tmp = path + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            df.write.mode("overwrite").parquet(tmp)
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
            out = df.sparkSession.read.parquet(path)
        with open(self.manifest_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "stage": stage,
                        "run_id": self.run_id,
                        "format": self.table_format,
                        **meta,
                    }
                )
                + "\n"
            )
        return out

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        if self.table_format == "iceberg":
            return spark.read.table(self._iceberg_table(stage))
        return spark.read.parquet(self.stage_path(stage))

    def invalidate_from(self, stage: str, order: list[str]) -> None:
        """Drop manifest entries for `stage` and everything after it."""
        manifest = self._read_manifest()
        if stage in order:
            for s in order[order.index(stage):]:
                manifest.pop(s, None)
        with open(self.manifest_path, "w") as f:
            for rec in manifest.values():
                f.write(json.dumps(rec) + "\n")
