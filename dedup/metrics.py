"""Per-stage counters (SURVEY.md §4 item 4).

Every stage can report (stage, rows_out, n_partitions, wall_ms, extra)
rows into a counters table. Counters are computed with ONE aggregate per
stage DataFrame — per-partition row counts come from
`spark_partition_id()` grouping so skew is visible in the lineage table,
the scaled-up analogue of the reference's debug() stat logging
(lib/marc-record-merge-melindautils.js:106-114)."""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, functions as F


def partition_histogram(df: DataFrame) -> list[dict]:
    """Rows per partition — the skew lineage for one stage output."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    return [{"partition_id": int(r[0]), "rows": int(r[1])} for r in rows]


class StageMetrics:
    """Collects one record per stage; write() persists as JSON lines."""

    def __init__(self) -> None:
        self.records: list[dict] = []

    def record_stage(
        self, stage: str, df: DataFrame | None = None, *,
        histogram: bool = False, **extra
    ) -> dict:
        rec: dict = {"stage": stage, **extra}
        if df is not None:
            t0 = time.time()
            if histogram:
                hist = partition_histogram(df)
                rec["rows_out"] = sum(h["rows"] for h in hist)
                rec["n_partitions"] = len(hist)
                rec["max_partition_rows"] = max(
                    (h["rows"] for h in hist), default=0
                )
            else:
                rec["rows_out"] = df.count()
            rec["wall_ms"] = int((time.time() - t0) * 1000)
        self.records.append(rec)
        return rec

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")
