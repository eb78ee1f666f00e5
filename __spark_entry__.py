"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship: full fast-mode near-dup clustering of the
                   sf0.001 documents table → (url, cluster_id,
                   is_survivor, n_members).
queries()        — one entry per implemented operator (SURVEY.md §2),
                   built from the production modules in dedup/.
oracle_sql()     — independently-written DuckDB SQL for each query
                   (dedup/driver_queries.py ORACLES).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: end-to-end near-dup
    detection + clustering + survivor selection (fast hash mode)."""
    from dedup.config import DedupConfig
    from dedup.pages import load_pages, pages_sources
    from dedup.pipeline import run_dedup

    cfg = DedupConfig()
    pages = load_pages(spark, "/root/testdata/sf0.001")
    sources = pages_sources(pages)
    res = run_dedup(pages, cfg, sources=sources)
    surv = res.survivors.select("cluster_id", "survivor_url", "n_members")
    return (
        res.assignments.join(surv, "cluster_id")
        .select(
            "url",
            "cluster_id",
            (F.col("url") == F.col("survivor_url")).alias("is_survivor"),
            "n_members",
        )
        .orderBy("cluster_id", "url")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedup.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedup.driver_queries import ORACLES

    return dict(ORACLES)
