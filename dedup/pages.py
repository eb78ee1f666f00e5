"""Load / derive the canonical pages table.

Two sources:

1. The driver's ``documents.parquet`` (doc_id, text, lang, source,
   n_chars) — deterministically lifted into the pages shape. The same
   derivation is written in DuckDB SQL in ``dedup/oracle.py`` so the
   correctness gate sees identical inputs.
2. Our own synthetic corpus (dedup/corpus.py) which is generated
   directly in the pages shape.

`html` is a deterministic wrapper of `text` so extraction is
byte-exactly invertible per url (BASELINE.json input_hint invariant;
exercised by dedup/extract.py tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Derivation constants — must match dedup/oracle.py PAGES_CTE.
EPOCH_BASE = 1704067200  # 2024-01-01T00:00:00Z
TS_STEP_SECONDS = 60


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_to_pages(docs: DataFrame) -> DataFrame:
    """Lift the driver documents table into the canonical pages shape.

    url      := 'https://' || source || '.example/doc/' || doc_id
    warc_ts  := epoch(EPOCH_BASE + doc_id * TS_STEP_SECONDS)
    html     := '<html><body>' || text || '</body></html>'  (utf-8 bytes)
    """
    return docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(EPOCH_BASE) + F.col("doc_id") * F.lit(TS_STEP_SECONDS)
        ).alias("warc_ts"),
        F.encode(
            # &/</> escaped so extraction's unescape is an exact inverse
            # (entity-like text would otherwise break the byte-identical
            # invariant; dedup/extract.py escape_wrapper_text)
            F.concat(
                F.lit("<html><body>"),
                F.replace(
                    F.replace(
                        F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                        F.lit("<"), F.lit("&lt;"),
                    ),
                    F.lit(">"), F.lit("&gt;"),
                ),
                F.lit("</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
        # kept as a convenience for the source-overlap guard; the canonical
        # side table shape is dedup/schema.py SOURCES_SCHEMA
        F.col("source"),
        # typed metadata for the pair gates, derived deterministically so
        # the DuckDB oracle reproduces them exactly (dedup/driver_queries
        # _PAGES_CTE mirrors these verbatim). Content-derived values are
        # shared by byte-identical copies; doc_id-derived presence makes
        # every gate branch reachable on the driver table.
        F.when(
            F.col("doc_id") % 5 == 0,
            F.array(F.concat(F.lit("https://canon.example/"), F.md5(F.col("text")))),
        ).otherwise(F.array().cast("array<string>")).alias("canonical_links"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.array(F.concat(F.lit("og:lang="), F.col("lang"))),
        ).otherwise(F.array().cast("array<string>")).alias("meta_tags"),
        F.when(
            F.col("doc_id") % 37 == 0,
            F.array(F.concat(F.lit("trk-"), F.col("doc_id").cast("string"))),
        ).otherwise(F.array().cast("array<string>")).alias("tracking_ids"),
        F.when(
            F.col("doc_id") % 29 == 0,
            F.array(F.substring("text", 1, 24), F.lit("h2")),
        ).otherwise(F.array(F.substring("text", 1, 24))).alias("headings"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat((F.col("doc_id") % 4 + 1).cast("string"), F.lit(" nid.")),
        )
        .when(F.col("doc_id") % 7 == 1, F.lit("XV, 514 s. :"))
        .when(F.col("doc_id") % 7 == 2, F.lit("kartta"))
        .otherwise(F.lit(None).cast("string"))
        .alias("extent"),
    )


def load_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dedup.session import ensure_scan_parallelism

    # the driver documents table ships as ONE parquet row group —
    # unsplittable, so without the guard the whole normalize/signature
    # front downstream runs as a single task (guide §2.5 input skew);
    # no-op on inputs that already split
    return documents_to_pages(
        ensure_scan_parallelism(load_documents(spark, sf_dir))
    )


# contract for JSONL web-corpus drops (the shape C4/CC-derived corpora
# ship in): one JSON object per line, `url` + `text` required,
# `warc_ts_epoch` (seconds) / `lang` / `source` optional — missing
# fields surface as nulls and the pair gates degrade via the same
# column-presence guards as the plain 5-column parquet ingest
# (tests/test_plain_ingest.py).
JSONL_PAGES_SCHEMA = (
    "url string, warc_ts_epoch bigint, text string, lang string, "
    "source string"
)


def load_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL landing directory into the minimal pages shape.

    The schema is EXPLICIT, never inferred: at the 100-TB design point
    schema inference is a full extra pass over the input before the
    job proper starts (Spark samples every file without
    `spark.sql.files.maxPartitionBytes`-bounded limits for JSON), and
    an inferred type drifting with the sample (warc_ts_epoch string vs
    bigint) would silently change downstream casts. Malformed lines
    follow Spark's PERMISSIVE default — nulls, never a failed task —
    matching the pipeline's corrupt-row totality policy."""
    return _jsonl_project(spark.read.schema(JSONL_PAGES_SCHEMA).json(path))


def _jsonl_project(raw: DataFrame) -> DataFrame:
    return raw.select(
        "url",
        F.timestamp_seconds(F.col("warc_ts_epoch")).alias("warc_ts"),
        "text",
        "lang",
        "source",
    )


def read_pages_stream_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming twin of load_pages_jsonl — JSONL drops landing in
    `path` as a pages stream (same explicit schema, same PERMISSIVE
    totality, same projection), for the exactly-once streaming stores."""
    raw = (
        spark.readStream.schema(JSONL_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    return _jsonl_project(raw)


def pages_sources(pages: DataFrame) -> DataFrame:
    """Source-membership side table (LOW/SID analogue) from a pages DF
    that carries a `source` column: one (url, source, source_local_id)
    row per page."""
    return pages.select(
        "url",
        "source",
        F.concat(F.lit("FCC"), F.xxhash64("url").cast("string")).alias(
            "source_local_id"
        ),
    )
