"""Fixed schemas (SURVEY.md §1.2).

The reference's dynamic MARC field repertoire (open tag set,
lib/mergeability-validators.js:95-100) collapses into one fixed page
schema per BASELINE.json ``input_hint`` plus typed derived columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The canonical input table (BASELINE.json input_hint). `url` is record
# identity — the analogue of MARC field 001 (lib/record-utils.js:197-203).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        # typed page metadata feeding the pair gates — the web analogues
        # of the reference's configured MARC tags:
        #   canonical_links / meta_tags / tracking_ids → the
        #     checkFieldRequirements stop-field rules
        #     (lib/mergeability-validators.js:95-100);
        #   headings → the sameAuthorType count gate (:123-131);
        #   extent → the same300TypeAndCount physical-extent gate
        #     (:152-178).
        T.StructField("canonical_links", T.ArrayType(T.StringType()), True),
        T.StructField("meta_tags", T.ArrayType(T.StringType()), True),
        T.StructField("tracking_ids", T.ArrayType(T.StringType()), True),
        T.StructField("headings", T.ArrayType(T.StringType()), True),
        T.StructField("extent", T.StringType(), True),
    ]
)

# Ground-truth labels for the synthetic corpus (never read by the pipeline).
TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("true_cluster_id", T.LongType(), False),
        T.StructField("dup_kind", T.StringType(), False),
    ]
)

# Source membership side table — LOW/SID analogue (FIXTURES.md §2;
# reference noSameLOWTags, lib/mergeability-validators.js:52-67).
SOURCES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("source_local_id", T.StringType(), True),
    ]
)

# Edge output of the verification stage.
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("jaccard", T.DoubleType(), True),
        T.StructField("channel", T.StringType(), True),
    ]
)
