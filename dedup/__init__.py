"""dedup — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-imagination of the record-comparison / merge-preference
semantics of NatLibFi/marc-record-merge-melindautils (reference at
/root/reference, surveyed in SURVEY.md) as a web-scale dedup pipeline over
Common-Crawl-style page tables:

    pages(url, warc_ts, html, text, lang)
      -> normalize (reference normalizer, lib/record-utils.js:231-233)
      -> quarantine pre-filter (isDeleted precondition,
         lib/marc-record-merge-melindautils.js:76-81)
      -> exact-hash pre-dedup
      -> candidate channels: MinHash/LSH, SimHash Hamming-ball,
         substring fingerprints (suffix pass)
      -> pair verification: exact Jaccard + melindautils-style reason
         engine (lib/mergeability-validators.js, lib/validate-fields.js)
      -> connected components (large-star/small-star)
      -> survivor selection + lineage emission
         (lib/post-merge-modifiers.js semantics)

Everything is expressed through the DataFrame API / Spark SQL so Catalyst
handles pushdown, pruning, and join strategy; Python only appears in
Arrow-vectorized pandas UDFs (signatures, suffix blocks). No RDDs, no
per-row Python UDFs.
"""

from dedup.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
