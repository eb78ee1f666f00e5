"""Driver-contract queries: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle (CORRECTNESS gate).

Design rules for engine-parity (driver hashes values column-sorted):
  * no floats in outputs — integer-scaled (micro) values via EXACT
    integer division (`div` / `//`), never float-floor;
  * no timestamps — epoch seconds as BIGINT;
  * no arrays — exploded rows or ','-joined sorted strings;
  * the only shared hash is h60(x) = first 60 bits of md5, identical by
    construction in both engines (dedup/hashing.py h60/h60_duckdb);
  * deterministic tie-breaks everywhere (url / vec_id ASC).

The Spark side of every query is built from the production operator
modules (normalize/minhash/candidates/verify/cluster/select/textstats/
embeddings) in `portable` hash mode; the DuckDB side is written
independently as plain SQL against the same parquet-derived views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dedup.candidates import pairs_from_buckets
from dedup.config import DedupConfig
from dedup.embeddings import brute_force_topk
from dedup.hashing import h60
from dedup.minhash import explode_bands, signatures, with_shingles
from dedup.normalize import with_normalized, quarantine_filter
from dedup.pages import (
    EPOCH_BASE,
    TS_STEP_SECONDS,
    load_documents,
    load_pages,
)
from dedup.survivor import select_survivors
from dedup.textstats import (
    lang_id,
    quality_features,
    token_count,
)

# portable-mode config used by every oracle-checked query; the huge
# bucket cap makes Spark's capped pair expansion coincide with the
# oracle's uncapped self-join on this (tiny) comparison tier.
CFG = DedupConfig(hash_mode="portable", max_bucket_size=1_000_000_000)

JACCARD_MICRO_THRESHOLD = 800_000  # 0.8 in micro units

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments
# ---------------------------------------------------------------------------

_H60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _h60(x: str) -> str:
    return _H60.format(x=x)


_PAGES_CTE = f"""
pages AS (
  SELECT 'https://' || source || '.example/doc/' || doc_id::VARCHAR AS url,
         (1704067200 + doc_id * 60)::BIGINT AS warc_ts_epoch,
         text, lang, source,
         CASE WHEN doc_id % 5 = 0
              THEN ['https://canon.example/' || md5(text)]
              ELSE []::VARCHAR[] END AS canonical_links,
         CASE WHEN doc_id % 3 = 0
              THEN ['og:lang=' || lang] ELSE []::VARCHAR[] END AS meta_tags,
         CASE WHEN doc_id % 37 = 0
              THEN ['trk-' || doc_id::VARCHAR]
              ELSE []::VARCHAR[] END AS tracking_ids,
         CASE WHEN doc_id % 29 = 0
              THEN [substr(text, 1, 24), 'h2']
              ELSE [substr(text, 1, 24)] END AS headings,
         CASE WHEN doc_id % 7 = 0 THEN ((doc_id % 4 + 1)::VARCHAR || ' nid.')
              WHEN doc_id % 7 = 1 THEN 'XV, 514 s. :'
              WHEN doc_id % 7 = 2 THEN 'kartta'
              ELSE NULL END AS extent
  FROM documents
)
"""

# inferTypeAndCount in DuckDB SQL (record-utils.js:415-478 semantics over
# the derived extent domain): anchored explicit volume count, else the
# roman-preface / pages-alias implicit single-volume rules, else NULL.
_INFER_COUNT_SQL = """
CASE WHEN {x} IS NULL OR trim({x}) = '' THEN NULL
     WHEN regexp_extract(lower({x}), '^([0-9]+)\\s*(volumes?|vol|nid|v\\.)', 1) <> ''
          THEN regexp_extract(lower({x}), '^([0-9]+)\\s*(volumes?|vol|nid|v\\.)', 1)::INT
     WHEN regexp_matches(lower({x}), '^[ivxlcdm]+[\\s,.:]') THEN 1
     WHEN regexp_matches(lower({x}) || ' ',
                         '([0-9]+)\\s*,?\\s*(pages?|sivua|s\\.?|p\\.?)($|[\\s:;(\\[])')
          THEN 1
     ELSE NULL END
"""

_NORM_CTE = """
normalized AS (
  SELECT url, warc_ts_epoch, lang, source, text,
         trim(regexp_replace(lower(text), '[^a-z0-9åäö]+', ' ', 'g')) AS norm_text
  FROM pages
)
"""

_CLEAN_CTE = """
clean AS (
  SELECT * FROM normalized
  WHERE NOT (text IS NULL OR trim(text) = '')
    AND NOT contains(lower(text), 'noindex')
    AND NOT starts_with(text, '^^')
)
"""

_SHINGLE_CTE = """
shingled AS (
  SELECT url,
         unnest(list_transform(range(1, greatest(length(norm_text) - 8, 1) + 1),
                               i -> substr(norm_text, i::INT, 9))) AS sh
  FROM clean
),
dsh AS (
  SELECT DISTINCT url, {h} AS shash
  FROM shingled
),
sh_sizes AS (SELECT url, count(*) AS n_sh FROM dsh GROUP BY url)
""".format(h=_h60("sh"))

_SIG_CTE = """
perms AS (SELECT unnest(range(0, 16)) AS perm),
sig AS (
  SELECT d.url, p.perm,
         min({h}) AS sig_val
  FROM dsh d CROSS JOIN perms p
  GROUP BY d.url, p.perm
)
""".format(h=_h60("p.perm::VARCHAR || ':' || d.shash::VARCHAR"))

_BANDS_CTE = """
band_strs AS (
  SELECT url, (perm // 4)::INT AS band_idx,
         string_agg(sig_val::VARCHAR, ',' ORDER BY perm) AS band_str
  FROM sig GROUP BY url, (perm // 4)::INT
),
bands AS (
  SELECT url, band_idx,
         {h} AS band_key
  FROM band_strs
)
""".format(h=_h60("band_idx::VARCHAR || '|' || band_str"))

_CAND_CTE = """
cands AS (
  SELECT DISTINCT a.url AS url_a, b.url AS url_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.url < b.url
)
"""

_JACC_CTE = """
inter AS (
  SELECT c.url_a, c.url_b, count(*) AS n_inter
  FROM cands c
  JOIN dsh a ON a.url = c.url_a
  JOIN dsh b ON b.url = c.url_b AND b.shash = a.shash
  GROUP BY c.url_a, c.url_b
),
jacc AS (
  SELECT i.url_a, i.url_b, i.n_inter,
         sa.n_sh + sb.n_sh - i.n_inter AS n_union,
         (1000000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter)
           AS jaccard_micro
  FROM inter i
  JOIN sh_sizes sa ON sa.url = i.url_a
  JOIN sh_sizes sb ON sb.url = i.url_b
)
"""

# pair gates for the driver table: lang equality (sameType analogue),
# source overlap (noSameLOWTags analogue), diacritics asymmetry
_DIAC = "regexp_matches({t}, '[^ -~,''öäå]')"
_EDGES_CTE = f"""
edges AS (
  SELECT j.url_a, j.url_b, j.jaccard_micro
  FROM jacc j
  JOIN clean pa ON pa.url = j.url_a
  JOIN clean pb ON pb.url = j.url_b
  WHERE j.jaccard_micro >= {JACCARD_MICRO_THRESHOLD}
    AND pa.lang = pb.lang
    AND pa.source <> pb.source
    AND NOT ({_DIAC.format(t='pb.text')} AND NOT {_DIAC.format(t='pa.text')})
)
"""

_CLUSTERS_CTE = """
und AS (
  SELECT url_a AS u, url_b AS v FROM edges
  UNION
  SELECT url_b AS u, url_a AS v FROM edges
),
reach(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u AND r.u <> e.v
),
clusters AS (
  SELECT c.url,
         least(c.url, coalesce(min(r.v), c.url)) AS cluster_id
  FROM clean c LEFT JOIN reach r ON r.u = c.url
  GROUP BY c.url
)
"""

_PIPE_PREFIX = (
    "WITH RECURSIVE "
    + ",".join(
        x.strip().rstrip(",")
        for x in [
            _PAGES_CTE,
            _NORM_CTE,
            _CLEAN_CTE,
            _SHINGLE_CTE,
            _SIG_CTE,
            _BANDS_CTE,
            _CAND_CTE,
            _JACC_CTE,
            _EDGES_CTE,
            _CLUSTERS_CTE,
        ]
    )
)


# ---------------------------------------------------------------------------
# Spark-side builders (production operators, portable mode)
# ---------------------------------------------------------------------------


def _clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = load_pages(spark, sf_dir)
    return quarantine_filter(with_normalized(pages))


def _bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = signatures(_clean(spark, sf_dir), CFG)
    return explode_bands(sigs, CFG)


def _candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, _hot = pairs_from_buckets(
        _bands(spark, sf_dir), ["band_idx", "band_key"], CFG
    )
    return pairs


def _jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    sh = with_shingles(clean, CFG).select("url", "shingles")
    pairs, _hot = pairs_from_buckets(
        explode_bands(signatures(clean, CFG), CFG), ["band_idx", "band_key"], CFG
    )
    sa = sh.select(F.col("url").alias("url_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("url").alias("url_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "url_a")
        .join(sb, "url_b")
        .select(
            "url_a",
            "url_b",
            inter.cast("long").alias("n_inter"),
            uni.cast("long").alias("n_union"),
            F.expr(
                "CAST((1000000 * size(array_intersect(sh_a, sh_b))) div "
                "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
                " AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    jacc = _jaccard(spark, sf_dir)
    clean = _clean(spark, sf_dir)
    feats = clean.select("url", "lang", "source", "has_diacritics")
    fa = feats.select(*[F.col(c).alias(f"a_{c}") for c in feats.columns])
    fb = feats.select(*[F.col(c).alias(f"b_{c}") for c in feats.columns])
    return (
        jacc.join(fa, jacc.url_a == fa.a_url)
        .join(fb, jacc.url_b == fb.b_url)
        .filter(
            (F.col("jaccard_micro") >= JACCARD_MICRO_THRESHOLD)
            & (F.col("a_lang") == F.col("b_lang"))
            & (F.col("a_source") != F.col("b_source"))
            & ~(F.col("b_has_diacritics") & ~F.col("a_has_diacritics"))
        )
        .select("url_a", "url_b", "jaccard_micro")
    )


def _clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dedup.cluster import assignments_with_singletons, connected_components

    edges = _edges(spark, sf_dir).select("url_a", "url_b")
    clean = _clean(spark, sf_dir)
    # count → the driver union-find regime (exercises the small-graph
    # path under the oracle gate; the loop path is oracle-equivalent by
    # the test_cluster equivalence suite)
    assign = connected_components(edges, n_edges=edges.count())
    return assignments_with_singletons(assign, clean.select("url"))


def _survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    assign = _clusters(spark, sf_dir)
    members = assign.join(
        clean.select(
            "url",
            "warc_ts",
            F.length("text").alias("text_len"),
            "lang",
            F.array("source").alias("sources"),
        ),
        "url",
    )
    surv = select_survivors(members, CFG)
    return surv.select(
        "cluster_id",
        "survivor_url",
        F.col("n_members").cast("long").alias("n_members"),
        F.concat_ws(",", "merged_from").alias("merged_from_str"),
        "cluster_key",
    )


# ---------------------------------------------------------------------------
# the query registry
# ---------------------------------------------------------------------------


def q_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = load_pages(spark, sf_dir)
    return pages.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("warc_ts_epoch"),
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )


def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = with_normalized(load_pages(spark, sf_dir))
    return pages.select(
        "url",
        "norm_text",
        F.col("is_deleted").cast("int").alias("is_deleted"),
        F.col("is_truncated").cast("int").alias("is_truncated"),
        F.col("is_suppressed").cast("int").alias("is_suppressed"),
        F.col("has_diacritics").cast("int").alias("has_diacritics"),
    )


def q_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    hashed = clean.select("url", h60(F.col("norm_text")).alias("text_hash"))
    return hashed.groupBy("text_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("url").alias("rep_url"),
    )


def q_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = _clean(spark, sf_dir)
    sh = with_shingles(clean, CFG)
    return sh.select(
        "url",
        F.size("shingles").cast("long").alias("n_shingles"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = signatures(_clean(spark, sf_dir), CFG)
    return sigs.select(
        "url", F.posexplode("sig").alias("perm", "sig_val")
    ).select("url", F.col("perm").cast("long").alias("perm"), "sig_val")


def q_lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bands(spark, sf_dir).select(
        "url", F.col("band_idx").cast("long").alias("band_idx"), "band_key"
    )


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _candidates(spark, sf_dir)


def q_candidate_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard(spark, sf_dir)


def q_verified_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges(spark, sf_dir)


def q_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _clusters(spark, sf_dir)


def q_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _survivors(spark, sf_dir)


# preferredRecordInFENNI analogue active (mergeability-validators.js:
# 69-81): deterministic authority list over the documents table's
# source column — clusters whose non-freshest member carries one of
# these flip their survivor, which the oracle reproduces independently.
AUTHORITY_SOURCES = ("src1", "src3", "src5", "src7", "src9")


def q_authority_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection WITH the authority-source priority wired (the
    production run_dedup path when cfg.authority_sources is set):
    is_authority DESC precedes freshness in the preference window."""
    clean = _clean(spark, sf_dir)
    assign = _clusters(spark, sf_dir)
    members = assign.join(
        clean.select(
            "url",
            "warc_ts",
            F.length("text").alias("text_len"),
            "lang",
            F.array("source").alias("sources"),
        ),
        "url",
    )
    surv = select_survivors(members, CFG, authority_sources=AUTHORITY_SOURCES)
    return surv.select(
        "cluster_id",
        "survivor_url",
        F.col("n_members").cast("long").alias("n_members"),
        F.concat_ws(",", "merged_from").alias("merged_from_str"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = load_pages(spark, sf_dir)
    return pages.select("url", lang_id(F.col("text")).alias("lang_pred"))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = load_pages(spark, sf_dir)
    f = quality_features(F.col("text"))
    return pages.select(
        "url",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["n_alpha"].alias("n_alpha"),
        f["n_punct"].alias("n_punct"),
        F.expr(
            "CAST((length(regexp_replace(text, '[^a-zA-Zåäö]', '')) * 1000000)"
            " div greatest(length(regexp_replace(text, '^\\\\s+|\\\\s+$', '')), 1)"
            " AS BIGINT)"
        ).alias("alpha_ratio_micro"),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable doc fingerprint sample: min/max h60 shingle hash + count —
    the winnowing-style content id the substring channel samples from."""
    clean = _clean(spark, sf_dir)
    sh = with_shingles(clean, CFG)
    return sh.select(
        "url",
        F.array_min("shingles").alias("fp_min"),
        F.array_max("shingles").alias("fp_max"),
        F.size("shingles").cast("long").alias("n_shingles"),
    )


def q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact containment dedup (oracle-checkable formulation): pairs
    where one normalized text appears verbatim inside the other.
    The production channel (winnowing fingerprints, dedup/suffix.py)
    computes the same relation scalably; this query IS the semantics."""
    clean = _clean(spark, sf_dir).select("url", "norm_text")
    a = clean.select(F.col("url").alias("url_a"), F.col("norm_text").alias("t_a"))
    b = clean.select(F.col("url").alias("url_b"), F.col("norm_text").alias("t_b"))
    return (
        a.crossJoin(b)
        .filter(
            (F.col("url_a") != F.col("url_b"))
            & (F.length("t_a") < F.length("t_b"))
            & (F.instr(F.col("t_b"), F.col("t_a")) > 0)
        )
        .select(
            F.col("url_a").alias("contained_url"),
            F.col("url_b").alias("container_url"),
        )
    )


def q_estimate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-estimate pre-filter (dedup/pipeline._estimate_filter) in
    its oracle-checkable portable form: per LSH candidate pair, the
    count of agreeing signature positions and the keep/drop decision at
    estimate_floor — the gate that ships only (num_perm × 8 B)
    signatures through the first join and drops pairs that cannot
    plausibly reach the Jaccard threshold, BEFORE any shingle-array
    join. Production computes the same agreement count over the
    fast-mode signatures in one Arrow kernel (the r6 rewrite of the
    interpreted zip_with chain). Integer micro arithmetic — no
    floats."""
    floor_micro = int(CFG.estimate_floor * 1_000_000)
    cands = _candidates(spark, sf_dir)
    sigs = signatures(_clean(spark, sf_dir), CFG).select("url", "sig")
    sa = sigs.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e
        )
    ).cast("long")
    n_perm = F.size("sig_a").cast("long")
    return (
        cands.join(sa, "url_a")
        .join(sb, "url_b")
        .select(
            "url_a",
            "url_b",
            agree.alias("n_agree"),
            (agree * 1_000_000 >= F.lit(floor_micro) * n_perm)
            .cast("int")
            .alias("keep"),
        )
    )


def q_lcp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed suffix-array shared-passage pass (dedup/suffix.py
    lcp_pairs_distributed, SURVEY.md §7 stage 9): THE PRODUCTION
    OPERATOR, not a spec reformulation — winnowing fingerprints block
    the suffix space, each block runs the exact block-local
    suffix-array kernel in applyInPandas. With min_lcp = 64 ≥
    window + k - 1 the winnowing guarantee makes the block pass equal
    the plain L-gram-sharing relation, which is what the DuckDB oracle
    computes independently (unnest all 64-grams, self-join).
    collapse_exact=False + uncapped blocks on this tiny tier so the
    whole relation is emitted (production defaults collapse exact-dup
    families and cap boilerplate blocks; see the module docstring)."""
    from dedup.suffix import lcp_pairs_distributed

    clean = _clean(spark, sf_dir).select("url", "norm_text")
    cfg = DedupConfig(
        substring_max_bucket=1_000_000_000, lcp_max_blocks_per_doc=None
    )
    return lcp_pairs_distributed(
        clean, cfg, min_lcp=64, collapse_exact=False
    ).select("url_a", "url_b")


def q_simhash_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable weighted-SimHash bit votes: for each url and bit 0..63,
    the frequency-weighted vote margin over h60 token hashes (one vote
    per OCCURRENCE — Manku et al.'s weighted form) and the resulting
    bit. The production 64-bit fingerprint (dedup/simhash.py batched
    numpy kernel) packs exactly these bits; tests/test_simhash_cross
    cross-checks the two."""
    from dedup.simhash import token_hashes_expr

    clean = _clean(spark, sf_dir)
    toks = clean.select(
        "url", F.explode(token_hashes_expr(F.col("norm_text"), CFG)).alias("th")
    )
    bits = spark.range(64).select(F.col("id").cast("int").alias("bit"))
    # SQL form: the DataFrame helper requires a literal shift amount,
    # the SQL function accepts a column
    vote = F.sum(F.expr("(shiftrightunsigned(th, bit) & 1) * 2 - 1"))
    return (
        toks.crossJoin(F.broadcast(bits))
        .groupBy("url", "bit")
        .agg(vote.cast("long").alias("vote"))
        .select(
            "url",
            F.col("bit").cast("long").alias("bit"),
            "vote",
            (F.col("vote") > 0).cast("int").alias("bit_value"),
        )
    )


def q_extent_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inferTypeAndCount over the derived extent column (record-utils.js
    415-478) — the vectorized UDF vs an independent SQL reimplementation."""
    from dedup.infer import infer_type_and_count_udf

    pages = load_pages(spark, sf_dir)
    inf = infer_type_and_count_udf(F.col("extent"))
    return pages.select(
        "url",
        "extent",
        inf["type"].alias("inferred_type"),
        inf["count"].cast("long").alias("inferred_count"),
    )


def q_pair_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production pair-verification gate stack (canMerge
    analogue, marc-record-merge-melindautils.js:84-104) over
    deterministic adjacent-doc pairs: source overlap, type, stop-field
    rules, diacritics, count gate, extent gate — reasons joined in
    evaluation order. Exercises pair_reasons exactly as run_dedup wires
    it (rule_columns + count_columns + extent)."""
    from dedup.pages import pages_sources
    from dedup.verify import attach_features, pair_reasons, url_features

    pages = with_normalized(load_pages(spark, sf_dir))
    feats = url_features(pages, pages_sources(pages))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    u = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc/"),
        F.col("doc_id").cast("string"),
    )
    ids = docs.select(F.col("doc_id"), u.alias("url"))
    pairs = (
        ids.alias("x")
        .join(ids.alias("y"), F.col("x.doc_id") + 1 == F.col("y.doc_id"))
        .select(F.col("x.url").alias("url_a"), F.col("y.url").alias("url_b"))
    )
    out = pair_reasons(
        attach_features(pairs, feats),
        CFG,
        rule_columns={
            t: (f"a_{t}", f"b_{t}")
            for t in ("canonical_links", "meta_tags", "tracking_ids")
        },
        count_columns={"headings": ("a_headings", "b_headings")},
    )
    return out.select(
        "url_a",
        "url_b",
        F.concat_ws("|", "reasons").alias("reasons_str"),
        F.col("can_merge").cast("int").alias("can_merge"),
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return brute_force_topk(emb, queries, k=5).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
        "cosine_micro",
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN END-TO-END at full probe width (dedup/embeddings.py
    ivf_topk): with nprobe == n_centroids every query probes every
    cell, so the candidate set is exactly all (q, c≠q) pairs and the
    production path — deterministic spherical-k-means fit on the
    hash-thinned sample, BLAS cell-assignment kernel, probe-list
    projection, candidate distinct, shared exact fixed-point re-rank —
    must reproduce brute-force top-k bit-for-bit. The oracle computes
    the same all-pairs fixed-point cosine ranking in DuckDB, so any
    plumbing defect that loses, duplicates or mis-scores a candidate
    breaks the match. Recall at nprobe < n_centroids (the approximate
    regime) is measured separately in tests/test_embeddings.py.

    Reference analogue: the ANN channels have no reference counterpart
    (SURVEY §2.2 similarity search: ∅) — this pins the scale path's
    exactness contract at its lossless operating point."""
    from dedup.embeddings import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, k=5, n_centroids=16, nprobe=16).select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
        "cosine_micro",
    )


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup SPEC: all pairs with fixed-point cosine
    ≥ threshold (the production channel, embeddings.embedding_dup_pairs,
    computes the same relation through the multi-table LSH index and is
    parity-tested against planted near-identical vectors)."""
    from dedup.embeddings import _fixed_point, dot_fixed, norm2_fixed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fixed = emb.select(
        "vec_id", _fixed_point(F.col("embedding")).alias("v")
    ).withColumn("n2", norm2_fixed(F.col("v")))
    a = fixed.select(
        F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"),
        F.col("n2").alias("na"),
    )
    b = fixed.select(
        F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"),
        F.col("n2").alias("nb"),
    )
    cos = dot_fixed(F.col("va"), F.col("vb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a", "vec_id_b",
            F.floor(cos * 1000000).cast("long").alias("cosine_micro"),
        )
        .filter(F.col("cosine_micro") >= 400000)
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash channel END-TO-END (guard → fingerprint kernel →
    pigeonhole buckets → exact Hamming verify, dedup/simhash.py
    simhash_channel). With chunks=4 and max_hamming=3 the pigeonhole
    guarantee makes the channel EXACT (any pair within distance
    chunks-1 shares a chunk), so the oracle is a brute-force
    all-pairs Hamming computed from independently-derived SQL bit
    votes — this oracles the channel's PAIRS, not just the
    fingerprints (simhash_bits covers those)."""
    from dedup.simhash import simhash_channel

    clean = _clean(spark, sf_dir)
    pairs, _hot = simhash_channel(clean, CFG)
    return pairs.select(
        "url_a", "url_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both tokenizers (dedup/textstats.py): whitespace
    and the BPE-flavored heuristic (alnum runs + one token per
    punctuation mark)."""
    from dedup.textstats import bpe_ish_token_count

    pages = load_pages(spark, sf_dir)
    return pages.select(
        "url",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_streaming_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming batch-verify tail (dedup/streaming.py
    streaming_verify_tail) end-to-end over DETERMINISTIC stores: the
    clean pages table stands in for the accumulated pages store and the
    LSH band-collision pairs for the near-dup candidate stream. Covers
    exact Jaccard → the full reason-gate stack → connected components →
    singleton fill — the production streaming tail, previously at
    unit-level only (VERDICT r4 #4)."""
    from dedup.pages import pages_sources
    from dedup.streaming import streaming_verify_tail

    pages = load_pages(spark, sf_dir)
    store = quarantine_filter(with_normalized(pages))
    cand = _candidates(spark, sf_dir)
    res = streaming_verify_tail(
        store, cand, CFG, sources=pages_sources(pages)
    )
    out = res.assignments.select("url", "cluster_id")
    # the CC result is localCheckpoint-truncated inside the tail, so
    # releasing the caches here leaves `out` cheap to re-collect
    res.release()
    return out


def q_media_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media (thumbnail-hash) dedup channel END-TO-END
    (dedup/multimodal.py image_thumb_keys + media_dup_pairs): each page
    gets a REAL 24-bit BMP payload generated deterministically from a
    per-url image class, the channel decodes the bytes, downsamples to
    the luma thumbnail key, and expands buckets into candidate pairs
    with the production bucket/star machinery at the DEFAULT bucket cap
    (16) — so this is also the first oracle-level coverage of the
    hot-bucket star expansion (every other oracle query uncaps it; the
    reference analogue is the pre-canMerge candidate listing,
    /root/reference/lib/marc-record-merge-melindautils.js:74-84).

    The oracle replicates the bucket semantics independently in SQL:
    pages pair iff they share the image class; over-cap classes emit
    star pairs around the min-url hub, sub-cap classes all pairs. The
    pixel generator makes distinct classes provably distinct at the
    thumbnail grid's (0,0) sample (cls*37 mod 256 is injective below
    256), so thumbnail identity == class identity and any decode /
    downsample / keying defect breaks the match."""
    from dedup.multimodal import media_dup_pairs

    pages = load_pages(spark, sf_dir)
    keyed = pages.select(
        "url", (h60(F.col("url")) % F.lit(24)).alias("img_cls")
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        from dedup.multimodal import pack_bmp

        for pdf in batches:
            payloads = []
            for cls in pdf["img_cls"]:
                cls = int(cls)
                w = 16 + (cls % 5) * 4
                h = 12 + (cls % 3) * 8
                r = np.arange(h, dtype=np.uint32)[:, None]
                c = np.arange(w, dtype=np.uint32)[None, :]
                v = ((cls * 37 + 11 * r + 7 * c) % 256).astype(np.uint8)
                payloads.append(pack_bmp(v))
            yield pd.DataFrame({"url": pdf["url"], "payload": payloads})

    page_media = keyed.mapInPandas(gen, "url string, payload binary")
    # production DEFAULT cap (16) — unlike CFG, which uncaps buckets so
    # the uncapped-self-join oracles coincide; here the oracle models
    # the cap explicitly
    cfg = DedupConfig(hash_mode="portable")
    pairs, _hot = media_dup_pairs(page_media, cfg)
    return pairs.select("url_a", "url_b")


def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL web-corpus ingest END-TO-END (dedup/pages.py
    load_pages_jsonl): the documents table is deterministically lowered
    to a JSONL landing directory (Spark's JSON writer emits one object
    per line and OMITS null fields — exactly the C4/CC drop contract,
    where optional metadata is an absent key, not an explicit null),
    then read back through the production explicit-schema PERMISSIVE
    reader. Two null channels are exercised: warc_ts_epoch absent when
    doc_id % 11 = 3, lang absent when doc_id % 7 = 2. The returned
    text hash proves the write→read roundtrip is byte-exact (newlines,
    quotes and non-ASCII all pass through JSON escaping); the epoch
    recast proves timestamp_seconds∘cast(long) is the identity under
    the UTC session. The oracle models the derivation directly off the
    documents view, so any reader defect (schema drift, wrong null
    semantics, lossy escaping) breaks the match.

    Reference analogue: the ingest seam where records enter merge
    validation (/root/reference/lib/marc-record-merge-melindautils.js:36-60
    takes already-parsed records; the parse contract lives at the
    caller) — here the contract is pinned as an oracle-checked schema.
    """
    import hashlib

    from dedup.pages import load_pages_jsonl

    docs = load_documents(spark, sf_dir)
    landing = (
        "/tmp/dedup_jsonl_ingest_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    (
        docs.select(
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example/doc/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.when(
                F.col("doc_id") % 11 != 3,
                F.lit(EPOCH_BASE) + F.col("doc_id") * F.lit(TS_STEP_SECONDS),
            ).alias("warc_ts_epoch"),
            "text",
            F.when(F.col("doc_id") % 7 != 2, F.col("lang")).alias("lang"),
            "source",
        )
        .write.mode("overwrite")
        .json(landing)
    )
    pages = load_pages_jsonl(spark, landing)
    return pages.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("warc_ts_epoch"),
        F.length("text").cast("long").alias("n_chars"),
        h60(F.col("text")).alias("text_h"),
        "lang",
        "source",
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC sink → source roundtrip END-TO-END (dedup/warc.py): the
    pages table is lowered to real CC-convention .warc.gz shards
    (member-per-record gzip, executor-side writes via the
    write_warc_shards sink), then read back through the production
    binaryFile + mapInPandas reader, which parses the WARC/HTTP framing
    and re-extracts text from the html payload in the same pass. The
    returned text hash therefore proves the ENTIRE loop — wrapper
    escaping, WARC record framing, per-record gzip, shard listing,
    parse, HTTP split, extraction inverse — is byte-exact per url; the
    epoch recast proves WARC-Date's second-precision ISO form survives.
    The oracle models the derivation directly off the documents view
    and never sees the archive bytes."""
    import hashlib
    import shutil

    from dedup.warc import load_pages_warc, write_warc_shards

    landing = (
        "/tmp/dedup_warc_ingest_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    shutil.rmtree(landing, ignore_errors=True)
    pages = load_pages(spark, sf_dir).select("url", "warc_ts", "html")
    manifest = write_warc_shards(pages, landing, n_shards=8)
    manifest.count()  # materialize the shard writes
    back = load_pages_warc(spark, landing)
    return back.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("warc_ts_epoch"),
        F.length("text").cast("long").alias("n_chars"),
        h60(F.col("text")).alias("text_h"),
    )


def q_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word n-gram Jaccard near-dup channel (dedup/ngram.py
    ngram_dup_pairs) — THE PRODUCTION OPERATOR in portable-hash mode:
    df-capped inverted-index candidate generation, then exact word-
    trigram Jaccard over full distinct gram sets in integer micro
    units. The oracle recomputes the identical relation from the same
    normalized text via DuckDB list functions."""
    from dedup.ngram import ngram_dup_pairs

    clean = _clean(spark, sf_dir).select("url", "norm_text")
    pairs, _hot = ngram_dup_pairs(clean, CFG)
    return pairs


def q_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window crawl statistics (dedup/streaming.py
    crawl_window_stats) in its batch form — THE SAME expression the
    streaming monitor runs with a watermark attached (late-data
    semantics are unit-tested on a real stream in test_streaming; the
    aggregation itself is oracle-checked here). Spark's window() aligns
    tumbling windows to the Unix epoch, which the oracle reproduces
    with integer floor division."""
    from dedup.streaming import crawl_window_stats

    return crawl_window_stats(load_pages(spark, sf_dir), window="1 hour")


QUERIES = {
    "pages_derivation": q_pages,
    "normalize_flags": q_normalize,
    "exact_dup_groups": q_exact_groups,
    "shingle_stats": q_shingle_stats,
    "minhash_signatures": q_minhash_sig,
    "lsh_bands": q_lsh_bands,
    "lsh_candidates": q_lsh_candidates,
    "candidate_jaccard": q_candidate_jaccard,
    "verified_edges": q_verified_edges,
    "dedup_clusters": q_clusters,
    "survivor_selection": q_survivors,
    "lang_id": q_lang_id,
    "quality_features": q_quality,
    "doc_fingerprint": q_fingerprint,
    "substring_containment": q_substring_pairs,
    "simhash_bits": q_simhash_bits,
    "knn_cosine_topk": q_knn_cosine,
    "ivf_topk_exact": q_ivf_topk,
    "extent_inference": q_extent_infer,
    "pair_gate_reasons": q_pair_gates,
    "embedding_dup_pairs": q_embedding_dups,
    "lcp_shared_passages": q_lcp_pairs,
    "estimate_agreement": q_estimate_agreement,
    "authority_survivors": q_authority_survivors,
    "simhash_dup_pairs": q_simhash_pairs,
    "token_counts": q_token_counts,
    "streaming_clusters": q_streaming_clusters,
    "media_dup_pairs": q_media_pairs,
    "jsonl_ingest": q_jsonl_ingest,
    "warc_ingest": q_warc_ingest,
    "ngram_dup_pairs": q_ngram_pairs,
    "crawl_window_stats": q_window_stats,
}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {}

ORACLES["pages_derivation"] = f"""
WITH {_PAGES_CTE.strip()}
SELECT url, warc_ts_epoch, lang, source, length(text)::BIGINT AS n_chars
FROM pages
"""

ORACLES["normalize_flags"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}
SELECT url, norm_text,
       (text IS NULL OR trim(text) = '')::INT AS is_deleted,
       starts_with(text, '^^')::INT AS is_truncated,
       contains(lower(text), 'noindex')::INT AS is_suppressed,
       regexp_matches(text, '[^ -~,''öäå]')::INT AS has_diacritics
FROM normalized
"""

ORACLES["exact_dup_groups"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()}
SELECT {_h60('norm_text')} AS text_hash,
       count(*)::BIGINT AS n_docs, min(url) AS rep_url
FROM clean GROUP BY 1
"""

ORACLES["shingle_stats"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}
SELECT c.url, s.n_sh::BIGINT AS n_shingles,
       CASE WHEN c.text IS NULL
                 OR length(regexp_replace(c.text, '^\\s+|\\s+$', '', 'g')) = 0
            THEN 0
            ELSE length(regexp_split_to_array(
                   regexp_replace(c.text, '^\\s+|\\s+$', '', 'g'),
                   '\\s+')::VARCHAR[])
       END::BIGINT AS n_tokens
FROM clean c JOIN sh_sizes s ON s.url = c.url
"""

ORACLES["minhash_signatures"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}
SELECT url, perm::BIGINT AS perm, sig_val FROM sig
"""

ORACLES["lsh_bands"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}, {_BANDS_CTE.strip()}
SELECT url, band_idx::BIGINT AS band_idx, band_key FROM bands
"""

ORACLES["lsh_candidates"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}, {_BANDS_CTE.strip()},
{_CAND_CTE.strip()}
SELECT url_a, url_b FROM cands
"""

ORACLES["candidate_jaccard"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}, {_BANDS_CTE.strip()},
{_CAND_CTE.strip()}, {_JACC_CTE.strip()}
SELECT url_a, url_b, n_inter::BIGINT AS n_inter, n_union::BIGINT AS n_union,
       jaccard_micro::BIGINT AS jaccard_micro
FROM jacc
"""

ORACLES["verified_edges"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}, {_BANDS_CTE.strip()},
{_CAND_CTE.strip()}, {_JACC_CTE.strip()}, {_EDGES_CTE.strip()}
SELECT url_a, url_b, jaccard_micro::BIGINT AS jaccard_micro FROM edges
"""

ORACLES["dedup_clusters"] = f"""
{_PIPE_PREFIX}
SELECT url, cluster_id FROM clusters
"""

_LANG_RANK_SQL = """
CASE lang WHEN 'fi' THEN 0 WHEN 'sv' THEN 1 WHEN 'en' THEN 2 WHEN 'de' THEN 3
          WHEN 'fr' THEN 4 WHEN 'es' THEN 5 WHEN 'zh' THEN 6 ELSE 7 END
"""

ORACLES["survivor_selection"] = f"""
{_PIPE_PREFIX},
members AS (
  SELECT cl.url, cl.cluster_id, c.warc_ts_epoch, length(c.text) AS text_len,
         c.lang, {_LANG_RANK_SQL.strip()} AS lang_rank
  FROM clusters cl JOIN clean c ON c.url = cl.url
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id
    ORDER BY warc_ts_epoch DESC, text_len DESC, lang_rank ASC, url ASC
  ) AS rn
  FROM members
),
rollup AS (
  SELECT cluster_id, count(*)::BIGINT AS n_members,
         string_agg(url, ',' ORDER BY url) AS merged_from_str,
         md5(string_agg(url, chr(10) ORDER BY url)) AS cluster_key
  FROM members GROUP BY cluster_id
)
SELECT r.cluster_id, rk.url AS survivor_url, r.n_members, r.merged_from_str,
       r.cluster_key
FROM rollup r JOIN ranked rk ON rk.cluster_id = r.cluster_id AND rk.rn = 1
"""

ORACLES["authority_survivors"] = f"""
{_PIPE_PREFIX},
members AS (
  SELECT cl.url, cl.cluster_id, c.warc_ts_epoch, length(c.text) AS text_len,
         c.lang, {_LANG_RANK_SQL.strip()} AS lang_rank,
         (c.source IN ('src1', 'src3', 'src5', 'src7', 'src9'))::INT AS is_auth
  FROM clusters cl JOIN clean c ON c.url = cl.url
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id
    ORDER BY is_auth DESC, warc_ts_epoch DESC, text_len DESC,
             lang_rank ASC, url ASC
  ) AS rn
  FROM members
),
rollup AS (
  SELECT cluster_id, count(*)::BIGINT AS n_members,
         string_agg(url, ',' ORDER BY url) AS merged_from_str
  FROM members GROUP BY cluster_id
)
SELECT r.cluster_id, rk.url AS survivor_url, r.n_members, r.merged_from_str
FROM rollup r JOIN ranked rk ON rk.cluster_id = r.cluster_id AND rk.rn = 1
"""

_LANG_SCORE_SQL = """
lang_scores AS (
  SELECT url, l.lang,
         {scores} AS score
  FROM pages, (VALUES ('en'), ('de'), ('fr'), ('es'), ('fi'), ('sv')) l(lang)
)
"""


def _occurrences_sql(token: str) -> str:
    # spaces doubled before matching, mirroring textstats
    # ._count_occurrences: adjacent repeats must each own both
    # delimiting spaces or non-overlapping replace() undercounts
    needle = f" {token} "
    spaced = "' ' || replace(lower(text), ' ', '  ') || ' '"
    return (
        f"((length({spaced}) - "
        f"length(replace({spaced}, '{needle}', '')))"
        f" / {len(needle)})::BIGINT"
    )


_MARKER_SQL = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
    "fi": ["ja", "on", "ei", "että", "joka"],
    "sv": ["och", "att", "det", "som", "en"],
}

_LANG_CASES = " ".join(
    "WHEN '{lang}' THEN ({expr})".format(
        lang=lang, expr=" + ".join(_occurrences_sql(w) for w in words)
    )
    for lang, words in _MARKER_SQL.items()
)

ORACLES["lang_id"] = f"""
WITH {_PAGES_CTE.strip()},
scores AS (
  SELECT url, l.lang, (CASE l.lang {_LANG_CASES} ELSE 0 END) AS score
  FROM pages, (VALUES ('de'), ('en'), ('es'), ('fi'), ('fr'), ('sv')) l(lang)
),
best AS (
  SELECT url, lang, score,
         row_number() OVER (PARTITION BY url ORDER BY score DESC, lang DESC)
           AS rn
  FROM scores
)
SELECT url, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
FROM best WHERE rn = 1
"""

ORACLES["quality_features"] = f"""
WITH {_PAGES_CTE.strip()}
SELECT url,
       length(regexp_replace(text, '^\\s+|\\s+$', '', 'g'))::BIGINT AS n_chars,
       (CASE WHEN text IS NULL
                  OR length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0
             THEN 0
             ELSE length(regexp_split_to_array(
                    regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                    '\\s+')::VARCHAR[])
        END)::BIGINT AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Zåäö]', '', 'g'))::BIGINT
         AS n_alpha,
       length(regexp_replace(text, '[^.,!?;:]', '', 'g'))::BIGINT
         AS n_punct,
       ((length(regexp_replace(text, '[^a-zA-Zåäö]', '', 'g')) * 1000000)
        // greatest(length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')), 1)
       )::BIGINT AS alpha_ratio_micro
FROM pages
"""

ORACLES["doc_fingerprint"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}
SELECT url, min(shash) AS fp_min, max(shash) AS fp_max,
       count(*)::BIGINT AS n_shingles
FROM dsh GROUP BY url
"""

ORACLES["substring_containment"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()}
SELECT a.url AS contained_url, b.url AS container_url
FROM clean a JOIN clean b
  ON a.url <> b.url
 AND length(a.norm_text) < length(b.norm_text)
 AND position(a.norm_text IN b.norm_text) > 0
"""

ORACLES["estimate_agreement"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
{_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()}, {_BANDS_CTE.strip()},
{_CAND_CTE.strip()}
SELECT c.url_a, c.url_b,
       sum((sa.sig_val = sb.sig_val)::INT)::BIGINT AS n_agree,
       (sum((sa.sig_val = sb.sig_val)::INT) * 1000000
          >= {int(CFG.estimate_floor * 1_000_000)} * count(*))::INT AS keep
FROM cands c
JOIN sig sa ON sa.url = c.url_a
JOIN sig sb ON sb.url = c.url_b AND sb.perm = sa.perm
GROUP BY c.url_a, c.url_b
"""

ORACLES["lcp_shared_passages"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
grams AS (
  SELECT DISTINCT url, g FROM (
    SELECT url,
           unnest(list_transform(range(1, greatest(length(norm_text) - 63, 0) + 1),
                                 i -> substr(norm_text, i::INT, 64))) AS g
    FROM clean WHERE length(norm_text) >= 64
  )
)
SELECT DISTINCT a.url AS url_a, b.url AS url_b
FROM grams a JOIN grams b ON a.g = b.g AND a.url < b.url
"""

ORACLES["simhash_bits"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
toks AS (
  SELECT url, {_h60("tok")} AS th
  FROM (SELECT url, unnest(string_split(norm_text, ' ')) AS tok FROM clean)
),
bits AS (SELECT unnest(range(0, 64))::INT AS bit)
SELECT t.url, b.bit::BIGINT AS bit,
       sum(((t.th >> b.bit) & 1) * 2 - 1)::BIGINT AS vote,
       (sum(((t.th >> b.bit) & 1) * 2 - 1) > 0)::INT AS bit_value
FROM toks t CROSS JOIN bits b
GROUP BY t.url, b.bit
"""

ORACLES["extent_inference"] = f"""
WITH {_PAGES_CTE.strip()}
SELECT url, extent,
       CASE WHEN {_INFER_COUNT_SQL.format(x='extent').strip()} IS NOT NULL
            THEN 'volume' ELSE NULL END AS inferred_type,
       ({_INFER_COUNT_SQL.format(x='extent').strip()})::BIGINT AS inferred_count
FROM pages
"""

# pair_gate_reasons: independent SQL reimplementation of the full
# canMerge gate stack over adjacent-doc pairs. Containment under the
# normalizing comparator uses set semantics (list_has_all) — the derived
# arrays have unique elements, where multiset == set containment.
_GATE_NORM = "list_transform({x}, v -> trim(regexp_replace(lower(v), '[^a-z0-9åäö]+', ' ', 'g')))"
_EXTENT_SQL = (
    "(CASE WHEN doc_id % 7 = 0 THEN ((doc_id % 4 + 1)::VARCHAR || ' nid.') "
    "WHEN doc_id % 7 = 1 THEN 'XV, 514 s. :' "
    "WHEN doc_id % 7 = 2 THEN 'kartta' "
    "ELSE NULL END)"
)
_EXTENT_CNT = _INFER_COUNT_SQL.format(x=_EXTENT_SQL).strip()

# the full gate-reason list (canMerge analogue) over a_*/b_* pair
# columns — shared by the pair_gate_reasons oracle (adjacent-doc pairs)
# and the streaming_clusters oracle (LSH candidate pairs)
_REASONS_LIST = f"""list_filter([
      -- noSameLOWTags
      CASE WHEN a_src = b_src
           THEN 'Both records have have LOW tag: ' || a_src END,
      -- sameType
      CASE WHEN b_lang <> a_lang
           THEN 'Records are of different type (leader/6): ' || b_lang ||
                ' - ' || a_lang END,
      -- canonical_links: identical | preferredIsSupersetExceptIfEmpty
      CASE WHEN list_sort(a_cl) <> list_sort(b_cl)
            AND len(a_cl) > 0
            AND list_has_all({_GATE_NORM.format(x='b_cl')},
                             {_GATE_NORM.format(x='a_cl')})
           THEN 'Preferred record has stopfields and they are a subset of ' ||
                'the other record in field: canonical_links' END,
      CASE WHEN list_sort(a_cl) <> list_sort(b_cl)
            AND len(a_cl) > 0
            AND NOT list_has_all({_GATE_NORM.format(x='a_cl')},
                                 {_GATE_NORM.format(x='b_cl')})
           THEN 'Other is not subset: canonical_links' END,
      -- meta_tags: identical | otherHas (fallback only)
      CASE WHEN list_sort(a_mt) <> list_sort(b_mt)
            AND len(a_mt) > 0 AND len(b_mt) > 0
           THEN 'Both records have differing stop fields. Automated ' ||
                'handling is not currently possible for: meta_tags' END,
      -- tracking_ids: neitherHas (fallback, else presence reasons)
      CASE WHEN len(a_ti) > 0 AND len(b_ti) > 0
            AND list_sort(a_ti) <> list_sort(b_ti)
           THEN 'Both records have differing stop fields. Automated ' ||
                'handling is not currently possible for: tracking_ids' END,
      CASE WHEN NOT (len(a_ti) > 0 AND len(b_ti) > 0
                     AND list_sort(a_ti) <> list_sort(b_ti))
            AND len(b_ti) > 0
           THEN 'Other record has stop fields. Automated handling is not ' ||
                'currently possible for: tracking_ids' END,
      CASE WHEN NOT (len(a_ti) > 0 AND len(b_ti) > 0
                     AND list_sort(a_ti) <> list_sort(b_ti))
            AND len(a_ti) > 0
           THEN 'Preferred record has stop fields. Automated handling is ' ||
                'not currently possible for: tracking_ids' END,
      -- checkDiacriticsFromTitle
      CASE WHEN b_diac AND NOT a_diac
           THEN 'Other fields has diacritics in field: text' END,
      -- sameAuthorType count gate
      CASE WHEN len(a_hd) <> len(b_hd)
           THEN 'Field count mismatch for field headings' END,
      -- toAuthorityQueryObject multiplicity guard (record-utils.js:60-63)
      CASE WHEN len(a_hd) > 1
           THEN 'Record has multiple names: ' || array_to_string(a_hd, ',') END,
      CASE WHEN len(b_hd) > 1
           THEN 'Record has multiple names: ' || array_to_string(b_hd, ',') END,
      -- same300TypeAndCount
      CASE WHEN (a_ext IS NOT NULL OR b_ext IS NOT NULL)
            AND (a_ext IS DISTINCT FROM b_ext)
           THEN CASE
             WHEN a_cnt IS NULL AND b_cnt IS NULL
               THEN 'Could not infer the meaning of 300a.'
             WHEN a_cnt IS NOT NULL AND b_cnt IS NOT NULL AND b_cnt <> a_cnt
               THEN 'Records have different inferred count of types ' ||
                    '(from field 300a): ' || b_cnt::VARCHAR || ' - ' ||
                    a_cnt::VARCHAR
           END END
    ], x -> x IS NOT NULL)"""

ORACLES["pair_gate_reasons"] = f"""
WITH dpages AS (
  SELECT doc_id,
         'https://' || source || '.example/doc/' || doc_id::VARCHAR AS url,
         text, lang, source,
         CASE WHEN doc_id % 5 = 0
              THEN ['https://canon.example/' || md5(text)]
              ELSE []::VARCHAR[] END AS cl,
         CASE WHEN doc_id % 3 = 0
              THEN ['og:lang=' || lang] ELSE []::VARCHAR[] END AS mt,
         CASE WHEN doc_id % 37 = 0
              THEN ['trk-' || doc_id::VARCHAR]
              ELSE []::VARCHAR[] END AS ti,
         CASE WHEN doc_id % 29 = 0
              THEN [substr(text, 1, 24), 'h2']
              ELSE [substr(text, 1, 24)] END AS hd,
         {_EXTENT_SQL} AS extent,
         regexp_matches(text, '[^ -~,''öäå]') AS diac,
         {_EXTENT_CNT} AS vol_cnt
  FROM documents
),
prs AS (
  SELECT a.url AS url_a, b.url AS url_b,
         a.source AS a_src, b.source AS b_src,
         a.lang AS a_lang, b.lang AS b_lang,
         a.diac AS a_diac, b.diac AS b_diac,
         a.cl AS a_cl, b.cl AS b_cl,
         a.mt AS a_mt, b.mt AS b_mt,
         a.ti AS a_ti, b.ti AS b_ti,
         a.hd AS a_hd, b.hd AS b_hd,
         a.extent AS a_ext, b.extent AS b_ext,
         a.vol_cnt AS a_cnt, b.vol_cnt AS b_cnt
  FROM dpages a JOIN dpages b ON a.doc_id + 1 = b.doc_id
),
reasons AS (
  SELECT url_a, url_b,
    {_REASONS_LIST} AS rs
  FROM prs
)
SELECT url_a, url_b,
       coalesce(array_to_string(rs, '|'), '') AS reasons_str,
       (len(rs) = 0)::INT AS can_merge
FROM reasons
"""

# streaming_verify_tail over deterministic stores: LSH candidates ->
# jaccard >= threshold -> the FULL gate stack (shared _REASONS_LIST) ->
# transitive closure -> min-url cluster labels with singleton fill.
# The integer-micro threshold equals the production double compare:
# (1000000*n_i)//n_u >= 800000  <=>  n_i/n_u >= 0.8 exactly.
ORACLES["streaming_clusters"] = f"""
WITH RECURSIVE {_PAGES_CTE.strip()}, {_NORM_CTE.strip()},
{_CLEAN_CTE.strip()}, {_SHINGLE_CTE.strip()}, {_SIG_CTE.strip()},
{_BANDS_CTE.strip()}, {_CAND_CTE.strip()}, {_JACC_CTE.strip()},
gfeat AS (
  SELECT p.url, p.source AS src, p.lang,
         regexp_matches(p.text, '[^ -~,''öäå]') AS diac,
         p.canonical_links AS cl, p.meta_tags AS mt,
         p.tracking_ids AS ti, p.headings AS hd, p.extent AS ext,
         {_INFER_COUNT_SQL.format(x="p.extent").strip()} AS cnt
  FROM pages p
),
sprs AS (
  SELECT j.url_a, j.url_b,
         a.src AS a_src, b.src AS b_src,
         a.lang AS a_lang, b.lang AS b_lang,
         a.diac AS a_diac, b.diac AS b_diac,
         a.cl AS a_cl, b.cl AS b_cl,
         a.mt AS a_mt, b.mt AS b_mt,
         a.ti AS a_ti, b.ti AS b_ti,
         a.hd AS a_hd, b.hd AS b_hd,
         a.ext AS a_ext, b.ext AS b_ext,
         a.cnt AS a_cnt, b.cnt AS b_cnt
  FROM jacc j
  JOIN gfeat a ON a.url = j.url_a
  JOIN gfeat b ON b.url = j.url_b
  WHERE j.jaccard_micro >= {JACCARD_MICRO_THRESHOLD}
),
sreasons AS (
  SELECT url_a, url_b, {_REASONS_LIST} AS rs FROM sprs
),
edges AS (SELECT url_a, url_b FROM sreasons WHERE len(rs) = 0),
{_CLUSTERS_CTE.strip()}
SELECT url, cluster_id FROM clusters
"""

ORACLES["embedding_dup_pairs"] = """
WITH fixed AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1048576)::BIGINT) AS v
  FROM embeddings
),
exploded AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM fixed
),
norms AS (
  SELECT vec_id, sum(val * val)::BIGINT AS n2 FROM exploded GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         sum(a.val * b.val)::BIGINT AS dot
  FROM exploded a JOIN exploded b ON a.dim = b.dim AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT d.vec_id_a::BIGINT AS vec_id_a, d.vec_id_b::BIGINT AS vec_id_b,
       floor(d.dot / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) * 1000000)
         ::BIGINT AS cosine_micro
FROM dots d
JOIN norms na ON na.vec_id = d.vec_id_a
JOIN norms nb ON nb.vec_id = d.vec_id_b
WHERE floor(d.dot / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) * 1000000)
      >= 400000
"""

ORACLES["knn_cosine_topk"] = """
WITH fixed AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1048576)::BIGINT) AS v
  FROM embeddings
),
exploded AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val
  FROM fixed
),
norms AS (
  SELECT vec_id, sum(val * val)::BIGINT AS n2 FROM exploded GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, sum(q.val * c.val)::BIGINT AS dot
  FROM exploded q JOIN exploded c ON q.dim = c.dim AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
  GROUP BY q.vec_id, c.vec_id
),
scored AS (
  SELECT d.q_id, d.vec_id,
         floor(d.dot / (sqrt(nq.n2::DOUBLE) * sqrt(nc.n2::DOUBLE)) * 1000000)
           ::BIGINT AS cosine_micro
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms nc ON nc.vec_id = d.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cosine_micro DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id::BIGINT AS q_id, vec_id::BIGINT AS vec_id, rank::BIGINT AS rank,
       cosine_micro
FROM ranked WHERE rank <= 5
"""

# ivf_topk_exact: the SAME all-pairs fixed-point cosine ranking as the
# knn oracle, but over EVERY query (no q_id < 10 filter) — at
# nprobe == n_centroids the IVF path's candidate set is all pairs, so
# its output must equal this exact relation.
ORACLES["ivf_topk_exact"] = """
WITH fixed AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1048576)::BIGINT) AS v
  FROM embeddings
),
exploded AS (
  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val
  FROM fixed
),
norms AS (
  SELECT vec_id, sum(val * val)::BIGINT AS n2 FROM exploded GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, sum(q.val * c.val)::BIGINT AS dot
  FROM exploded q JOIN exploded c ON q.dim = c.dim AND q.vec_id <> c.vec_id
  GROUP BY q.vec_id, c.vec_id
),
scored AS (
  SELECT d.q_id, d.vec_id,
         floor(d.dot / (sqrt(nq.n2::DOUBLE) * sqrt(nc.n2::DOUBLE)) * 1000000)
           ::BIGINT AS cosine_micro
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms nc ON nc.vec_id = d.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cosine_micro DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id::BIGINT AS q_id, vec_id::BIGINT AS vec_id, rank::BIGINT AS rank,
       cosine_micro
FROM ranked WHERE rank <= 5
"""

# simhash_dup_pairs: brute-force Hamming over independently-derived bit
# votes (per-bit compare instead of packed int64 xor — sidesteps the
# sign bit). Eligibility mirrors the channel's short-doc guard
# (simhash_min_len=64 on the normalized text). chunks=4 / max_hamming=3
# ⇒ pigeonhole-exact, so channel output == this spec relation.
ORACLES["simhash_dup_pairs"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
elig AS (SELECT url, norm_text FROM clean WHERE length(norm_text) >= 64),
toks AS (
  SELECT url, {_h60("tok")} AS th
  FROM (SELECT url, unnest(string_split(norm_text, ' ')) AS tok FROM elig)
),
bits AS (SELECT unnest(range(0, 64))::INT AS bit),
fp AS (
  SELECT t.url, b.bit,
         (sum(((t.th >> b.bit) & 1) * 2 - 1) > 0)::INT AS bv
  FROM toks t CROSS JOIN bits b
  GROUP BY t.url, b.bit
)
SELECT a.url AS url_a, b.url AS url_b,
       sum(CASE WHEN a.bv <> b.bv THEN 1 ELSE 0 END)::BIGINT AS hamming
FROM fp a JOIN fp b ON a.bit = b.bit AND a.url < b.url
GROUP BY a.url, b.url
HAVING sum(CASE WHEN a.bv <> b.bv THEN 1 ELSE 0 END) <= 3
"""

ORACLES["token_counts"] = f"""
WITH {_PAGES_CTE.strip()}
SELECT url,
       CASE WHEN text IS NULL
                 OR length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0
            THEN 0
            ELSE len(regexp_split_to_array(
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
       END::BIGINT AS ws_tokens,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(list_filter(
                   regexp_split_to_array(text, '[^0-9A-Za-zÀ-ÿ]+'),
                   s -> len(s) > 0))
                 + length(regexp_replace(text, '[0-9A-Za-zÀ-ÿ\\s]+', '', 'g'))
       END::BIGINT AS bpe_tokens
FROM pages
"""

ORACLES["media_dup_pairs"] = f"""
WITH {_PAGES_CTE.strip()},
keyed AS (
  SELECT url, ({_h60('url')} % 24) AS cls FROM pages
),
stats AS (
  SELECT cls, count(*) AS n, min(url) AS hub FROM keyed GROUP BY cls
),
small_pairs AS (
  SELECT a.url AS url_a, b.url AS url_b
  FROM keyed a
  JOIN keyed b ON a.cls = b.cls AND a.url < b.url
  JOIN stats s ON s.cls = a.cls
  WHERE s.n <= 16
),
star_pairs AS (
  SELECT s.hub AS url_a, k.url AS url_b
  FROM keyed k JOIN stats s ON s.cls = k.cls
  WHERE s.n > 16 AND k.url <> s.hub
)
SELECT url_a, url_b FROM small_pairs
UNION
SELECT url_a, url_b FROM star_pairs
"""

# the oracle models the JSONL lowering + explicit-schema read directly
# off the documents view: the Spark side must reproduce these values
# through an actual write→read roundtrip of the landing files
ORACLES["jsonl_ingest"] = f"""
SELECT 'https://' || source || '.example/doc/' || doc_id::VARCHAR AS url,
       CASE WHEN doc_id % 11 <> 3
            THEN (1704067200 + doc_id * 60) END::BIGINT AS warc_ts_epoch,
       length(text)::BIGINT AS n_chars,
       {_h60('text')} AS text_h,
       CASE WHEN doc_id % 7 <> 2 THEN lang END AS lang,
       source
FROM documents
"""

# models the sink→source WARC roundtrip: the Spark side must reproduce
# these values through real archive bytes (framing + gzip + extraction)
ORACLES["warc_ingest"] = f"""
SELECT 'https://' || source || '.example/doc/' || doc_id::VARCHAR AS url,
       (1704067200 + doc_id * 60)::BIGINT AS warc_ts_epoch,
       length(text)::BIGINT AS n_chars,
       {_h60('text')} AS text_h
FROM documents
"""


# word n-gram Jaccard channel: identical relation from the same
# normalized text via DuckDB list functions. Slicing note: DuckDB list
# slices are 1-based INCLUSIVE (w[i:i+n-1] is an n-gram); parameters
# come from the shared CFG so Spark and oracle can't drift.
_NG_N = CFG.ngram_n
_NG_THR_MICRO = int(round(CFG.ngram_jaccard_threshold * 1_000_000))
ORACLES["ngram_dup_pairs"] = f"""
WITH {_PAGES_CTE.strip()}, {_NORM_CTE.strip()}, {_CLEAN_CTE.strip()},
words AS (
  SELECT url, string_split(norm_text, ' ') AS w
  FROM clean WHERE length(norm_text) > 0
),
gramstr AS (
  SELECT url,
         unnest(list_transform(range(1, len(w) - {_NG_N} + 2),
                i -> array_to_string(w[i:i+{_NG_N - 1}], ' '))) AS g
  FROM words WHERE len(w) >= {_NG_N}
),
grams AS (SELECT DISTINCT url, {_h60('g')} AS ghash FROM gramstr),
gdf AS (SELECT ghash, count(*) AS df FROM grams GROUP BY 1),
rare AS (
  SELECT g.url, g.ghash FROM grams g
  JOIN gdf d ON d.ghash = g.ghash AND d.df <= {CFG.ngram_df_cap}
),
cand AS (
  SELECT DISTINCT a.url AS url_a, b.url AS url_b
  FROM rare a JOIN rare b ON a.ghash = b.ghash AND a.url < b.url
),
sizes AS (SELECT url, count(*) AS n FROM grams GROUP BY url),
inter AS (
  SELECT c.url_a, c.url_b, count(*) AS n_inter
  FROM cand c
  JOIN grams a ON a.url = c.url_a
  JOIN grams b ON b.url = c.url_b AND b.ghash = a.ghash
  GROUP BY 1, 2
)
SELECT i.url_a, i.url_b, i.n_inter::BIGINT AS n_inter,
       (sa.n + sb.n - i.n_inter)::BIGINT AS n_union,
       ((1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter))::BIGINT
         AS jaccard_micro
FROM inter i
JOIN sizes sa ON sa.url = i.url_a
JOIN sizes sb ON sb.url = i.url_b
WHERE (1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter)
      >= {_NG_THR_MICRO}
"""


# tumbling-window crawl stats: Spark's window() aligns to the Unix
# epoch; integer floor division reproduces the same buckets
ORACLES["crawl_window_stats"] = f"""
WITH {_PAGES_CTE.strip()}
SELECT ((warc_ts_epoch // 3600) * 3600)::BIGINT AS window_start_epoch,
       ((warc_ts_epoch // 3600) * 3600 + 3600)::BIGINT AS window_end_epoch,
       lang,
       count(*)::BIGINT AS n_docs,
       sum(length(text))::BIGINT AS n_chars,
       min(warc_ts_epoch)::BIGINT AS first_ts_epoch,
       max(warc_ts_epoch)::BIGINT AS last_ts_epoch
FROM pages
GROUP BY 1, 2, 3
"""
