"""Pair verification (SURVEY.md §7 stage 5).

Mirrors canMerge (lib/marc-record-merge-melindautils.js:74-120): every
validator contributes zero or more reason strings to a `reasons` array
column; a pair is mergeable iff the array is empty. Reason strings
reproduce the reference messages byte-for-byte (incl. the 'have have'
typo, mergeability-validators.js:60) because golden tests compare exact
text. No short-circuiting — all reasons are always evaluated, like the
reference's accumulate-then-join (marc-record-merge-melindautils.js:
84-104,116-118).

Scale notes: verification is a projection over the candidate-pair DF —
the only joins are (1) two hash joins to attach per-url features (url is
~unique ⇒ no skew) and (2) a broadcast anti/semi-join against the tiny
host_ids side table (the rebuild of the per-record X-server RPC,
mergeability-validators.js:215-219 — decorrelated into one broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dedup.config import DedupConfig
from dedup.exprcache import memo
from dedup.rules import validate_fields_reasons

MERGE_ERROR_PREFIX = "MergeValidationError: "


# optional per-page columns carried into pair verification when present:
# rule-engine array fields (checkFieldRequirements analogues), count-gate
# fields (sameAuthorType/identicalCount analogues), the physical-extent
# string (same300TypeAndCount analogue), component flag, surrogate-id
# back-reference.
OPTIONAL_FEATURE_COLS = (
    "is_component",
    "real_url",
    "canonical_links",
    "meta_tags",
    "tracking_ids",
    "headings",
    "extent",
)


def url_features(
    pages_with_norm: DataFrame,
    sources: DataFrame | None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-url feature table consumed by pair verification.

    pages_with_norm: output of normalize.with_normalized (+ optional
    columns per OPTIONAL_FEATURE_COLS).
    sources: (url, source, source_local_id) side table; None ⇒ no
    source-overlap guard.
    extra_cols: additional page columns to carry (configured
    field_rules/count_fields targets outside the built-in optional
    set — without this, a custom rule on a present column would
    reference an a_/b_ column the features never attached).
    """
    text_len = (
        F.col("text_len")
        if "text_len" in pages_with_norm.columns
        else F.length("text")
    )
    cols = [
        F.col("url"),
        F.col("lang"),
        F.col("has_diacritics"),
        F.col("warc_ts"),
        text_len.alias("text_len"),
    ]
    opt = [c for c in OPTIONAL_FEATURE_COLS if c in pages_with_norm.columns]
    opt += [
        c for c in extra_cols
        if c in pages_with_norm.columns and c not in opt
    ]
    df = pages_with_norm.select(*cols, *opt)
    if "extent" in df.columns:
        # inferTypeAndCount once per url (vectorized), not once per pair
        from dedup.infer import infer_type_and_count_udf

        df = df.withColumn(
            "extent_inferred", infer_type_and_count_udf(F.col("extent"))
        )
    if sources is not None:
        agg = sources.groupBy("url").agg(
            F.sort_array(F.collect_set("source")).alias("sources")
        )
        df = df.join(agg, "url", "left")
    else:
        df = df.withColumn("sources", F.array().cast("array<string>"))
    return df.withColumn("sources", F.coalesce("sources", F.array().cast("array<string>")))


def attach_features(candidates: DataFrame, features: DataFrame) -> DataFrame:
    """candidates(url_a, url_b) ⨝ features twice → prefixed columns."""
    fa = features.select([F.col(c).alias(f"a_{c}") for c in features.columns])
    fb = features.select([F.col(c).alias(f"b_{c}") for c in features.columns])
    return (
        candidates.join(fa, candidates.url_a == fa.a_url, "left")
        .drop("a_url")
        .join(fb, candidates.url_b == fb.b_url, "left")
        .drop("b_url")
    )


def _reason_when(cond: Column, msg: Column) -> Column:
    return F.when(cond, F.array(msg)).otherwise(F.array().cast("array<string>"))


def pair_reasons(
    pairs: DataFrame,
    cfg: DedupConfig,
    host_ids: DataFrame | None = None,
    rule_columns: dict[str, tuple[str, str]] | None = None,
    count_columns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Adds `reasons: array<string>` + `can_merge: boolean`.

    pairs must carry the a_/b_ prefixed feature columns from
    attach_features. In a pair, side `b` plays "other" and side `a`
    plays "preferred" (a = lexicographically-smaller url, the merge
    base by convention; survivor selection later re-decides).
    """
    has_real_url = "a_real_url" in pairs.columns
    has_extent = "a_extent" in pairs.columns
    has_component = "a_is_component" in pairs.columns
    # memoized static tree (dedup/exprcache.py): depends only on the
    # signature below, never on data
    reasons = memo(
        (
            "pair_reasons",
            has_real_url,
            has_extent,
            has_component,
            host_ids is not None,
            tuple(sorted(
                (t, a, b, tuple(cfg.field_rules[t]))
                for t, (a, b) in (rule_columns or {}).items()
            )),
            # count order is semantic (first-match-wins) — keep it
            tuple((t, a, b) for t, (a, b) in (count_columns or {}).items()),
        ),
        lambda: _build_reasons_expr(
            cfg,
            has_real_url,
            has_extent,
            has_component,
            host_ids is not None,
            rule_columns,
            count_columns,
        ),
    )

    df = pairs
    if host_ids is not None:
        hosts = F.broadcast(
            host_ids.select(F.col("url").alias("host_url")).distinct()
        )
        df = (
            df.join(hosts, df.url_b == hosts.host_url, "left")
            .withColumn("b_is_host", F.col("host_url").isNotNull())
            .drop("host_url")
            .join(hosts, df.url_a == hosts.host_url, "left")
            .withColumn("a_is_host", F.col("host_url").isNotNull())
            .drop("host_url")
        )
    return df.withColumn("reasons", reasons).withColumn(
        "can_merge", F.size("reasons") == 0
    )


def _build_reasons_expr(
    cfg: DedupConfig,
    has_real_url: bool,
    has_extent: bool,
    has_component: bool,
    with_host: bool,
    rule_columns: dict[str, tuple[str, str]] | None,
    count_columns: dict[str, tuple[str, str]] | None,
) -> Column:
    """The full `reasons` expression tree (see pair_reasons for the
    validator inventory and reference anchors). Pure function of the
    arguments — memoized by pair_reasons."""
    parts: list[Column] = []

    # identity columns for reason messages: when the pipeline runs on
    # integer surrogate ids, the human-readable url rides along as
    # a_real_url/b_real_url and messages use it (golden fidelity)
    disp_a = F.col("a_real_url") if has_real_url else F.col("url_a")
    disp_b = F.col("b_real_url") if has_real_url else F.col("url_b")

    # noSameLOWTags (mergeability-validators.js:52-67) — one reason per
    # overlapping source, message verbatim incl. the reference's typo.
    overlap = F.array_intersect("b_sources", "a_sources")
    parts.append(
        F.transform(
            overlap, lambda s: F.concat(F.lit("Both records have have LOW tag: "), s)
        )
    )

    # sameType (mergeability-validators.js:82-92) — leader/6 byte becomes
    # the page language/content-type gate.
    parts.append(
        _reason_when(
            F.col("b_lang") != F.col("a_lang"),
            F.concat(
                F.lit("Records are of different type (leader/6): "),
                F.col("b_lang"),
                F.lit(" - "),
                F.col("a_lang"),
            ),
        )
    )

    # checkFieldRequirements (mergeability-validators.js:101-107) via the
    # validate-fields rule engine on configured pair array columns —
    # slot 4 in the reference's check list (marc-record-merge-
    # melindautils.js:84-96), between sameType and the diacritics gate.
    if rule_columns:
        other_cols = {t: F.col(b) for t, (_, b) in rule_columns.items()}
        pref_cols = {t: F.col(a) for t, (a, _) in rule_columns.items()}
        cfg_rules = {t: cfg.field_rules[t] for t in rule_columns}
        parts.append(validate_fields_reasons(cfg_rules, other_cols, pref_cols))

    # checkDiacriticsFromTitle (mergeability-validators.js:109-114 via
    # record-utils.js:349-362): other has diacritics, preferred hasn't.
    parts.append(
        _reason_when(
            F.col("b_has_diacritics") & ~F.col("a_has_diacritics"),
            F.lit("Other fields has diacritics in field: text"),
        )
    )

    # sameAuthorType / identicalCount (mergeability-validators.js:115-131):
    # the reference throws at the FIRST mismatching tag of its configured
    # list, so at most one count reason fires, in configuration order.
    if count_columns:
        first = None
        for tag, (a_col, b_col) in count_columns.items():
            cond = F.size(F.coalesce(F.col(a_col), F.array())) != F.size(
                F.coalesce(F.col(b_col), F.array())
            )
            msg = F.lit(f"Field count mismatch for field {tag}")
            first = (
                F.when(cond, msg) if first is None else first.when(cond, msg)
            )
        parts.append(
            F.when(first.isNotNull(), F.array(first)).otherwise(
                F.array().cast("array<string>")
            )
        )
        # toAuthorityQueryObject multiplicity guard (record-utils.js:
        # 60-63): a record with more than one name-field value cannot
        # form an authority query — the reference throws
        # 'Record has multiple names: ' + names.join() (',' separator),
        # ONCE, at the first offending field encountered while building
        # the query. Mirrored as first-match-wins chaining across the
        # configured count fields (like the identicalCount gate above),
        # one reason max per side, preferred side first.
        for side in (0, 1):
            first_multi = None
            for tag, cols in count_columns.items():
                c = F.coalesce(
                    F.col(cols[side]), F.array().cast("array<string>")
                )
                msg = F.concat(
                    F.lit("Record has multiple names: "), F.concat_ws(",", c)
                )
                first_multi = (
                    F.when(F.size(c) > 1, msg)
                    if first_multi is None
                    else first_multi.when(F.size(c) > 1, msg)
                )
            parts.append(
                F.when(first_multi.isNotNull(), F.array(first_multi)).otherwise(
                    F.array().cast("array<string>")
                )
            )

    # same300TypeAndCount (mergeability-validators.js:152-178) on the
    # physical-extent analogue column, pre-inferred per url.
    if has_extent:
        from dedup.infer import extent_mismatch_reason

        parts.append(
            extent_mismatch_reason(
                F.col("a_extent"),
                F.col("b_extent"),
                F.col("a_extent_inferred"),
                F.col("b_extent_inferred"),
            )
        )

    # notComponentRecord (mergeability-validators.js:237-252)
    if has_component:
        parts.append(
            _reason_when(
                F.col("b_is_component"),
                F.concat(F.lit("record is a component record: "), disp_b),
            )
        )
        parts.append(
            _reason_when(
                F.col("a_is_component"),
                F.concat(F.lit("record is a component record: "), disp_a),
            )
        )

    # notHostRecord (mergeability-validators.js:180-203): per-record RPC
    # replaced by one broadcast membership check — pair_reasons attaches
    # the a_/b_is_host flags; these parts bind to them by name.
    if with_host:
        parts.append(
            _reason_when(
                F.col("b_is_host"),
                F.concat(F.lit("record is a host record: "), disp_b),
            )
        )
        parts.append(
            _reason_when(
                F.col("a_is_host"),
                F.concat(F.lit("record is a host record: "), disp_a),
            )
        )

    reasons = parts[0]
    for p in parts[1:]:
        reasons = F.concat(reasons, p)
    return reasons


def with_stat_parity(pairs: DataFrame) -> DataFrame:
    """Stat-only parity columns — the reference's non-fatal per-pair
    logging inside canMerge (marc-record-merge-melindautils.js:106-114):

    * `stat_245_msgs` — validateFields({'245': preferredIsSuperset}) on
      the headings column (the 245 analogue), messages verbatim; the
      reference debug()s them as 'STAT 245] …' without failing the pair.
    * `stat_diacritics_msgs` — checkForDiacritics (record-utils.js:
      325-347), the SYMMETRIC variant: both / preferred-only /
      other-only messages ('STAT DIAC] …').

    Neither column affects `reasons`/`can_merge`; the pipeline surfaces
    them and cli aggregates them into StageMetrics counters.
    """
    from dedup.rules import field_rule_reasons

    has_headings = "a_headings" in pairs.columns

    def build() -> tuple:
        if has_headings:
            s245 = field_rule_reasons(
                "headings",
                F.col("b_headings"),
                F.col("a_headings"),
                ["preferredIsSuperset"],
            )
        else:
            s245 = F.array().cast("array<string>")
        p_d, o_d = F.col("a_has_diacritics"), F.col("b_has_diacritics")
        sdiac = (
            F.when(
                p_d & o_d,
                F.array(F.lit("Both fields have diacritics in field: text")),
            )
            .when(
                p_d,
                F.array(F.lit("Preferred fields has diacritics in field: text")),
            )
            .when(
                o_d,
                F.array(F.lit("Other fields has diacritics in field: text")),
            )
            .otherwise(F.array().cast("array<string>"))
        )
        return s245, sdiac

    s245, sdiac = memo(("stat_parity", has_headings), build)
    return pairs.withColumn("stat_245_msgs", s245).withColumn(
        "stat_diacritics_msgs", sdiac
    )


def jaccard_on_pairs(candidates: DataFrame, shingle_sets: DataFrame) -> DataFrame:
    """Exact Jaccard over distinct-shingle sets for candidate pairs
    (SURVEY.md §2.3.1 — normalized multiset containment degraded to set
    semantics on hashed shingles)."""
    sa = shingle_sets.select(
        F.col("url").alias("url_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingle_sets.select(
        F.col("url").alias("url_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(sa, "url_a")
        .join(sb, "url_b")
        .withColumn(
            "jaccard",
            F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("sh_a", "sh_b")
    )


def verified_edges(
    pairs_with_jaccard_and_reasons: DataFrame, cfg: DedupConfig, channel: str
) -> DataFrame:
    """Edges kept iff similarity passes AND no validator objected."""
    return (
        pairs_with_jaccard_and_reasons.filter(
            (F.col("jaccard") >= F.lit(cfg.jaccard_threshold)) & F.col("can_merge")
        )
        .select("url_a", "url_b", "jaccard", F.lit(channel).alias("channel"))
    )
