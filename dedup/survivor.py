"""Survivor selection + lineage emission (SURVEY.md §7 stage 7).

Internalizes the reference's preferred-record invariants (§2.3.3):

* preference order — preferredRecordInFENNI authority priority
  (mergeability-validators.js:69-81) then freshest warc_ts, longest
  text, lang priority, url ASC for determinism (the fieldSorter lesson,
  record-utils.js:116-131):
      row_number() OVER (PARTITION BY cluster_id
                         ORDER BY is_authority DESC, warc_ts DESC,
                                  text_len DESC, lang_rank ASC, url ASC)
* new identity for the survivor — reset001FromMergedRecord
  (post-merge-modifiers.js:118-128): cluster_key = md5 over the sorted
  member list.
* provenance — add035zLinksToSourceRecords (:98-116): `merged_from`;
  add583CommentAboutMergeOperation (:130-143): lineage struct with an
  INJECTED run timestamp (the reference's wall-clock call is its one
  nondeterminism — tests strip it; we parameterize instead).
* source membership union — syncLOWandSIDFields (:37-96):
  `sources` = union of member sources, `sid_links` synthesized
  FCC<id>/<source> back-links.
* history drop — removeCATFromMergedRecord (:145-147): the survivor row
  carries no member-level history columns.
* reprint notes — addReprintNotes (:161-201): distinguishing
  non-survivor metadata folded in as normalized-deduped annotations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dedup.config import DedupConfig
from dedup.exprcache import memo


def lang_rank_expr(cfg: DedupConfig):
    m = {lang: i for i, lang in enumerate(cfg.lang_priority)}
    expr = F.lit(len(cfg.lang_priority))
    # build a CASE chain; constant-folded by Catalyst
    for lang, i in m.items():
        expr = F.when(F.col("lang") == lang, F.lit(i)).otherwise(expr)
    return expr


def select_survivors(
    members: DataFrame,
    cfg: DedupConfig,
    authority_sources: tuple[str, ...] = (),
    run_id: str = "run-0",
    run_ts: str = "1970-01-01T00:00:00+00:00",
) -> DataFrame:
    """members: (url, cluster_id, warc_ts, text_len, lang, sources).
    Returns one survivor row per cluster with full lineage."""

    # memoized static expression trees (dedup/exprcache.py): everything
    # below depends only on cfg/authority_sources/run identity, not on
    # the members frame — rebuilding it per run_dedup was measured
    # driver wall (py4j chatter) on every bench repeat
    def build() -> tuple:
        is_auth = (
            F.exists("sources", lambda s: s.isin(list(authority_sources)))
            if authority_sources
            else F.lit(False)
        )
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("is_authority").desc(),
            F.col("warc_ts").desc(),
            F.col("text_len").desc(),
            F.col("lang_rank").asc(),
            F.col("url").asc(),
        )
        rollup_aggs = (
            F.sort_array(F.collect_list("url")).alias("merged_from"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("sources")))
            ).alias("sources"),
            F.count(F.lit(1)).alias("n_members"),
        )
        # reset001 analogue: fresh deterministic identity from the
        # member set
        cluster_key = F.md5(F.concat_ws("\n", F.col("merged_from")))
        # syncLOWandSID analogue: synthesized source back-links
        sid_links = F.transform(
            F.col("sources"),
            lambda s: F.concat(F.lit("FCC"), F.col("cluster_key"), F.lit("/"), s),
        )
        # 583 audit analogue, injected timestamp for determinism
        lineage = F.struct(
            F.concat_ws(" + ", F.col("merged_from")).alias("merged_from_note"),
            F.lit(run_id).alias("run_id"),
            F.lit(run_ts).alias("run_ts"),
            F.lit("DEDUP").alias("agency"),
        )
        return is_auth, lang_rank_expr(cfg), w, rollup_aggs, cluster_key, \
            sid_links, lineage

    is_auth, lang_rank, w, rollup_aggs, cluster_key, sid_links, lineage = memo(
        (
            "select_survivors",
            tuple(authority_sources),
            tuple(cfg.lang_priority),
            run_id,
            run_ts,
        ),
        build,
    )

    ranked = members.withColumn("is_authority", is_auth).withColumn(
        "lang_rank", lang_rank
    )
    ranked = ranked.withColumn("rn", F.row_number().over(w))

    survivors = ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("url").alias("survivor_url"),
        "warc_ts",
        "text_len",
        "lang",
    )
    rollup = ranked.groupBy("cluster_id").agg(*rollup_aggs)
    out = survivors.join(rollup, "cluster_id")

    out = out.withColumn("cluster_key", cluster_key)
    out = out.withColumn("sid_links", sid_links)
    out = out.withColumn("lineage", lineage)
    # serialized form for sinks that want a flat audit column (the 583
    # field is one formatted string in the reference)
    out = out.withColumn("lineage_json", F.to_json(F.col("lineage")))
    return out


def reprint_notes(
    members: DataFrame, survivors: DataFrame
) -> DataFrame:
    """addReprintNotes analogue (post-merge-modifiers.js:161-201):
    non-survivor distinguishing metadata (lang + capture year) folded
    into the survivor as formatted, normalized-deduped notes."""
    note_col, kept_col = memo(
        ("reprint_notes",),
        lambda: (
            F.concat(
                F.lit("Lisäpainokset: "),
                F.col("lang"),
                F.lit(" "),
                F.year("warc_ts").cast("string"),
                F.lit("."),
            ).alias("note"),
            _dedup_by_normalized().alias("kept_notes"),
        ),
    )
    nonsurv = members.join(
        survivors.select("cluster_id", "survivor_url", F.col("lang").alias("s_lang")),
        "cluster_id",
    ).filter(F.col("url") != F.col("survivor_url"))
    notes = (
        nonsurv.filter(F.col("lang") != F.col("s_lang"))
        .select("cluster_id", note_col)
        .groupBy("cluster_id")
        .agg(F.sort_array(F.collect_set("note")).alias("raw_notes"))
        # dedup under the reference's \W-stripped normalizer
        # (post-merge-modifiers.js:183-193): a note is dropped iff an
        # earlier note has the same normalized form — first occurrence
        # (in the deterministic sorted order) wins, like the reference
        # keeps the already-included field and skips the new one.
        .select("cluster_id", kept_col)
    )
    return survivors.join(notes, "cluster_id", "left").withColumn(
        "notes", F.coalesce("kept_notes", F.array().cast("array<string>"))
    ).drop("kept_notes")


def _dedup_by_normalized():
    """Fold raw_notes keeping the first note per \\W-stripped key."""
    empty = F.array().cast("array<string>")

    def step(acc, n):
        key = F.regexp_replace(n, r"\W", "")
        return F.when(
            F.array_contains(acc["keys"], key), acc
        ).otherwise(
            F.struct(
                F.concat(acc["keys"], F.array(key)).alias("keys"),
                F.concat(acc["kept"], F.array(n)).alias("kept"),
            )
        )

    return F.aggregate(
        F.col("raw_notes"),
        F.struct(empty.alias("keys"), empty.alias("kept")),
        step,
        lambda acc: acc["kept"],
    )


def format_date_iso(col) -> "F.Column":
    """formatDate (record-utils.js:133-153): ISO-8601 with numeric
    offset, zero-padded — `yyyy-MM-dd'T'HH:mm:ssxxx` renders e.g.
    2024-01-01T12:00:00+00:00 under the session timezone (pipeline runs
    UTC; the reference used the host's local offset)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ssxxx")


def normalize_authority_name(col):
    """normalizeAuthorityQueryName (post-merge-modifiers.js:242-247):
    strip [.,:-] → space, collapse runs, trim."""
    return F.trim(F.regexp_replace(F.regexp_replace(col, "[.,:-]", " "), " +", " "))


def url_host(col) -> "F.Column":
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)


def apply_authorized_override(
    survivors: DataFrame,
    members: DataFrame,
    authorized_names: DataFrame | None,
) -> DataFrame:
    """updateMergedRecordWithAuthorizedFormat analogue
    (post-merge-modifiers.js:203-240).

    Per cluster: every member's display host is looked up (broadcast
    semi-join on the normalized form — authorInAuthorizedFormat,
    post-merge-modifiers.js:251-264). If the survivor's host already
    EQUALS the authorized canonical form it stays; a host that is
    merely an authorized ALIAS is deliberately rewritten to the
    canonical — that normalization-to-authorized-format is the
    reference modifier's whole purpose (:225-236). If exactly one
    distinct authorized canonical exists among the members, it
    overrides the survivor's canonical_host. Two or more distinct authorized forms ⇒
    `reject_reason = 'Both records are in authorized format.'` — routed
    to quarantine instead of aborting the job (:221-223).
    """
    host = url_host(F.col("survivor_url"))
    out = survivors.withColumn("survivor_host", host)
    if authorized_names is None:
        return out.withColumn("canonical_host", F.col("survivor_host")).withColumn(
            "reject_reason", F.lit(None).cast("string")
        )
    auth = F.broadcast(
        authorized_names.select(
            F.col("name_normalized").alias("host_norm"),
            F.col("canonical").alias("auth_canonical"),
        ).distinct()
    )
    mhosts = members.select(
        "cluster_id",
        normalize_authority_name(url_host(F.col("url"))).alias("host_norm"),
    ).distinct()
    cluster_auth = (
        mhosts.join(auth, "host_norm")
        .groupBy("cluster_id")
        .agg(
            F.count_distinct("auth_canonical").alias("n_authorized"),
            F.min("auth_canonical").alias("authorized_canonical"),
        )
    )
    joined = out.join(cluster_auth, "cluster_id", "left")
    surv_norm = normalize_authority_name(F.col("survivor_host"))
    surv_is_auth = F.col("authorized_canonical").isNotNull() & (
        surv_norm == normalize_authority_name(F.col("authorized_canonical"))
    )
    return (
        joined.withColumn(
            "reject_reason",
            F.when(
                F.coalesce(F.col("n_authorized"), F.lit(0)) >= 2,
                F.lit("Both records are in authorized format."),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "canonical_host",
            F.when(F.col("reject_reason").isNotNull(), F.col("survivor_host"))
            .when(surv_is_auth, F.col("survivor_host"))
            .when(
                F.col("authorized_canonical").isNotNull(),
                F.col("authorized_canonical"),
            )
            .otherwise(F.col("survivor_host")),
        )
        .drop("n_authorized", "authorized_canonical")
    )
