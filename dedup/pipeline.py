"""End-to-end pipeline composition (SURVEY.md §3 rebuild lifecycle).

One driver program composes stages as DataFrame transformations;
Catalyst produces the plan; stage boundaries are shuffles (band groupBy,
CC iterations) and broadcasts (side tables). Channels (LSH / SimHash /
substring) all feed the same verify → cluster → select tail, like the
reference feeds every candidate pair through the same canMerge →
applyPostMergeModifications tail.

Cache discipline (measured on the 32-core sandbox): Spark's columnar
block cache writes wide array columns slowly enough to dominate wall
time, so the persisted working set is NARROW — normalized text + scalar
features for `clean`, (uid, sig) for signatures. Shingle arrays are
recomputed from the cached norm_text only for urls that survive
candidate generation, never cached, never shuffled beyond the
pair-verification join.
"""

from __future__ import annotations



import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from dedup.candidates import (
    exact_edges,
    exact_groups,
    lsh_candidates,
    representatives,
)
from dedup.config import DedupConfig
from dedup.cluster import assignments_with_singletons, connected_components
from dedup.minhash import explode_bands, signatures, with_shingles
from dedup.normalize import quarantine_filter, with_normalized
from dedup.survivor import (
    apply_authorized_override,
    reprint_notes,
    select_survivors,
)
from dedup.verify import (
    attach_features,
    pair_reasons,
    url_features,
    verified_edges,
    with_stat_parity,
)


class DedupResult:
    """Result surfaces of one run_dedup call.

    clean        — quarantine-filtered normalized pages (narrow)
    quarantined  — rows excluded before pairing
    shingle_sets — (url, shingles, sig) for representatives (lazy)
    candidates   — raw LSH candidate pairs
    hot_buckets  — capped buckets (skew lineage)
    pairs        — candidates + jaccard + reasons + stat columns
    edges        — verified edges, all channels
    assignments  — (url, cluster_id) for every clean url
    survivors    — one accepted merged row per cluster + lineage
    rejected     — post-merge-rejected survivor rows (quarantine routing
                   for the both-authorized case)
    cached       — every DataFrame this run persisted

    `quarantined`, `pairs` and `edges` accept zero-arg thunks and are
    built LAZILY on first attribute access (then memoized): building
    those frames re-walks the full verification tree through Catalyst
    analysis — pure driver wall that the common callers (bench, entry,
    the streaming tail) never need because they read only
    assignments/survivors. Callers that do read them see the identical
    frames, just constructed on demand.
    """

    def __init__(
        self,
        clean: DataFrame,
        quarantined,
        shingle_sets: DataFrame,
        candidates: DataFrame,
        hot_buckets: DataFrame,
        pairs,
        edges,
        assignments: DataFrame,
        survivors: DataFrame,
        rejected: DataFrame,
        cached: tuple = (),
    ) -> None:
        self.clean = clean
        self.shingle_sets = shingle_sets
        self.candidates = candidates
        self.hot_buckets = hot_buckets
        self.assignments = assignments
        self.survivors = survivors
        self.rejected = rejected
        self.cached = cached
        self._lazy = {
            "quarantined": quarantined, "pairs": pairs, "edges": edges
        }

    def __getattr__(self, name: str):
        # only called when `name` is not in __dict__ — i.e. the lazy
        # fields before their first access
        lazy = self.__dict__.get("_lazy") or {}
        if name in lazy:
            val = lazy.pop(name)
            if callable(val):
                val = val()
            setattr(self, name, val)  # memoize: next access is direct
            return val
        raise AttributeError(name)

    def release(self) -> None:
        """Unpersist every cache the run pinned. Call when done with
        the result in a long-lived session (resume loops, notebooks) —
        otherwise repeated run_dedup calls accumulate cached blocks
        until eviction pressure degrades the caches that matter."""
        for df in self.cached:
            try:
                df.unpersist()
            except Exception:  # session already stopped
                pass


def prepare_clean(pages: DataFrame, uid_bits: int = 64) -> DataFrame:
    """Normalize → quarantine-filter → narrow: the shared pre-channel
    working set. Callers that feed extra channels (SimHash / substring /
    LCP) AND run_dedup should build this ONCE, persist it, and pass the
    same object to both — every consumer then reads one cache instead of
    re-running the normalizer per channel (cache substitution matches on
    plan identity, so it must be literally the same frame).

    Narrow by construction: the binary payload is never used past
    normalization, and raw text reduces to its length (survivor
    ordering). norm_text stays — exact hashing and shingles recompute
    from it instead of caching wide arrays."""
    clean = quarantine_filter(with_normalized(pages))
    clean = clean.withColumn("text_len", F.length("text"))
    # stand-in for the raw text after the drop: the exact channel needs
    # a raw-equality fallback for docs whose NORMALIZED text is empty
    # (see candidates.exact_groups). uid_bits=128 stores the full md5
    # digest instead of an 8-byte xxhash64 — at 10^12 empty-norm docs
    # the 64-bit birthday bound fuses unrelated pages as exact dups with
    # no downstream check able to see it (exact_groups forces jaccard
    # 1.0 via the rep mapping), so the wide-id escape hatch must cover
    # the raw domain too.
    raw_hash = F.md5("text") if uid_bits == 128 else F.xxhash64("text")
    clean = clean.withColumn("raw_hash", raw_hash)
    return clean.drop(*[c for c in ("html", "text") if c in clean.columns])


def run_dedup(
    pages: DataFrame,
    cfg: DedupConfig,
    sources: DataFrame | None = None,
    host_ids: DataFrame | None = None,
    authorized_names: DataFrame | None = None,
    candidate_channels: list[DataFrame] | None = None,
    bypass_jaccard_channels: list[DataFrame] | None = None,
    run_id: str = "run-0",
    run_ts: str = "1970-01-01T00:00:00+00:00",
    persist: bool = True,
    persist_pairs: bool = False,
    clean: DataFrame | None = None,
    timings: dict | None = None,
) -> DedupResult:
    """Compose the full pipeline.

    candidate_channels: extra (url_a, url_b) candidate pairs (e.g. the
      SimHash Hamming-ball channel) — they go through the SAME Jaccard
      threshold + reason gates as LSH candidates (the reference runs
      every pair through canMerge regardless of where it came from).
    bypass_jaccard_channels: (url_a, url_b) pairs whose similarity was
      already verified by channel-specific means (exact substring
      containment; SimHash Hamming ≤ d) — they skip the Jaccard
      threshold but still pass the reason gates (source overlap / type /
      diacritics / rules / host...).
    authorized_names: (name_normalized, canonical) broadcast side table
      for the post-merge authorized-format override
      (post-merge-modifiers.js:203-240); both-authorized clusters are
      routed to `rejected`, the reference's throw (:221-223).
    clean: optional pre-built prepare_clean(pages) frame — pass it when
      the caller also built channels from the same frame, so the whole
      run shares one normalization cache. Caller-owned: this function
      neither persists nor releases it (release() won't touch it).
    timings: optional dict; receives wall-clock splits of the eager
      phases (plan_front_s, edges_s, cc_s, tail_build_s) — the dev
      observability hook the bench/scaling protocols read.
    """
    import time as _time

    from pyspark import StorageLevel

    _t0 = _time.time()

    cached: list[DataFrame] = []  # every persist this run pins (release())

    norm = with_normalized(pages)
    caller_clean = clean is not None
    if not caller_clean:
        clean = prepare_clean(pages, uid_bits=cfg.uid_bits)
    if persist and not caller_clean:
        # clean feeds exact-grouping, signatures, features and members —
        # without a persist every downstream action re-scans + re-derives.
        # On a real cluster this is the natural stage-checkpoint point.
        clean = clean.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(clean)

    def quarantined_fn(norm=norm, clean=clean) -> DataFrame:
        return norm.join(clean.select("url"), "url", "left_anti")

    # surrogate ids: every band/candidate/CC shuffle moves a compact key
    # instead of a ~50-byte url string (the pipeline is memory-
    # bandwidth-bound at high core counts). uid_bits=64 → xxhash64 long
    # (8 bytes; production default, expected colliding pairs ≈ n²/2⁶⁵ —
    # ~27k at the 10^12-doc design point); uid_bits=128 → unhex(md5),
    # a 16-BYTE BINARY digest (the 10^12-doc path, collision
    # probability ≈ n²/2¹²⁹ ≈ 1e-15 — and half the bytes of the hex
    # string form). Both are deterministic and opaque-orderable
    # (binary compares unsigned-lexicographically), so downstream
    # operators (least/greatest, CC min-aggregation, joins) are
    # width-agnostic and the two paths yield identical cluster
    # assignments; the invariant below turns any residual collision
    # from silent corruption into a loud failure.
    uid_expr = (
        F.xxhash64("url") if cfg.uid_bits == 64 else F.unhex(F.md5("url"))
    )
    keyed = clean.withColumn("uid", uid_expr)
    kpages = keyed.select(
        F.col("uid").alias("url"),
        F.col("url").alias("real_url"),
        *[c for c in keyed.columns if c not in ("url", "uid")],
    )
    ids = keyed.select(F.col("url").alias("real_url"), F.col("uid"))

    def to_uid_pairs(ch: DataFrame) -> DataFrame:
        ia = ids.select(F.col("real_url").alias("url_a"), F.col("uid").alias("ua"))
        ib = ids.select(F.col("real_url").alias("url_b"), F.col("uid").alias("ub"))
        return (
            ch.select("url_a", "url_b")
            .join(ia, "url_a")
            .join(ib, "url_b")
            .select(
                F.least("ua", "ub").alias("url_a"),
                F.greatest("ua", "ub").alias("url_b"),
            )
        )

    # exact pre-dedup: one signature per distinct normalized text
    groups = exact_groups(kpages, cfg)
    if persist:
        # 4 consumers (representatives, exact edges, estimate filter,
        # jaccard rep-mapping) — unpersisted, each re-reads the clean
        # cache and re-hashes (3 duplicate ~17 task-s stages measured)
        groups = groups.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(groups)
    reps = representatives(groups)
    rep_pages = kpages.join(reps, "url")

    # signatures: only the narrow (uid, sig) projection is persisted —
    # shingle arrays are recomputed for verification-surviving urls only
    sig_full = signatures(rep_pages, cfg)
    sigs = sig_full.select("url", "sig")
    if persist:
        # sigs feed banding AND the estimate pre-filter joins
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(sigs)

    # ---- overlap driver planning with executor work -------------------
    # Catalyst analyzes/optimizes this pipeline's (very deep) plan
    # single-threaded on the driver; measured at ~35-60 s of ZERO-task
    # wall in local mode — the dominant serial term in the scaling
    # bench. Warm the two upstream caches (and run the uid-collision
    # invariant) from a background thread so executors chew through
    # normalize/signature work WHILE the driver keeps building and
    # planning the downstream DAG. Join before CC (below); any failure
    # re-raises there. Same-content caches make this race-free.
    warm_errs: list[BaseException] = []
    warm_thread = None
    if persist and cfg.warm_caches_async:
        import threading

        def _warm(clean=clean, keyed=keyed, sigs=sigs) -> None:
            try:
                # ONE job warms the clean cache AND runs the uid
                # invariant: materializing a cached plan stores every
                # column, so the agg's scan populates the cache exactly
                # like a count() would — a separate count was one full
                # extra pass in the warm thread's serial chain
                if cfg.check_uid_collisions:
                    r = keyed.agg(
                        F.count("url").alias("n"),
                        F.count_distinct("uid").alias("d"),
                    ).collect()[0]
                    if r["n"] != r["d"]:
                        raise RuntimeError(
                            f"uid collision: {r['n']} urls → {r['d']} "
                            "distinct xxhash64 surrogates; rerun with a "
                            "128-bit surrogate key"
                        )
                else:
                    clean.count()
                sigs.count()
            except BaseException as exc:  # noqa: BLE001 — re-raised on join
                warm_errs.append(exc)

        warm_thread = threading.Thread(
            target=_warm, name="dedup-cache-warm", daemon=True
        )
        warm_thread.start()
    elif cfg.check_uid_collisions:
        r = keyed.agg(
            F.count("url").alias("n"), F.count_distinct("uid").alias("d")
        ).collect()[0]
        if r["n"] != r["d"]:
            raise RuntimeError(
                f"uid collision: {r['n']} urls → {r['d']} distinct xxhash64 "
                "surrogates; rerun with a 128-bit surrogate key"
            )

    # degenerate docs — normalized text shorter than one shingle (CJK/
    # punctuation-only pages normalize to '' under the [a-z0-9åäö]
    # alphabet) — have an EMPTY shingle set, so their MinHash signature
    # is the same constant for every such doc: banding them would pair
    # every degenerate page with every other at estimate 1.0. They are
    # excluded from the LSH channel and can only merge through the
    # exact channel's raw-equality fallback (see candidates.exact_groups)
    bandable = rep_pages.filter(
        F.length("norm_text") >= F.lit(cfg.k_shingle)
    ).select("url")
    # bands stays UNPERSISTED: its three consumers inside
    # pairs_from_buckets produce identical exchange subtrees that Spark
    # reuses (ReusedExchange); a cache here was measured to break that
    # reuse and re-shuffle per consumer
    bands = explode_bands(sigs.join(bandable, "url"), cfg)
    raw_candidates, hot = lsh_candidates(bands, cfg, cache_registry=cached)

    # exact-dup pairs join the same verification path (the reference
    # gates identical records too — canMerge runs on every pair)
    exact_pairs = exact_edges(groups).select("url_a", "url_b")
    all_candidates = raw_candidates.unionByName(exact_pairs)
    for ch in candidate_channels or []:
        all_candidates = all_candidates.unionByName(to_uid_pairs(ch))
    all_candidates = all_candidates.distinct()

    # configured rule/count columns outside the built-in optional set
    # must ride the feature table, or pair_reasons would reference
    # a_/b_ columns that were never attached (plan-time failure)
    gate_cols = tuple(sorted(
        set(cfg.field_rules) | set(cfg.count_fields)
    ))
    feats = url_features(kpages, None, extra_cols=gate_cols).drop("sources")
    if sources is not None:
        feats = feats.join(_uid_sources(sources, ids), "url", "left")
        feats = feats.withColumn(
            "sources", F.coalesce("sources", F.array().cast("array<string>"))
        )
    else:
        feats = feats.withColumn("sources", F.array().cast("array<string>"))
    if persist:
        # feats is consumed twice (pair verification + the members tail
        # after CC); persisting the narrow projection avoids recomputing
        # it and keeps the post-CC plans shallow. (A lazy localCheckpoint
        # here — truncating the analyzed plan — was tried in r6 and
        # MEASURED SLOWER: its toRdd call plans the feats subtree
        # serially at build time, where the persist defers that work
        # into the edges action's overlapped planning.)
        feats = feats.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(feats)
    if cfg.estimate_prefilter and cfg.hash_mode == "fast":
        # MinHash-estimate pre-filter: ship only the (num_perm × 8B)
        # signature through the first join and drop candidates whose
        # estimated Jaccard can't plausibly reach the threshold
        # (P[Binomial(128, 0.8) < 0.5·128] < 1e-12). The exact-Jaccard
        # join then ships the (much wider) shingle arrays for the
        # surviving ~5-10% only.
        all_candidates = _estimate_filter(all_candidates, sigs, groups, cfg)
    # orientation contract (pair_reasons: side `a` = lexicographically-
    # smaller REAL url) enforced HERE, on slim uid pair rows, instead of
    # the old post-attach ~40-column conditional projection: Catalyst's
    # CollapseProject inlined that projection's CASE WHEN wrappers into
    # every downstream reason/rule expression (each a_X reference became
    # a conditional), blowing up the optimizer's tree and the planning
    # wall. Two broadcast joins on the slim ids table + a 2-column swap
    # replace it; attach_features then binds a_/b_ columns already in
    # real-url order, so the plan carries plain join outputs.
    all_candidates = _orient_uid_pairs(all_candidates, ids)
    if persist:
        # LAZY plan split at the narrowest waist (16-byte pair rows):
        # Catalyst's optimizer cost grows super-linearly with tree size,
        # and the single front-half plan costs ~35 s of driver-only
        # physical planning at any data size. Splitting here plans two
        # roughly-half-size trees instead; execution is unchanged (the
        # checkpoint materializes inside the first downstream action).
        all_candidates = all_candidates.localCheckpoint(eager=False)
    with_j = _jaccard_incl_exact(
        all_candidates, rep_pages, groups, cfg, persist=persist,
        cache_registry=cached,
    )
    pairs = attach_features(with_j, feats)
    uid_hosts = (
        host_ids.join(
            ids, host_ids.url == ids.real_url
        ).select(F.col("uid").alias("url"))
        if host_ids is not None
        else None
    )
    # production gate wiring: every rule/count/extent column present on
    # the input pages participates, like the reference's canMerge runs
    # its full validator list on every pair
    rule_columns = {
        t: (f"a_{t}", f"b_{t}")
        for t in sorted(cfg.field_rules)
        if t in kpages.columns
    }
    count_columns = {
        t: (f"a_{t}", f"b_{t}") for t in cfg.count_fields if t in kpages.columns
    }
    pairs = pair_reasons(
        pairs, cfg, uid_hosts,
        rule_columns=rule_columns or None,
        count_columns=count_columns or None,
    )
    pairs = with_stat_parity(pairs)
    if persist_pairs and persist:
        # callers that consume pair-level outputs (stat-parity counters,
        # pair dumps) would otherwise replay the whole verification
        # chain — incl. the shingle-UDF joins — once per consumer; the
        # edges materialization below populates this cache for free
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(pairs)
    edges = verified_edges(pairs, cfg, "lsh")

    if bypass_jaccard_channels:
        bypass = to_uid_pairs(bypass_jaccard_channels[0])
        for ch in bypass_jaccard_channels[1:]:
            bypass = bypass.unionByName(to_uid_pairs(ch))
        bpairs = attach_features(
            _orient_uid_pairs(bypass.distinct(), ids), feats
        )
        bpairs = pair_reasons(
            bpairs, cfg, uid_hosts,
            rule_columns=rule_columns or None,
            count_columns=count_columns or None,
        )
        bedges = bpairs.filter(F.col("can_merge")).select(
            "url_a", "url_b",
            F.lit(1.0).alias("jaccard"), F.lit("bypass").alias("channel"),
        )
        edges = edges.unionByName(bedges)

    edges = edges.select("url_a", "url_b").distinct()
    # join the cache-warm thread BEFORE the first big action: the
    # planning overlap already happened during plan construction above,
    # and launching the main DAG while sigs is still materializing
    # would RACE the cache — a losing race recomputes the signature UDF
    # inside the bands stage (measured 237 task-s vs 15 with a warm
    # cache at 200k docs) and starves the python workers
    if warm_thread is not None:
        warm_thread.join()
        if warm_errs:
            raise warm_errs[0]
    if timings is not None:
        timings["plan_front_s"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()
    if persist:
        # materialize + truncate lineage BEFORE the CC loop: Spark 4.1's
        # cache substitution misses this lambda-heavy plan when embedded
        # as a subtree (observed: the CC init re-ran the whole verify
        # chain despite a warm edge cache), and every CC action would
        # otherwise replay candidate generation + verification.
        edges = edges.localCheckpoint(eager=True)

    # CC runs entirely on 8-byte surrogate ids; counting the (already
    # checkpointed) edge set is one trivial job and lets CC pick its
    # AQE mode — serial-cheap AQE-free iterations for small graphs,
    # AQE skew-join protection for mega-hub graphs
    n_edges = edges.count() if persist else None
    if timings is not None:
        timings["edges_s"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()
    assign = connected_components(
        edges, n_edges=n_edges, driver_max_edges=cfg.cc_driver_max_edges
    )
    if timings is not None:
        timings["cc_s"] = round(_time.time() - _t0, 3)
        _t0 = _time.time()
    assign = assignments_with_singletons(assign, kpages.select("url"))
    if persist:
        # lazy checkpoint: truncates the CC-loop lineage out of every
        # downstream plan (members/labels/survivors each replan the tail
        # otherwise — measured ~13 s of driver-only planning wall)
        assign = assign.localCheckpoint(eager=False)

    # map back: cluster_id := min real url of the component (identical
    # member sets ⇒ identical labels to the pre-surrogate pipeline)
    members_uid = assign.join(feats, "url")
    labels = members_uid.groupBy("cluster_id").agg(
        F.min("real_url").alias("cluster_label")
    )
    members = (
        members_uid.join(labels, "cluster_id")
        .drop("cluster_id", "url")
        .withColumnRenamed("real_url", "url")
        .withColumnRenamed("cluster_label", "cluster_id")
    )
    survivors = select_survivors(
        members, cfg, authority_sources=cfg.authority_sources,
        run_id=run_id, run_ts=run_ts,
    )
    survivors = reprint_notes(members, survivors)
    # post-merge tail (applyPostMergeModifications ordering,
    # marc-record-merge-melindautils.js:122-178): the authorized-format
    # override runs LAST and may reject the merge outright
    survivors = apply_authorized_override(survivors, members, authorized_names)
    rejected = survivors.filter(F.col("reject_reason").isNotNull())
    survivors = survivors.filter(F.col("reject_reason").isNull())

    # result surfaces carry real urls; built lazily (DedupResult
    # memoizes on first access) — constructing them walks the full
    # verification tree through analysis again, pure driver wall the
    # bench/entry/streaming callers never pay
    def pairs_fn(pairs=pairs) -> DataFrame:
        return (
            pairs.withColumn("url_a", F.col("a_real_url"))
            .withColumn("url_b", F.col("b_real_url"))
        )

    def edges_fn(edges=edges, ids=ids) -> DataFrame:
        er = ids.select(
            F.col("uid").alias("url_a"), F.col("real_url").alias("ra")
        )
        eb = ids.select(
            F.col("uid").alias("url_b"), F.col("real_url").alias("rb")
        )
        return (
            edges.join(er, "url_a").join(eb, "url_b")
            .select(
                F.least("ra", "rb").alias("url_a"),
                F.greatest("ra", "rb").alias("url_b"),
            )
        )

    if timings is not None:
        timings["tail_build_s"] = round(_time.time() - _t0, 3)
    return DedupResult(
        clean=clean,
        quarantined=quarantined_fn,
        shingle_sets=sig_full,
        candidates=raw_candidates,
        hot_buckets=hot,
        pairs=pairs_fn,
        edges=edges_fn,
        assignments=members.select("url", "cluster_id"),
        survivors=survivors,
        rejected=rejected,
        cached=tuple(cached),
    )


def _orient_uid_pairs(pairs: DataFrame, ids: DataFrame) -> DataFrame:
    """Enforce pair_reasons' orientation contract — side `a` is the
    lexicographically-smaller REAL url (dedup/verify.py:111, the
    reference's preferred/other convention) — on SLIM uid pair rows.
    Channels order pairs by the opaque surrogate uid, which is fine for
    the SET (dedup, distinct, CC are orientation-free) but NOT for the
    asymmetric gates (diacritics, preferred-superset rules): left as
    uid order, a pair's can_merge would depend on which hash the run
    used, so uid_bits=64 and 128 could yield different clusters.

    Orientation happens BEFORE attach_features on purpose: the old
    post-attach conditional projection (CASE WHEN swap per prefixed
    column) was inlined by CollapseProject into every reason/rule
    expression downstream — a measured plan-size/planning-wall blowup.
    Here only the two 8/16-byte key columns swap; every non-key column
    of `pairs` (jaccard, collision counts) is pair-symmetric and rides
    through unchanged."""
    ra = ids.select(F.col("uid").alias("url_a"), F.col("real_url").alias("_ra"))
    rb = ids.select(F.col("uid").alias("url_b"), F.col("real_url").alias("_rb"))
    others = [c for c in pairs.columns if c not in ("url_a", "url_b")]
    swap = F.col("_ra") > F.col("_rb")
    return (
        pairs.join(ra, "url_a")
        .join(rb, "url_b")
        .select(
            F.when(swap, F.col("url_b")).otherwise(F.col("url_a")).alias("url_a"),
            F.when(swap, F.col("url_a")).otherwise(F.col("url_b")).alias("url_b"),
            *others,
        )
    )


def _uid_sources(sources: DataFrame, ids: DataFrame) -> DataFrame:
    """(real url, source) side table → (uid-as-url, sources array)."""
    return (
        sources.join(ids, sources.url == ids.real_url)
        .groupBy("uid")
        .agg(F.sort_array(F.collect_set("source")).alias("sources"))
        .withColumnRenamed("uid", "url")
    )


# agreement count in ONE Arrow kernel: the old
# size(filter(zip_with(sig_a, sig_b, ==))) chain is a higher-order-
# function tree Spark interprets per ELEMENT (no codegen) — measured
# 70 task-seconds at 30k docs, the single hottest stage of the whole
# front. numpy computes the identical count (int equality on the
# same longs); null sigs propagate to a null count, so the >= filter
# drops those pairs exactly like the old null-propagating expression.
# Module-level (not per-call): the udf is config-free, and re-creating
# it per run_dedup re-paid wrapper construction + cloudpickle on every
# bench repeat. (The return type is a DataType OBJECT — a DDL string
# would be parsed at import time, which needs an active session.)
@F.pandas_udf(T.LongType())
def _agree(a: pd.Series, b: pd.Series) -> pd.Series:
    vals: list = []
    for x, y in zip(a, b):
        if x is None or y is None:
            vals.append(None)
        else:
            vals.append(
                int((np.asarray(x) == np.asarray(y)).sum())
            )
    return pd.Series(vals, dtype="object")


def _estimate_filter(
    candidates: DataFrame, sigs: DataFrame, groups: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Keep candidate pairs whose signature-agreement estimate is at
    least `estimate_floor` (exact-dup pairs map to identical reps and
    trivially survive)."""
    url_to_rep = groups.select("url", "rep_url")
    rep_sig = sigs.select(F.col("url").alias("rep_url"), "sig")
    s = url_to_rep.join(rep_sig, "rep_url").select("url", "sig")
    sa = s.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sb = s.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))

    est = _agree("sig_a", "sig_b").cast("double") / F.size("sig_a").cast(
        "double"
    )
    return (
        candidates.join(sa, "url_a")
        .join(sb, "url_b")
        .filter(est >= F.lit(cfg.estimate_floor))
        .select("url_a", "url_b")
    )


def _jaccard_incl_exact(
    candidates: DataFrame,
    rep_pages: DataFrame,
    groups: DataFrame,
    cfg: DedupConfig,
    persist: bool = False,
    cache_registry: list | None = None,
) -> DataFrame:
    """Jaccard for candidate pairs where both sides may be exact-dup
    members: map each url to its representative's shingle set first.

    Shingle arrays are recomputed (from the cached narrow norm_text) for
    ONLY the representatives that still appear in a candidate pair after
    the estimate pre-filter — the arrays never enter a cache and never
    shuffle except through this final verification join."""
    needed = candidates.select(
        F.explode(F.array("url_a", "url_b")).alias("url")
    ).distinct()
    u2r = groups.select("url", "rep_url").join(needed, "url")
    reps_needed = u2r.select(F.col("rep_url").alias("url")).distinct()
    rep_sh = with_shingles(
        rep_pages.join(reps_needed, "url"), cfg
    ).select(F.col("url").alias("rep_url"), "shingles")
    if persist:
        # consumed twice (url_a side + url_b side of the pair join);
        # without a persist each side re-runs the shingle UDF over every
        # needed rep (measured 2 × ~110 task-s at 200k docs / 8 cores —
        # the python workers are the scarce resource there). The cache
        # write of the wide array column costs less than one recompute.
        from pyspark import StorageLevel

        rep_sh = rep_sh.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(rep_sh)
    sh = u2r.join(rep_sh, "rep_url").select("url", "shingles")
    sa = sh.select(F.col("url").alias("url_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("url").alias("url_b"), F.col("shingles").alias("sh_b"))
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
