"""Connected components via alternating large-star / small-star
(SURVEY.md §7 stage 6; Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — O(log n) rounds).

Each iteration is expressed as groupBy-min + join (NOT collect_set —
a high-degree node would blow a collected adjacency list; the min-join
formulation keeps every operator streaming). Per-iteration
localCheckpoint truncates the lineage so plans don't grow with rounds,
and convergence is detected by an aggregate fingerprint of the edge
multiset (one count + hash-sum, no driver-side edge materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _undirect(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Both directions, self-loops dropped, deduped.

    dedup=False skips the distinct shuffle — safe wherever the consumer
    is a min-aggregation (duplicate edges can't change a min), at the
    cost of ≤2× row multiplicity through the next join."""
    e = edges.select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
    out = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u") != F.col("v")
    )
    return out.distinct() if dedup else out


def _with_min(e2: DataFrame) -> DataFrame:
    """Attach m(u) = min(min(v in Γ(u)), u) to every edge.

    groupBy-agg + join, NOT Window.partitionBy min: the aggregate gets
    map-side partial combine, so a mega-component hub with 10^8
    neighbors costs <= one partial row per map task instead of a
    single-task straggler holding the whole neighborhood. The join back
    hash-partitions by u; a skewed u is handled by AQE skew-join
    splitting (the build side is one row per key, so split partitions
    stay correct)."""
    mins = e2.groupBy("u").agg(F.min("v").alias("_mn"))
    return e2.join(mins, "u").withColumn(
        "m", F.least(F.col("_mn"), F.col("u"))
    ).drop("_mn")


def _large_star(e2: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor to m(u) = min(Γ(u) ∪ {u})."""
    with_m = _with_min(e2)
    return (
        with_m.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e2: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and u itself) to the min."""
    le = e2.filter(F.col("v") < F.col("u"))
    with_m = _with_min(le)
    out = (
        with_m.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(with_m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _fingerprint(e2: DataFrame) -> tuple[int, int]:
    row = e2.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


AQE_OFF_MAX_EDGES = 10_000_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    verbose: bool = False,
    n_edges: int | None = None,
    check_every: int = 2,
) -> DataFrame:
    """edges(url_a, url_b) → assignments(url, cluster_id).

    cluster_id is the minimum url of the component — deterministic, like
    the reference's canonical field ordering guarantees
    (lib/record-utils.js:116-131).

    n_edges: pass the (cheaply known) verified-edge count to pick the
    AQE mode without an extra job. AQE's per-query-stage jobs cost
    ~1.3 s of driver-only wall per CC iteration — pure serial overhead
    when the edge set is small — so the loop runs AQE-free below
    AQE_OFF_MAX_EDGES. ABOVE the bound AQE stays ON: _with_min's join
    back onto a skewed `u` relies on AQE skew-join splitting for
    mega-component hubs (a 10⁸-degree boilerplate hub must not land on
    one reducer), and at that scale the replan cost is noise. With
    ≤ 10M total edges even a fully-skewed key puts ≤ 10M slim rows on
    one task — bounded, no skew handling needed.

    check_every: fingerprint (and convergence-check) only every k-th
    iteration. Each fingerprint is a driver round-trip — one collect
    plus one Catalyst plan of the accumulated (lazy-checkpointed) tree —
    and that serial wall is the dominant non-scaling term in local-mode
    benches. k=2 halves the round-trips at the cost of at most k-1
    extra star passes over an already-converged (star-shaped, thus
    cheap) edge set. Sound because one large+small pass only ever
    LOWERS the label each node points at (targets are mins of current
    neighborhoods), so the deterministic pass map admits no cycles: an
    edge multiset equal to the one k passes earlier means every pass in
    between was a fixed point.
    """
    import time

    t0 = time.time()
    small = n_edges is not None and n_edges <= AQE_OFF_MAX_EDGES
    if not small:
        return _cc_loop(edges, max_iterations, verbose, t0, check_every)
    spark = edges.sparkSession
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _cc_loop(edges, max_iterations, verbose, t0, check_every)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)


def _cc_loop(
    edges: DataFrame,
    max_iterations: int,
    verbose: bool,
    t0: float,
    check_every: int = 2,
) -> DataFrame:
    import time

    check_every = max(1, check_every)
    # lazy localCheckpoint: the fingerprint action both materializes the
    # checkpoint and reads the convergence stats — ONE job per checked
    # iteration instead of eager-checkpoint + collect; between checks no
    # job runs at all (the unmaterialized checkpoints chain and the next
    # fingerprint materializes them together)
    e2 = _undirect(edges).localCheckpoint(eager=False)
    prev = _fingerprint(e2)
    if verbose:
        print(f"[cc] init: {time.time() - t0:.1f}s fp={prev}")
    converged = False
    for it in range(max_iterations):
        t = time.time()
        # star outputs are DISTINCT sets of strictly (larger, smaller)
        # pairs, so unioning the reversed direction cannot introduce
        # duplicates — the two in-loop undirects skip their distinct
        # shuffle (2 fewer shuffles per iteration; edge multiset, and
        # therefore the convergence fingerprint, provably unchanged)
        after_large = _undirect(
            _large_star(e2).select(
                F.col("u").alias("url_a"), F.col("v").alias("url_b")
            ),
            dedup=False,
        )
        after_small = _small_star(after_large)
        e2 = _undirect(
            after_small.select(F.col("u").alias("url_a"), F.col("v").alias("url_b")),
            dedup=False,
        ).localCheckpoint(eager=False)
        if (it + 1) % check_every != 0 and it != max_iterations - 1:
            continue
        cur = _fingerprint(e2)
        if verbose:
            print(f"[cc] iter {it}: {time.time() - t:.1f}s fp={cur}")
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # falling through with a non-star edge set would silently emit
        # inconsistent assignments — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (edge-set fingerprint still changing)"
        )

    # converged: edges form stars child→root (root = component min).
    # roots: nodes that appear only as targets.
    child_to_root = e2.filter(F.col("v") < F.col("u")).select(
        F.col("u").alias("url"), F.col("v").alias("cluster_id")
    )
    roots = (
        e2.select(F.least("u", "v").alias("url"))
        .distinct()
        .join(child_to_root.select("url"), "url", "left_anti")
        .select("url", F.col("url").alias("cluster_id"))
    )
    return child_to_root.union(roots).distinct()


def assignments_with_singletons(
    assignments: DataFrame, all_urls: DataFrame
) -> DataFrame:
    """Every url gets a cluster: non-edge docs become singleton clusters
    (their own url as cluster_id)."""
    missing = all_urls.select("url").join(
        assignments.select("url"), "url", "left_anti"
    )
    return assignments.unionByName(
        missing.select("url", F.col("url").alias("cluster_id"))
    )
