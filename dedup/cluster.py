"""Connected components via alternating large-star / small-star
(SURVEY.md §7 stage 6; Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — O(log n) rounds).

Each iteration is expressed as groupBy-min + join (NOT collect_set —
a high-degree node would blow a collected adjacency list; the min-join
formulation keeps every operator streaming). Per-iteration
localCheckpoint truncates the lineage so plans don't grow with rounds,
and convergence is detected by an aggregate fingerprint of the edge
multiset (one count + hash-sum, no driver-side edge materialization).

Regime switch: when the caller knows the edge count and it is at most
DRIVER_CC_MAX_EDGES, labeling runs as a driver-side vectorized
union-find over the collected slim edge list instead — identical
assignments, none of the loop's per-round scheduler wall (see
DRIVER_CC_MAX_EDGES for the measured rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType, StringType


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


# Below this edge count CC runs as a driver-side vectorized union-find
# on the collected slim edge list (≤ 160 MB at the bound) instead of
# the distributed star loop. Rationale: the loop costs ~4-6 scheduled
# shuffle stages PER ROUND plus a fingerprint collect per checked round
# — measured 15-20 s of almost-pure driver/scheduler wall on a 16k-edge
# graph where the numpy kernel takes 10 ms (and 7.6 s at the full 10M-
# edge bound, dense worst case). CC on an edge list that fits in driver
# memory is not a distributed problem; this is the same regime switch a
# 100-TB job makes once verification has shrunk the pair set, and the
# same idea as AQE converting a shuffle join to broadcast below a size
# bound. Above the bound the star loop runs with AQE ON — _with_min's
# join back onto a skewed `u` relies on AQE skew-join splitting for
# mega-component hubs (a 10⁸-degree boilerplate hub must not land on
# one reducer), and at that scale the replan cost is noise.
DRIVER_CC_MAX_EDGES = 10_000_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    verbose: bool = False,
    n_edges: int | None = None,
    check_every: int = 2,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """edges(url_a, url_b) → assignments(url, cluster_id).

    cluster_id is the minimum url of the component — deterministic, like
    the reference's canonical field ordering guarantees
    (lib/record-utils.js:116-131).

    n_edges: pass the (cheaply known) verified-edge count to let small
    graphs (≤ DRIVER_CC_MAX_EDGES) take the driver union-find path —
    identical assignments, none of the loop's per-round scheduling
    wall. None (unknown size) always runs the distributed loop.

    driver_max_edges: override the regime bound (None → module default;
    0 forces the distributed loop — the scaling protocol uses this so
    the gate measures the large-graph regime).

    check_every: fingerprint (and convergence-check) only every k-th
    loop iteration. Each fingerprint is a driver round-trip — one
    collect plus one Catalyst plan of the accumulated (lazy-
    checkpointed) tree — and that serial wall is the dominant
    non-scaling term in local-mode benches. k=2 halves the round-trips
    at the cost of at most k-1 extra star passes over an already-
    converged (star-shaped, thus cheap) edge set. Sound because one
    large+small pass only ever LOWERS the label each node points at
    (targets are mins of current neighborhoods), so the deterministic
    pass map admits no cycles: an edge multiset equal to the one k
    passes earlier means every pass in between was a fixed point.
    """
    import time

    t0 = time.time()
    bound = DRIVER_CC_MAX_EDGES if driver_max_edges is None else driver_max_edges
    key_type = edges.schema["url_a"].dataType
    if driver_max_edges is None and isinstance(key_type, StringType):
        # the 10M default is sized for 8-byte surrogate keys (~160 MB
        # on the driver); url STRINGS are ~10× wider as Python objects
        # (the streaming tail clusters raw urls), so scale the regime
        # switch down rather than OOM the driver
        bound //= 10
    elif driver_max_edges is None and isinstance(key_type, BinaryType):
        # 16-byte binary uids (uid_bits=128) collect as Python bytes
        # objects with ~3-4× the footprint of the 8-byte longs the
        # default budget assumes
        bound //= 4
    if n_edges is not None and n_edges <= bound:
        return _cc_driver(edges, verbose, t0)
    return _cc_loop(edges, max_iterations, verbose, t0, check_every)


def _numpy_cc(a, b, n: int):
    """Vectorized union-find on dense int edge arrays: min-label hook +
    full pointer-jumping compression per round, active-edge filtering.
    O(log n) rounds, each a handful of whole-array numpy ops; ~7.6 s at
    10M edges/5M nodes dense worst case, 0.1 s at 400k dedup-shaped
    edges. Returns the fully-compressed parent array (parent[i] = index
    of the component's minimum node)."""
    import numpy as np

    parent = np.arange(n, dtype=np.int64)
    while True:
        pa, pb = parent[a], parent[b]
        active = pa != pb
        if not active.any():
            return parent
        a, b = a[active], b[active]
        pa, pb = pa[active], pb[active]
        lo = np.minimum(pa, pb)
        hi = np.maximum(pa, pb)
        # hook the larger root toward the smaller label; minimum.at
        # resolves colliding hooks to the smallest (order-independent →
        # deterministic)
        np.minimum.at(parent, hi, lo)
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt


def _cc_driver(edges: DataFrame, verbose: bool, t0: float) -> DataFrame:
    """Small-graph path: collect the slim (url_a, url_b) list, label on
    the driver, ship assignments back. Output rows are exactly the
    distributed loop's: one (url, cluster_id=component-min) row per
    node appearing in a non-self-loop edge. Works for any orderable key
    type — long surrogates, 16-byte binary digests, real url strings —
    because np.unique's sort order matches Spark's (signed int64;
    bytes / UTF-8 strings lexicographic)."""
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    key_type = edges.schema["url_a"].dataType
    out_schema = T.StructType(
        [
            T.StructField("url", key_type, False),
            T.StructField("cluster_id", key_type, False),
        ]
    )
    spark = edges.sparkSession
    pdf = edges.select("url_a", "url_b").toPandas()
    av, bv = pdf["url_a"].to_numpy(), pdf["url_b"].to_numpy()
    keep = av != bv  # self-loops assign nothing (matches _undirect)
    av, bv = av[keep], bv[keep]
    if len(av) == 0:
        return spark.createDataFrame([], out_schema)
    ids, inv = np.unique(np.concatenate([av, bv]), return_inverse=True)
    inv = inv.astype(np.int64, copy=False)
    parent = _numpy_cc(inv[: len(av)], inv[len(av):], len(ids))
    # ids is SORTED, so the min index within a component is the min key
    out = pd.DataFrame({"url": ids, "cluster_id": ids[parent]})
    if verbose:
        print(f"[cc] driver union-find: {time.time() - t0:.1f}s "
              f"({len(av)} edges, {len(ids)} nodes)")
    return spark.createDataFrame(out, out_schema)


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
