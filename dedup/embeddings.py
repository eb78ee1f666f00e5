"""Similarity search over embedding columns (array<float>).

Two paths:

* `brute_force_topk` — exact cosine top-k as a declarative plan:
  broadcast the (small) query set, JVM-side dot products via
  zip_with/aggregate, window top-k. Baseline + oracle-friendly
  (integer-scaled math mirrors the DuckDB SQL in __spark_entry__).
* `matmul_topk` — production path: queries broadcast as one numpy
  matrix, corpus streamed through mapInPandas in Arrow batches, one
  BLAS matmul per batch, per-batch partial top-k, then a global top-k
  (combiner pattern: only k rows per (query, batch) reach the shuffle).
* `lsh_bucketed_topk` — scale path: random-hyperplane signs (SimHash
  for vectors, Charikar'02) give a bucket key; candidates = same-bucket
  rows (multi-probe across sign flips), exact re-rank inside buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

SCALE = 1 << 20  # float → fixed-point scale for engine-stable math


def _stack_rows(
    col: "pd.Series", dtype, zero_null: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(matrix, keep_mask) for an Arrow embedding column. Fast path is
    ONE vstack (clean batches — the overwhelming case); a null or
    wrong-length row falls back to a row-wise fill so one corrupt
    embedding cannot kill the whole scan (the declarative paths
    degrade per-row; the kernels must match). zero_null=True keeps
    every row, substituting a zero vector (→ cosine 0 downstream);
    otherwise corrupt rows are dropped via the mask."""
    vals = col.to_numpy()
    # null rows must be detected BEFORE the vstack fast path: a
    # null-mixed batch usually raises ValueError (ragged), but an
    # ALL-null batch vstacks "successfully" into an (n,1) object array
    # that .astype silently turns into NaN rows with keep=True —
    # poisoning every downstream cosine instead of degrading per-row
    if not any(v is None for v in vals):
        try:
            return (
                np.vstack(vals).astype(dtype),
                np.ones(len(vals), dtype=bool),
            )
        except (ValueError, TypeError):
            pass  # ragged/empty rows: fall through to the row-wise fill
    dim = next(
        (len(v) for v in vals if v is not None and len(v) > 0), 1
    )
    keep = np.array(
        [v is not None and len(v) == dim for v in vals], dtype=bool
    )
    out = np.zeros((len(vals), dim), dtype=dtype)
    for i, v in enumerate(vals):
        if keep[i]:
            out[i] = v
    if zero_null:
        return out, np.ones(len(vals), dtype=bool)
    return out[keep], keep


def _fixed_point(col: Column) -> Column:
    """array<float> → array<long> micro-scaled (floor), deterministic."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def dot_fixed(a: Column, b: Column) -> Column:
    """Exact integer dot product of two fixed-point vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_fixed(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k per query.

    embeddings: (vec_id, embedding array<float>); queries: same shape
    (q_id, q_emb). Returns (q_id, vec_id, rank, cosine_micro).
    """
    corpus = embeddings.select(
        "vec_id", _fixed_point(F.col("embedding")).alias("v")
    ).withColumn("v_n2", norm2_fixed(F.col("v")))
    qs = F.broadcast(
        queries.select(
            F.col("q_id"), _fixed_point(F.col("q_emb")).alias("q")
        ).withColumn("q_n2", norm2_fixed(F.col("q")))
    )
    joined = corpus.crossJoin(qs).filter(F.col("vec_id") != F.col("q_id"))
    dot = dot_fixed(F.col("q"), F.col("v"))
    cosine = dot.cast("double") / (
        F.sqrt(F.col("q_n2").cast("double")) * F.sqrt(F.col("v_n2").cast("double"))
    )
    scored = joined.select(
        "q_id",
        "vec_id",
        # zero-norm guard: same semantics as cosine_micro_batch (0/0
        # would be NaN, which ANSI-mode cast-to-long rejects)
        F.when(
            (F.col("q_n2") == 0) | (F.col("v_n2") == 0), F.lit(0).cast("long")
        ).otherwise(
            F.floor(cosine * 1000000).cast("long")
        ).alias("cosine_micro"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_micro").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine_micro")
    )


def matmul_topk(
    embeddings: DataFrame, query_matrix: np.ndarray, query_ids: np.ndarray,
    k: int = 5,
) -> DataFrame:
    """Production ANN baseline: one BLAS matmul per Arrow batch, partial
    top-k per batch (only k rows per query per batch shuffle), global
    top-k window at the end."""
    # same zero-norm floor as the corpus side: a zero query must score
    # cosine 0 everywhere (NaN would sort above every real cosine in
    # the descending window and fill its top-k with garbage)
    qm = query_matrix / np.maximum(
        np.linalg.norm(query_matrix, axis=1, keepdims=True), 1e-30
    )
    qm = qm.astype(np.float32)
    qids = query_ids.copy()

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m, keep = _stack_rows(pdf["embedding"], np.float32)
            if not len(m):
                continue
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = qm @ m.T  # (nq, batch)
            # mask self-matches BEFORE the partial top-k — filtering them
            # downstream would let the self row consume a top-k slot
            batch_ids = pdf["vec_id"].to_numpy()[keep]
            sims[qids[:, None] == batch_ids[None, :]] = -np.inf
            top = min(k, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = {
                "q_id": np.repeat(qids, top),
                "vec_id": batch_ids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel().astype(
                    "float64"
                ),
            }
            yield pd.DataFrame(rows)

    partial = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema="q_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.filter(F.col("q_id") != F.col("vec_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold_micro: int = 950_000,
    n_planes: int = 6,
    n_probes: int = 7,
    n_tables: int = 4,
    max_bucket: int = 4096,
    k: int = 50,
    cache_registry: list | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate channel: (vec_id_a, vec_id_b,
    cosine_micro) pairs with cosine ≥ threshold, found through the
    multi-table hyperplane LSH index (same recall machinery as
    lsh_bucketed_topk) and exactly re-ranked — the semantic-dup
    complement to the lexical MinHash/SimHash channels. Near-identical
    embeddings agree on almost every hyperplane sign, so LSH recall is
    far higher here than in the generic top-k regime.

    BOUNDED coverage, not the full ≥threshold relation: each vector
    contributes at most its k nearest above-threshold partners, so a
    near-duplicate family larger than k emits a connected covering of
    the family rather than all O(m²) pairs (downstream connected
    components recovers the full cluster; raise k for pairwise-complete
    output on small inputs). The oracle spec query
    (driver_queries.q_embedding_dups) is the uncapped relation on a
    corpus whose families are far below k, where the two coincide."""
    topk = lsh_bucketed_topk(
        embeddings, k=k, n_planes=n_planes, seed=42,
        n_probes=n_probes, n_tables=n_tables, max_bucket=max_bucket,
        cache_registry=cache_registry,
    )
    return (
        topk.filter(F.col("cosine_micro") >= threshold_micro)
        .select(
            F.least("q_id", "vec_id").alias("vec_id_a"),
            F.greatest("q_id", "vec_id").alias("vec_id_b"),
            "cosine_micro",
        )
        .groupBy("vec_id_a", "vec_id_b")
        .agg(F.max("cosine_micro").alias("cosine_micro"))
    )


def hyperplane_bucket(emb: Column, n_planes: int = 16, seed: int = 42) -> Column:
    """Sign-bit bucket key from deterministic pseudo-random hyperplanes
    — the SPEC expression (portable, no model to ship). Production
    (`lsh_bucketed_topk`) computes the same keys through one Arrow+BLAS
    `hyperplane_keys_batch` pass; `tests/test_embeddings.py` holds the
    two bit-equal.

    Plane weights derive from xxhash64(plane, dim, seed) mapped to
    integers in [-1000, 1000]; the dot runs in FIXED-POINT int64
    (floor(x·2^20) · w), so the sign is order-independent — integer
    addition is associative, which is what lets a numpy matmul, this
    interpreted expression, and a SQL oracle agree bit-for-bit. A
    float accumulation would tie the sign to summation order at
    near-zero dots.
    """
    def plane_bit(p: Column) -> Column:
        dims = F.sequence(F.lit(0), F.size(emb) - 1)
        dot = F.aggregate(
            F.zip_with(
                emb,
                dims,
                lambda x, i: F.floor(x.cast("double") * F.lit(SCALE)).cast("long")
                * (F.pmod(F.xxhash64(p, i, F.lit(seed)), F.lit(2001)) - 1000),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    bits = F.transform(F.sequence(F.lit(0), F.lit(n_planes - 1)), plane_bit)
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b
    )


_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _plane_matrix(spark, dim: int, n_planes: int, seed: int) -> np.ndarray:
    """(n_planes × dim) int64 weight matrix for one hyperplane table,
    derived by the SAME xxhash64 calls the spec expression makes (one
    tiny Spark job over n_planes·dim ids, collected to the driver —
    the whole model is ~n_planes·dim·8 bytes, broadcast via closure).
    Column types matter: the spec's plane/dim indices come from
    sequence(int, int), so both are cast to int here or the hashes
    would differ. Memoized per (dim, n_planes, seed) — the weights are
    a pure function of those, and repeated ANN calls (bench repeats,
    the dup channel) shouldn't re-run the derivation job."""
    key = (dim, n_planes, seed)
    if key in _PLANE_CACHE:
        return _PLANE_CACHE[key]
    rows = (
        spark.range(n_planes * dim)
        .select(
            (F.col("id") / dim).cast("int").alias("p"),
            F.pmod(F.col("id"), F.lit(dim)).cast("int").alias("i"),
        )
        .select(
            "p", "i",
            (F.pmod(F.xxhash64(F.col("p"), F.col("i"), F.lit(seed)), F.lit(2001))
             - 1000).alias("w"),
        )
        .collect()
    )
    w = np.zeros((n_planes, dim), dtype=np.int64)
    for r in rows:
        w[r["p"], r["i"]] = r["w"]
    _PLANE_CACHE[key] = w
    return w


def hyperplane_keys_batch(
    embeddings: DataFrame, n_planes: int, seeds: list[int]
) -> DataFrame:
    """(vec_id, tbl, bucket) for every table in `seeds`, via ONE
    Arrow+BLAS pass: fixed-point rows · stacked plane matrix, signs →
    bucket ints. Bit-identical to exploding `hyperplane_bucket` per
    table (integer math, see there) at a per-row cost of one matmul
    lane instead of n_tables·n_planes·dim interpreted lambda steps —
    the spec expression measured ~2.5 ms/row at dim 64, which is the
    wrong cost model for a 10⁹-vector corpus."""
    spark = embeddings.sparkSession
    # dim probe must come from a USABLE row: probing an arbitrary
    # first() row would return empty for the whole corpus if that one
    # row happened to be null/empty — a single corrupt row must degrade
    # per-row (the _stack_rows mask handles it), never corpus-wide
    first = (
        embeddings.filter(F.size("embedding") > 0)
        .select(F.size("embedding"))
        .first()
    )
    if first is None or first[0] is None or first[0] <= 0:
        # no row has a usable embedding: no buckets, not a crash
        return spark.createDataFrame(
            [], "vec_id long, tbl int, bucket long"
        )
    dim = first[0]
    wall = np.vstack(
        [_plane_matrix(spark, dim, n_planes, s) for s in seeds]
    )  # (n_tables·n_planes, dim)
    n_tables = len(seeds)

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw, keep = _stack_rows(pdf["embedding"], np.float64)
            if not len(raw):
                continue
            v = np.floor(raw * SCALE).astype(np.int64)
            bits = (v @ wall.T >= 0).astype(np.int64)  # (n, T·P)
            ids = pdf["vec_id"].to_numpy()[keep]
            for t in range(n_tables):
                bt = bits[:, t * n_planes:(t + 1) * n_planes]
                bucket = np.zeros(len(v), dtype=np.int64)
                for j in range(n_planes):
                    bucket = bucket * 2 + bt[:, j]
                yield pd.DataFrame(
                    {"vec_id": ids, "tbl": t, "bucket": bucket}
                )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        keys, schema="vec_id long, tbl int, bucket long"
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    n_probes: int = 7,
    n_tables: int = 4,
    max_bucket: int = 4096,
    cache_registry: list | None = None,
) -> DataFrame:
    """All-pairs ANN: exact cosine re-rank within hyperplane buckets.
    Recall comes from bucket collisions of near vectors; report is
    (q_id=vec_id_a, vec_id=vec_id_b, rank, cosine_micro).

    Standard LSH recall structure (Indyk-Motwani):
    * `n_tables` independent hyperplane sets — a neighbor missed by one
      table's split is recovered by another (recall ≈ 1-(1-p^b)^L).
    * multi-probe (Lv et al., VLDB'07): each query additionally probes
      the `n_probes - 1` buckets at Hamming distance 1 (single sign-bit
      flips) per table — near-boundary neighbors recovered without
      growing the corpus side.
    * bucket cap: per-table buckets over `max_bucket` (degenerate
      embedding floods) are thinned CORPUS-side by a deterministic hash
      of vec_id down to ~max_bucket rows — bounded join fan-out, no
      window skew, every query still gets results.

    Candidate pairs are generated on slim (id, table, bucket) rows and
    DISTINCT-ed before the vectors join in for the exact re-rank, so
    multi-table collisions never re-rank a pair twice.
    """
    n_probes = max(1, min(n_probes, n_planes + 1))

    from dedup.session import ensure_scan_parallelism

    # single-row-group embedding drops scan as one task and the Arrow
    # key/cosine kernels inherit it (guide §2.5); no-op at real scale
    embeddings = ensure_scan_parallelism(embeddings)

    fixed = embeddings.select(
        "vec_id", _fixed_point(F.col("embedding")).alias("v")
    ).withColumn("v_n2", norm2_fixed(F.col("v")))

    # one Arrow+BLAS pass for all tables' bucket keys (bit-identical to
    # the hyperplane_bucket spec expression — parity-tested). THREE
    # consumers (bucket sizes, corpus side, probe side): persist the
    # slim 20-byte rows under a registry (which owns the release);
    # registry-less callers trade kernel recomputes for not pinning a
    # session-lifetime cache.
    keyed = hyperplane_keys_batch(
        embeddings, n_planes, [seed + 1000003 * t for t in range(n_tables)]
    )
    if cache_registry is not None:
        keyed = keyed.persist()
        cache_registry.append(keyed)

    sizes = keyed.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("bsz"))
    hot = sizes.filter(F.col("bsz") > max_bucket)
    corpus_keys = (
        keyed.join(F.broadcast(hot), ["tbl", "bucket"], "left")
        .filter(
            F.col("bsz").isNull()
            | (
                # the table index SALTS the thinning coin: near-identical
                # vectors share over-cap buckets in EVERY table, so a
                # vec_id-only hash would thin the same pairs in all L
                # tables at once and the 1-(1-p^b)^L multi-table recall
                # term would never recover them — per-table independent
                # coins cut that correlated loss to (1/d)^L
                F.pmod(
                    F.xxhash64("vec_id", "tbl"),
                    (F.col("bsz") / F.lit(max_bucket)).cast("long") + 1,
                )
                == 0
            )
        )
        .drop("bsz")
    )

    probe_keys = F.slice(
        F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        ),
        1,
        n_probes,
    )
    probes = keyed.select(
        F.col("vec_id").alias("q_id"),
        "tbl",
        F.explode(probe_keys).alias("bucket"),
    )
    cand = (
        probes.join(corpus_keys, ["tbl", "bucket"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id")
        .distinct()
    )

    return _exact_rerank_topk(cand, fixed, k)


def cosine_micro_batch() -> Column:
    """Arrow-batched exact fixed-point cosine: bit-identical to the
    declarative `floor(dot_fixed(q,v)/ (sqrt(q_n2)·sqrt(v_n2)) · 10⁶)`
    (int64 dot is order-independent; the float steps are the same IEEE
    ops in the same order; all int→double conversions stay < 2⁵³).
    The interpreted zip_with/aggregate dot measured ~13 s over 1.5 M
    64-dim candidate pairs — ~100 M lambda steps; einsum does the same
    work in milliseconds per batch."""
    @F.pandas_udf("long")
    def _cos(q: pd.Series, v: pd.Series, q_n2: pd.Series, v_n2: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="int64")
        # zero_null: a null vector in a candidate pair becomes a zero
        # row → dot 0, den 0 → the guard below scores it cosine 0
        # (one corrupt row must not kill the re-rank stage)
        a, _ = _stack_rows(q, np.int64, zero_null=True)
        b, _ = _stack_rows(v, np.int64, zero_null=True)
        if a.shape[1] != b.shape[1]:  # degenerate all-null side
            w = max(a.shape[1], b.shape[1])
            a = np.pad(a, ((0, 0), (0, w - a.shape[1])))
            b = np.pad(b, ((0, 0), (0, w - b.shape[1])))
        dots = np.einsum("ij,ij->i", a, b).astype(np.float64)
        den = (
            np.sqrt(q_n2.to_numpy().astype(np.float64))
            * np.sqrt(v_n2.to_numpy().astype(np.float64))
        )
        # zero-norm vector (empty doc): cosine defined as 0 — 0/0 would
        # be NaN, whose int64 cast is platform-undefined
        cos = np.divide(dots, den, out=np.zeros_like(dots), where=den > 0)
        return pd.Series(np.floor(cos * 1000000.0).astype(np.int64))

    return _cos


def _exact_rerank_topk(cand: DataFrame, fixed: DataFrame, k: int) -> DataFrame:
    """Shared tail of the bucketed ANN paths (LSH + IVF): candidates
    (q_id, vec_id) join the fixed-point vectors for an exact cosine,
    then a per-query top-k window. Only candidate pairs ship vectors;
    the cosine itself is one Arrow einsum per batch (exact — see
    cosine_micro_batch), not an interpreted per-row lambda chain."""
    qa = fixed.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q"),
        F.col("v_n2").alias("q_n2"),
    )
    j = cand.join(qa, "q_id").join(fixed, "vec_id")
    cos = cosine_micro_batch()
    scored = j.select(
        "q_id", "vec_id",
        cos(F.col("q"), F.col("v"), F.col("q_n2"), F.col("v_n2")).alias(
            "cosine_micro"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine_micro").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------------- IVF
def ivf_fit_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer: spherical k-means (Lloyd) on a DETERMINISTIC
    hash-thinned corpus sample, driver-side numpy.

    The model is tiny (n_centroids × dim floats) and broadcasts; at
    100 TB the sample is a bounded thinning scan (pmod(xxhash64(id), p)
    == 0 — no shuffle, no random state), never a full collect. Assign
    by max dot over L2-normalized vectors; empty cells keep their
    previous centroid; init = first n_centroids sample rows in vec_id
    order (deterministic given (seed, corpus)).

    Sample bound: p = ceil(n / sample) keeps the expected collected
    rows at n/p ∈ (sample/2, sample] — with floor division p could hit
    1 for any n < 2·sample and collect the whole corpus. The fit costs
    one extra count() action over the corpus (noted; callers fitting in
    a loop should pass `centroids` instead)."""
    n = embeddings.count()
    p = max(1, -(-n // max(sample, 1)))  # ceil(n / sample)
    pdf = (
        embeddings.filter(F.pmod(F.xxhash64("vec_id") + F.lit(seed), F.lit(p)) == 0)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    if len(pdf) == 0:
        # empty corpus (or fully filtered): no model to fit — callers
        # (ivf_topk) degrade to an empty result like the LSH path does
        return np.zeros((0, 0), dtype=np.float32)
    m, _keep = _stack_rows(pdf["embedding"], np.float64)
    if not len(m):
        return np.zeros((0, 0), dtype=np.float32)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    kc = min(n_centroids, len(m))
    cents = m[:kc].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(kc):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-30:
                    cents[c] = v / norm
    return cents.astype(np.float32)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """All-pairs ANN, IVF flavor (the coarse-quantizer scale path next
    to the hyperplane-LSH one): corpus rows are assigned to their
    nearest-centroid cell ONCE; each query probes its `nprobe` nearest
    cells; exact cosine re-rank runs on probed-cell candidates only.

    Same report shape as lsh_bucketed_topk: (q_id, vec_id, rank,
    cosine_micro). Cell assignment and probe lists are one Arrow
    `mapInPandas` pass each (a BLAS matvec against the broadcast
    centroid matrix — no per-row Python); candidates are slim
    (q_id, vec_id) rows DISTINCT-ed before any vector joins."""
    from dedup.session import ensure_scan_parallelism

    # same single-row-group scan guard as lsh_bucketed_topk (§2.5);
    # applied before the fit so its sample scan parallelizes too
    embeddings = ensure_scan_parallelism(embeddings)

    cents = (
        centroids
        if centroids is not None
        else ivf_fit_centroids(embeddings, n_centroids, seed=seed)
    )
    cmat = cents.astype(np.float32)
    if len(cmat) == 0:
        # no quantizer (empty corpus) → empty result, same schema
        return embeddings.sparkSession.createDataFrame(
            [], "q_id long, vec_id long, cosine_micro long, rank int"
        )
    npb = max(1, min(nprobe, len(cmat)))

    def cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m, keep = _stack_rows(pdf["embedding"], np.float32)
            if not len(m):
                continue
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = m @ cmat.T  # (batch, n_centroids)
            # corpus cell = argmin index among max-sims (ties → lowest id)
            cell = np.argmax(sims, axis=1)
            # query probes = nprobe best cells
            order = np.argsort(-sims, kind="stable", axis=1)[:, :npb]
            out = {
                "vec_id": np.repeat(pdf["vec_id"].to_numpy()[keep], npb),
                "probe_cell": order.ravel().astype("int64"),
                "own_cell": np.repeat(cell.astype("int64"), npb),
                "probe_rank": np.tile(np.arange(npb, dtype="int64"), len(m)),
            }
            yield pd.DataFrame(out)

    assigned = embeddings.select("vec_id", "embedding").mapInPandas(
        cells,
        schema="vec_id long, probe_cell long, own_cell long, probe_rank long",
    )
    # TWO consumers (cell membership + probe lists) with different
    # downstream shuffles — unpersisted, the Arrow+BLAS cells kernel
    # would run over the full corpus twice. Persist only under a
    # registry (which owns the release); registry-less callers trade one
    # kernel recompute for not pinning a session-lifetime cache.
    if cache_registry is not None:
        assigned = assigned.persist()
        cache_registry.append(assigned)
    corpus_cells = (
        assigned.filter(F.col("probe_rank") == 0)
        .select("vec_id", F.col("own_cell").alias("cell"))
    )
    probes = assigned.select(
        F.col("vec_id").alias("q_id"), F.col("probe_cell").alias("cell")
    )
    cand = (
        probes.join(corpus_cells, "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    fixed = embeddings.select(
        "vec_id", _fixed_point(F.col("embedding")).alias("v")
    ).withColumn("v_n2", norm2_fixed(F.col("v")))
    return _exact_rerank_topk(cand, fixed, k)


def ivf_save_index(spark, centroids: np.ndarray, path: str) -> None:
    """Persist a fitted IVF coarse quantizer (ivf_fit_centroids output)
    as parquet (cell, weights) rows — the build-once / query-many
    deployment shape: at 100 TB the corpus snapshot's quantizer is
    fitted once and every later search run (or executor) loads the tiny
    model instead of re-scanning the corpus. One row per centroid, cell
    ids explicit so the load is order-independent."""
    # enforce the lossless round-trip contract at the door: the table
    # schema is array<float>, so a float64 matrix would silently
    # downcast on write — cast HERE so save(load(x)) == load(save(x))
    # for every caller, not just ivf_fit_centroids output (ADVICE r5)
    centroids = np.asarray(centroids, dtype=np.float32)
    rows = [
        (int(c), [float(x) for x in centroids[c]])
        for c in range(len(centroids))
    ]
    spark.createDataFrame(
        rows, "cell int, weights array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def ivf_load_index(spark, path: str) -> np.ndarray:
    """Load a quantizer saved by ivf_save_index. Returns the same
    (n_centroids, dim) float32 matrix regardless of file/row order; an
    empty or missing-dir index degrades to the no-model shape ivf_topk
    already handles (empty result, never a crash)."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.parquet(path).collect()
    except AnalysisException:
        return np.zeros((0, 0), dtype=np.float32)
    if not rows:
        return np.zeros((0, 0), dtype=np.float32)
    by_cell = sorted(rows, key=lambda r: r["cell"])
    return np.asarray(
        [list(r["weights"]) for r in by_cell], dtype=np.float32
    )
