"""ANN similarity search: LSH-bucketed path vs the exact brute-force
baseline (recall), multi-probe lift, bucket-cap skew control, and the
BLAS matmul path vs brute force (SURVEY.md LLM-pipeline operators)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup.embeddings import (
    brute_force_topk,
    lsh_bucketed_topk,
    matmul_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _pairs(df, k):
    return {
        (r["q_id"], r["vec_id"])
        for r in df.filter(F.col("rank") <= k).collect()
    }


def _truth(emb, k):
    qs = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return _pairs(brute_force_topk(emb, qs, k=k), k)


def test_lsh_bucketed_recall_vs_brute_force(emb):
    k = 5
    truth = _truth(emb, k)
    got = _pairs(
        lsh_bucketed_topk(emb, k=k, n_planes=6, n_probes=7, n_tables=4), k
    )
    recall = len(truth & got) / len(truth)
    # random embeddings are the worst case for hyperplane LSH (no cluster
    # structure); 4 tables × 6 planes × hamming-1 probes still has to
    # recover most of the true top-5
    assert recall >= 0.5, f"multi-table multi-probe recall {recall:.3f}"


def test_tables_and_probes_lift_recall(emb):
    k = 5
    truth = _truth(emb, k)
    single = _pairs(
        lsh_bucketed_topk(emb, k=k, n_planes=6, n_probes=1, n_tables=1), k
    )
    multi = _pairs(
        lsh_bucketed_topk(emb, k=k, n_planes=6, n_probes=7, n_tables=4), k
    )
    r1 = len(truth & single) / len(truth)
    rm = len(truth & multi) / len(truth)
    assert rm > r1, f"single {r1:.3f} multi {rm:.3f}"


def test_bucket_cap_thins_degenerate_floods(spark):
    # 500 identical vectors (one bucket per table) + cap 50: the corpus
    # side of the join is thinned, and every query still returns k rows
    n, dim, k = 500, 8, 3
    rows = [(i, [1.0] * dim) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_bucketed_topk(
        df, k=k, n_planes=4, n_probes=1, n_tables=1, max_bucket=50
    ).cache()
    per_q = out.groupBy("q_id").count().agg(F.min("count")).collect()[0][0]
    assert per_q == k  # every query keeps a full top-k
    # fan-out is bounded: ~n * cap candidates, far below n²
    assert out.count() == n * k


def test_embedding_dup_pairs_finds_planted_near_dups(spark):
    from dedup.embeddings import embedding_dup_pairs

    rng = np.random.default_rng(9)
    base = rng.normal(size=(40, 32)).astype(np.float32)
    rows = []
    vid = 0
    planted = set()
    for i in range(40):
        rows.append((vid, base[i].tolist())); a = vid; vid += 1
        if i % 4 == 0:  # plant a near-dup: tiny perturbation
            near = base[i] + rng.normal(scale=0.01, size=32).astype(np.float32)
            rows.append((vid, near.tolist()))
            planted.add((a, vid)); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in embedding_dup_pairs(df, threshold_micro=990_000).collect()
    }
    # every planted near-identical pair found; no sub-threshold pair kept
    missing = planted - got
    assert not missing, f"missed planted near-dups: {missing}"


def test_matmul_topk_value_correct_vs_numpy_oracle(emb):
    # random embeddings have DENSE near-ties in their top-5, so exact
    # set-overlap between float32 BLAS and fixed-point paths is the wrong
    # assertion; instead: every returned neighbor's true (float64) cosine
    # must reach the query's true 5th-best cosine minus epsilon
    k, eps = 5, 1e-3
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -2.0)
    kth_best = np.sort(sims, axis=1)[:, -k]
    idx = {int(v): i for i, v in enumerate(pdf["vec_id"])}

    got = matmul_topk(
        emb, np.vstack(pdf["embedding"].to_numpy()),
        pdf["vec_id"].to_numpy(), k=k,
    ).collect()
    assert len(got) == len(pdf) * k
    for r in got:
        qi, vi = idx[r["q_id"]], idx[r["vec_id"]]
        assert sims[qi, vi] >= kth_best[qi] - eps, (r["q_id"], r["vec_id"])


def test_brute_force_topk_value_correct_vs_numpy_oracle(emb):
    k, eps = 5, 1e-3
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    m = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -2.0)
    kth_best = np.sort(sims, axis=1)[:, -k]
    idx = {int(v): i for i, v in enumerate(pdf["vec_id"])}

    qs = emb.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    got = brute_force_topk(emb, qs, k=k).collect()
    assert len(got) == len(pdf) * k
    for r in got:
        qi, vi = idx[r["q_id"]], idx[r["vec_id"]]
        assert sims[qi, vi] >= kth_best[qi] - eps, (r["q_id"], r["vec_id"])


def test_ivf_recall_vs_brute_force_and_determinism(emb):
    from dedup.embeddings import ivf_topk

    k = 5
    truth = _truth(emb, k)
    got1 = _pairs(ivf_topk(emb, k=k, n_centroids=16, nprobe=6), k)
    got2 = _pairs(ivf_topk(emb, k=k, n_centroids=16, nprobe=6), k)
    # deterministic: hash-thinned sample + fixed Lloyd iterations
    assert got1 == got2
    recall = len(truth & got1) / len(truth)
    # random embeddings are also IVF's worst case (no cluster structure);
    # probing 6/16 cells must still recover most of the true top-5
    assert recall >= 0.5, f"IVF recall {recall:.3f}"


def test_ivf_nprobe_lifts_recall(emb):
    from dedup.embeddings import ivf_fit_centroids, ivf_topk

    k = 5
    truth = _truth(emb, k)
    cents = ivf_fit_centroids(emb, n_centroids=16)
    lo = _pairs(ivf_topk(emb, k=k, nprobe=1, centroids=cents), k)
    hi = _pairs(ivf_topk(emb, k=k, nprobe=8, centroids=cents), k)
    r_lo = len(truth & lo) / len(truth)
    r_hi = len(truth & hi) / len(truth)
    assert r_hi >= r_lo
    assert r_hi > 0.5


def test_ivf_planted_cluster_is_exact(spark):
    """Vectors forming tight planted clusters land in the same cell, so
    IVF with even nprobe=1 finds their true neighbors exactly."""
    from dedup.embeddings import ivf_topk

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for c in range(6):
        center = rng.normal(size=16)
        center /= np.linalg.norm(center)
        for _ in range(10):
            v = center + rng.normal(scale=0.01, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = _pairs(ivf_topk(df, k=3, n_centroids=6, nprobe=1), 3)
    # every vector's top-3 must come from its own planted cluster
    for q, v in got:
        assert q // 10 == v // 10, (q, v)


def test_ivf_empty_corpus_degrades_gracefully(spark):
    from dedup.embeddings import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ivf_topk(empty, k=3).count() == 0


def test_lsh_empty_corpus_degrades_gracefully(spark):
    """Same contract as IVF: zero embedding rows → zero buckets and
    zero pairs, not a driver crash on first()."""
    from dedup.embeddings import lsh_bucketed_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert lsh_bucketed_topk(empty, k=3).count() == 0


def test_zero_norm_vector_cosine_is_zero(spark):
    """A zero-norm embedding (empty doc) must score cosine_micro 0 in
    BOTH cosine paths — 0/0 would be NaN, whose long cast is ANSI-fatal
    declaratively and platform-undefined in numpy."""
    from dedup.embeddings import brute_force_topk, lsh_bucketed_topk
    import numpy as np

    rows = [(0, [0.0] * 8), (1, [1.0] * 8), (2, [0.9] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = np.array([[0.0] * 8, [1.0] * 8])
    # declarative path: zero query against nonzero corpus and vice versa
    got = {(r["q_id"], r["vec_id"]): r["cosine_micro"]
           for r in brute_force_topk(emb, emb.selectExpr(
               "vec_id as q_id", "embedding as q_emb"), k=3).collect()}
    assert got[(0, 1)] == 0 and got[(1, 0)] == 0  # zero side → 0
    assert got[(1, 2)] > 990000                   # near-parallel pair
    # Arrow einsum path (exact re-rank tail inside the LSH channel)
    pairs = {(r["q_id"], r["vec_id"]): r["cosine_micro"]
             for r in lsh_bucketed_topk(emb, k=3).collect()}
    for (a, b), c in pairs.items():
        if 0 in (a, b):
            assert c == 0, (a, b, c)


def test_hyperplane_batch_keys_bit_equal_spec(emb):
    """The Arrow+BLAS bucket-key pass must be BIT-IDENTICAL to the
    declarative hyperplane_bucket spec expression — both sides run the
    dot in fixed-point int64, so the sign cannot depend on summation
    order (the property the batch path's matmul relies on)."""
    from dedup.embeddings import hyperplane_bucket, hyperplane_keys_batch

    seeds = [42 + 1000003 * t for t in range(3)]
    batch = hyperplane_keys_batch(emb, 5, seeds)
    spec = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("int").alias("tbl"),
                        hyperplane_bucket(F.col("embedding"), 5, s).alias(
                            "bucket"
                        ),
                    )
                    for t, s in enumerate(seeds)
                ]
            )
        ).alias("tk"),
    ).select("vec_id", F.col("tk.tbl"), F.col("tk.bucket"))
    assert batch.exceptAll(spec).count() == 0
    assert spec.exceptAll(batch).count() == 0


def test_cosine_micro_batch_bit_equal_declarative(emb):
    """The Arrow einsum cosine must equal the zip_with/aggregate
    fixed-point cosine value-for-value (exact int64 dot; identical IEEE
    double steps in the same order)."""
    from dedup.embeddings import (
        _fixed_point,
        cosine_micro_batch,
        dot_fixed,
        norm2_fixed,
    )

    fixed = emb.select(
        "vec_id", _fixed_point(F.col("embedding")).alias("v")
    ).withColumn("n2", norm2_fixed(F.col("v")))
    a = fixed.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("q"),
        F.col("n2").alias("q_n2"),
    ).limit(40)
    b = fixed.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("v2"),
        F.col("n2").alias("v_n2"),
    ).limit(40)
    j = a.crossJoin(b)
    cos = cosine_micro_batch()
    decl = F.floor(
        dot_fixed(F.col("q"), F.col("v2")).cast("double")
        / (
            F.sqrt(F.col("q_n2").cast("double"))
            * F.sqrt(F.col("v_n2").cast("double"))
        )
        * 1000000
    ).cast("long")
    diff = (
        j.select(
            (cos(F.col("q"), F.col("v2"), F.col("q_n2"), F.col("v_n2"))
             - decl).alias("d")
        )
        .filter(F.col("d") != 0)
        .count()
    )
    assert diff == 0


def test_null_embedding_rows_do_not_kill_kernels(spark):
    """Totality contract: one null embedding row must not abort the
    Arrow kernels — it is skipped (bucketing/ANN) or scored cosine 0
    (re-rank), matching the declarative paths' per-row degradation."""
    import numpy as np
    from dedup.embeddings import ivf_topk, lsh_bucketed_topk, matmul_topk

    rng = np.random.default_rng(2)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    rows.insert(7, (99, None))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert lsh_bucketed_topk(emb, k=3).filter("q_id = 99").count() == 0
    assert ivf_topk(emb, k=3, n_centroids=4, nprobe=2).filter(
        "q_id = 99").count() == 0
    qm = np.vstack([r[1] for r in rows if r[1] is not None][:4])
    qid = np.array([r[0] for r in rows if r[1] is not None][:4])
    got = matmul_topk(emb, qm, qid, k=3)
    assert got.count() == 12 and got.filter("vec_id = 99").count() == 0


def test_zero_norm_query_matmul_is_defined(spark):
    """A zero-norm query scores cosine 0 against everything instead of
    NaN garbage filling its top-k."""
    import numpy as np
    from dedup.embeddings import matmul_topk

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qm = np.vstack([np.zeros(8), np.asarray(rows[1][1])])
    res = matmul_topk(emb, qm, np.array([100, 1]), k=3).collect()
    zero_rows = [r for r in res if r["q_id"] == 100]
    assert len(zero_rows) == 3
    assert all(abs(r["cosine"]) < 1e-12 for r in zero_rows)


def test_stack_rows_all_null_batch_falls_back():
    """A batch whose embeddings are ALL null vstacks 'successfully' into
    an (n,1) object array whose .astype raises TypeError — the fallback
    must catch that too (one-corrupt-row-must-not-kill-the-scan covers
    the all-corrupt batch)."""
    import numpy as np
    import pandas as pd
    from dedup.embeddings import _stack_rows

    s = pd.Series([None, None, None])
    mat, keep = _stack_rows(s, np.float64)
    assert mat.shape[0] == 0 and not keep.any()
    mat2, keep2 = _stack_rows(s, np.float64, zero_null=True)
    assert mat2.shape == (3, 1) and keep2.all() and (mat2 == 0).all()


def test_hyperplane_batch_keys_null_first_row_degrades_per_row(spark):
    """The dim probe must come from a USABLE row: a null/empty embedding
    in the position first() happens to read must not blank the whole
    channel — only that row degrades (it gets no bucket keys)."""
    from dedup.embeddings import hyperplane_keys_batch

    rows = [(0, None), (1, []), (2, [0.5] * 8), (3, [-0.5] * 8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    got = hyperplane_keys_batch(emb, 4, [42, 43]).collect()
    assert {r["vec_id"] for r in got} == {2, 3}
    assert len(got) == 4  # 2 usable rows x 2 tables

    # all-null corpus: empty result, not a crash
    allnull = spark.createDataFrame(
        [(0, None), (1, [])], "vec_id long, embedding array<float>"
    )
    assert hyperplane_keys_batch(allnull, 4, [42]).count() == 0


def test_ivf_index_save_load_roundtrip_and_search_equivalence(spark, tmp_path):
    """The deployment shape: fit once, save, load in a 'later run', and
    get bit-identical search results to the in-memory model."""
    import numpy as np

    from dedup.embeddings import (
        ivf_fit_centroids,
        ivf_load_index,
        ivf_save_index,
        ivf_topk,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_fit_centroids(emb, n_centroids=8, sample=64, seed=5)
    path = str(tmp_path / "ivf_index")
    ivf_save_index(spark, cents, path)
    loaded = ivf_load_index(spark, path)
    assert loaded.dtype == np.float32 and loaded.shape == cents.shape
    assert np.array_equal(loaded, cents.astype(np.float32))

    a = ivf_topk(emb, k=3, nprobe=4, centroids=cents).collect()
    b = ivf_topk(emb, k=3, nprobe=4, centroids=loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0

    # missing / empty index degrades to the no-model shape, not a crash
    assert ivf_load_index(spark, str(tmp_path / "nope")).shape == (0, 0)
