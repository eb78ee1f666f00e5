"""Connected components: large-star/small-star vs a pure-python
union-find reference on random graphs + adversarial shapes (chains,
stars, cliques)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup.cluster import assignments_with_singletons, connected_components


def _uf_reference(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to component min
    comp: dict[str, list[str]] = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges: list[tuple[str, str]]):
    df = spark.createDataFrame(edges, "url_a string, url_b string")
    got = {
        r["url"]: r["cluster_id"] for r in connected_components(df).collect()
    }
    assert got == _uf_reference(edges)


def test_cc_chain(spark):
    # worst case for label propagation; log-rounds for star algorithms
    _check(spark, [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)])


def test_cc_star_and_cliques(spark):
    edges = [("hub", f"leaf{i:02d}") for i in range(20)]
    edges += [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    _check(spark, edges)


def test_cc_random_graph(spark):
    rng = np.random.default_rng(3)
    edges = [
        (f"v{int(a):03d}", f"v{int(b):03d}")
        for a, b in rng.integers(0, 60, (80, 2))
        if a != b
    ]
    _check(spark, edges)


def test_cc_driver_path_matches_loop_and_reference(spark):
    """The small-graph driver union-find (taken when n_edges is passed
    and small) must emit EXACTLY the distributed loop's assignments —
    for string, long, and 16-byte binary keys (the three key types the
    pipeline runs CC on)."""
    rng = np.random.default_rng(11)
    raw = [(int(a), int(b)) for a, b in rng.integers(0, 300, (400, 2))]
    raw += [(i, i + 1) for i in range(500, 540)]       # chain
    raw += [(600, 600), (601, 601)]                    # self-loops drop

    casts = {
        "string": lambda x: f"v{x:04d}",
        "long": lambda x: x,
        "binary": lambda x: x.to_bytes(16, "big"),
    }
    for typ, cast in casts.items():
        edges = [(cast(a), cast(b)) for a, b in raw]
        df = spark.createDataFrame(edges, f"url_a {typ}, url_b {typ}")
        via_loop = {
            (r["url"], r["cluster_id"])
            for r in connected_components(df).collect()
        }
        via_driver = {
            (r["url"], r["cluster_id"])
            for r in connected_components(df, n_edges=len(edges)).collect()
        }
        assert via_driver == via_loop, typ
    # and both agree with the python reference on the string variant
    sedges = [(casts["string"](a), casts["string"](b)) for a, b in raw
              if a != b]
    sdf = spark.createDataFrame(sedges, "url_a string, url_b string")
    got = {
        r["url"]: r["cluster_id"]
        for r in connected_components(sdf, n_edges=len(sedges)).collect()
    }
    assert got == _uf_reference(sedges)


def test_cc_driver_path_empty_and_self_loop_only(spark):
    df = spark.createDataFrame([("a", "a")], "url_a string, url_b string")
    assert connected_components(df, n_edges=1).count() == 0
    empty = spark.createDataFrame([], "url_a long, url_b long")
    out = connected_components(empty, n_edges=0)
    assert out.count() == 0 and out.columns == ["url", "cluster_id"]


def test_singletons_added(spark):
    edges = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    allu = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    got = {
        r["url"]: r["cluster_id"]
        for r in assignments_with_singletons(
            connected_components(edges), allu
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}
