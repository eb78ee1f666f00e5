"""spark-submit driver e2e for the media (thumbnail-hash) channel:
`--channels media --media-input <parquet>` must carry image-identity
evidence into clustering THROUGH the reason gates — two pages with
identical images and unrelated text cluster; an equally-identical image
pair sharing a source stays apart (noSameLOWTags analogue), because
media pairs bypass only the Jaccard gate, never the reason stack
(the reference feeds every pair through canMerge regardless of
provenance, /root/reference/lib/marc-record-merge-melindautils.js:84-104).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from dedup.corpus import generate_corpus


def _bmp(cls: int) -> bytearray:
    from dedup.multimodal import pack_bmp

    r = np.arange(24, dtype=np.uint32)[:, None]
    c = np.arange(32, dtype=np.uint32)[None, :]
    pix = ((cls * 37 + 11 * r + 7 * c) % 256).astype(np.uint8)
    return bytearray(pack_bmp(pix))


@pytest.fixture(scope="module")
def media_run(spark, tmp_path_factory):
    import dedup.session as session
    from dedup import cli

    tmp_path = tmp_path_factory.mktemp("cli_media")
    _pages_pdf, truth_pdf, src_pdf = generate_corpus(200, 42)

    # planted urls: a/b = a base + its NEAR mutant (the corpus plants
    # these to pass every reason gate — but under `--channels
    # exact,media` no text channel links them: they are not
    # byte-identical, so ONLY the media evidence can merge them);
    # c/d = two docs SHARING a source with identical image class 2
    # (media proposes, the source-overlap gate disposes)
    by_cluster: dict[int, dict[str, list[str]]] = {}
    for r in truth_pdf.itertuples():
        by_cluster.setdefault(r.true_cluster_id, {}).setdefault(
            r.dup_kind, []
        ).append(r.url)
    a, b = next(
        (m["unique"][0], m["near"][0])
        for m in by_cluster.values()
        if "unique" in m and "near" in m
    )
    uniq = [
        r.url for r in truth_pdf.itertuples() if r.dup_kind == "unique"
    ]
    srcs_of: dict[str, set[str]] = {}
    for u, s in zip(src_pdf["url"], src_pdf["source"]):
        srcs_of.setdefault(u, set()).add(s)
    c, d = next(
        (u, v)
        for i, u in enumerate(uniq)
        for v in uniq[i + 1:]
        if u not in (a, b) and v not in (a, b)
        and srcs_of.get(u) and srcs_of.get(v) and (srcs_of[u] & srcs_of[v])
    )

    rows = [(a, _bmp(1)), (b, _bmp(1)), (c, _bmp(2)), (d, _bmp(2))]
    media_path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "url string, payload binary").write.parquet(
        media_path
    )

    out_dir = str(tmp_path / "out")
    orig_get_spark = session.get_spark
    session.get_spark = lambda *a_, **k_: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main([
            "--synthetic", "200", "--seed", "42",
            "--output", out_dir,
            "--channels", "exact,media",
            "--media-input", media_path,
        ])
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop
    assert rc == 0
    metrics = [
        json.loads(line)
        for line in open(f"{out_dir}/metrics.jsonl")
        if line.strip()
    ]
    return out_dir, metrics, (a, b, c, d)


def test_media_pair_clusters_through_cli(spark, media_run):
    out_dir, _metrics, (a, b, _c, _d) = media_run
    assign = {
        r["url"]: r["cluster_id"]
        for r in spark.read.parquet(f"{out_dir}/assignments").collect()
    }
    assert assign[a] == assign[b]


def test_same_source_media_pair_stays_gated(spark, media_run):
    out_dir, _metrics, (_a, _b, c, d) = media_run
    assign = {
        r["url"]: r["cluster_id"]
        for r in spark.read.parquet(f"{out_dir}/assignments").collect()
    }
    assert assign[c] != assign[d]


def test_media_channel_reports_hot_buckets_stage(media_run):
    _out, metrics, _urls = media_run
    assert any(m["stage"] == "media_hot_buckets" for m in metrics)


def test_media_channel_requires_media_input(spark, tmp_path_factory):
    import dedup.session as session
    from dedup import cli

    tmp_path = tmp_path_factory.mktemp("cli_media_err")
    orig_get_spark = session.get_spark
    session.get_spark = lambda *a_, **k_: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        with pytest.raises(SystemExit):
            cli.main([
                "--synthetic", "50",
                "--output", str(tmp_path / "out"),
                "--channels", "media",
            ])
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop
