"""spark-submit driver e2e with BOTH side tables + authority sources
active — the reference runs the host gate and the authorized-format
override on every call (marc-record-merge-melindautils.js:84-96,172),
so the cli must be able to mount them:

* --authorized-names: a planted both-authorized cluster is routed to
  `rejected` (rejected_survivors > 0 in metrics).
* --host-ids: every pair touching a host record is blocked → the
  planted host doc ends as a singleton cluster.
* --authority-sources: an authority-source member beats the freshest
  member in survivor selection.
"""

from __future__ import annotations

import json

import pytest

from dedup.corpus import generate_corpus


def _host(url: str) -> str:
    return url.split("/")[2]


MERGEABLE = {"unique", "exact", "near", "simhash_near", "substring"}


@pytest.fixture(scope="module")
def plan():
    """Pick three disjoint planted clusters for the three features."""
    pages_pdf, truth_pdf, src_pdf = generate_corpus(200, 42)
    ts = dict(zip(pages_pdf["url"], pages_pdf["warc_ts"]))
    src_of = dict(zip(src_pdf["url"], src_pdf["source"]))  # 1st source/url
    members: dict[int, list[tuple[str, str]]] = {}
    for r in truth_pdf.itertuples():
        if r.dup_kind in MERGEABLE:
            members.setdefault(r.true_cluster_id, []).append(
                (r.url, r.dup_kind)
            )
    # clusters with >= 3 mergeable members (base + >= 2 dups)
    rich = {
        cid: m for cid, m in members.items()
        if len(m) >= 3 and any(k == "exact" for _u, k in m)
    }
    cids = sorted(rich)
    assert len(cids) >= 3, "corpus too small for the 3-feature plan"

    # reject cluster: authorize two member hosts (distinct canonicals)
    x = rich[cids[0]]
    x_hosts = sorted({_host(u) for u, _k in x})[:2]
    assert len(x_hosts) == 2
    taken = set(x_hosts)

    # authority cluster: a NON-freshest dup member whose source is unique
    # in the cluster; hosts must not collide with the authorized ones
    choice = None
    for cid in cids[1:]:
        m = rich[cid]
        if {_host(u) for u, _k in m} & taken:
            continue
        freshest = max(m, key=lambda t: ts[t[0]])[0]
        srcs = [src_of.get(u) for u, _k in m]
        for u, k in m:
            if (
                k == "exact" and u != freshest
                and srcs.count(src_of.get(u)) == 1
            ):
                choice = (cid, u, src_of[u])
                break
        if choice:
            break
    assert choice, "no authority candidate found"
    y_cid, y_url, y_source = choice
    taken |= {_host(u) for u, _k in rich[y_cid]}

    # host-gate cluster: its BASE becomes a host record → singleton
    z_base = None
    for cid in cids[1:]:
        if cid == y_cid or {_host(u) for u, _k in rich[cid]} & taken:
            continue
        base = [u for u, k in rich[cid] if k == "unique"]
        if base:
            z_base = base[0]
            break
    assert z_base, "no host-gate candidate found"
    return x_hosts, (y_url, y_source), z_base


@pytest.fixture(scope="module")
def cli_run(spark, tmp_path_factory, plan):
    import dedup.session as session
    from dedup import cli
    from dedup.survivor import normalize_authority_name  # noqa: F401

    x_hosts, (y_url, y_source), z_base = plan
    tmp_path = tmp_path_factory.mktemp("cli_side")

    # side tables as parquet, exactly as a spark-submit user would mount
    auth_path = str(tmp_path / "authorized_names.parquet")
    spark.createDataFrame(
        [(h.replace(".", " "), h) for h in x_hosts],
        "name_normalized string, canonical string",
    ).write.parquet(auth_path)
    host_path = str(tmp_path / "host_ids.parquet")
    spark.createDataFrame([(z_base,)], "url string").write.parquet(host_path)

    out_dir = str(tmp_path / "out")
    orig_get_spark = session.get_spark
    session.get_spark = lambda *a, **k: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main([
            "--synthetic", "200", "--seed", "42",
            "--output", out_dir,
            "--authorized-names", auth_path,
            "--host-ids", host_path,
            "--authority-sources", y_source,
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
    return out_dir, metrics


def test_both_authorized_cluster_is_rejected(spark, cli_run):
    out_dir, metrics = cli_run
    rej = [m for m in metrics if m["stage"] == "rejected_survivors"]
    assert rej and rej[0]["rows_out"] >= 1


def test_host_record_blocked_to_singleton(spark, cli_run, plan):
    _x, _y, z_base = plan
    out_dir, _metrics = cli_run
    assign = spark.read.parquet(f"{out_dir}/assignments")
    row = assign.filter(assign.url == z_base).collect()[0]
    n = assign.filter(assign.cluster_id == row["cluster_id"]).count()
    assert row["cluster_id"] == z_base and n == 1


def test_authority_source_member_survives(spark, cli_run, plan):
    _x, (y_url, _y_source), _z = plan
    out_dir, _metrics = cli_run
    assign = spark.read.parquet(f"{out_dir}/assignments")
    surv = spark.read.parquet(f"{out_dir}/survivors")
    cid = assign.filter(assign.url == y_url).collect()[0]["cluster_id"]
    srow = surv.filter(surv.cluster_id == cid).collect()[0]
    # y_url is NOT the freshest member — without --authority-sources the
    # freshest would win; authority priority must flip it
    assert srow["survivor_url"] == y_url
    assert srow["n_members"] >= 2


def test_cli_lcp_channel_runs_and_reports_stats(spark, tmp_path_factory):
    """--channels lcp must run end-to-end and surface the channel's
    skew/fan-out lineage (hot blocks + per-doc skipped counts) in
    metrics — the reported-never-silent contract."""
    import dedup.session as session
    from dedup import cli

    tmp_path = tmp_path_factory.mktemp("cli_lcp")
    out_dir = str(tmp_path / "out")
    orig_get_spark = session.get_spark
    session.get_spark = lambda *a, **k: spark
    orig_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = cli.main([
            "--synthetic", "400", "--seed", "42",
            "--output", out_dir,
            "--channels", "lsh,exact,lcp",
        ])
    finally:
        session.get_spark = orig_get_spark
        spark.stop = orig_stop
    assert rc == 0
    metrics = {
        m["stage"]: m
        for m in (
            json.loads(line)
            for line in open(f"{out_dir}/metrics.jsonl")
            if line.strip()
        )
    }
    assert "lcp_hot_blocks" in metrics
    assert "lcp_skipped_doc_blocks" in metrics
    assert metrics["survivors"]["rows_out"] > 0
