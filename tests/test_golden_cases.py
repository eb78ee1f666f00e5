"""Golden pair-case corpus (FIXTURES.md §4) — data-driven like the
reference's test/MergeUtilsMelinda.spec.js: verify cases assert exact
reasons/can_merge; emit cases assert the survivor row + lineage
(timestamp column excluded, as at MergeUtilsMelinda.spec.js:154)."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.verify import attach_features, pair_reasons
from dedup.survivor import reprint_notes, select_survivors

CASES_DIR = os.path.join(os.path.dirname(__file__), "cases")


def _load(name):
    with open(os.path.join(CASES_DIR, name)) as f:
        return json.load(f)


VERIFY_CASES = _load("verify_cases.json")
EMIT_CASES = _load("emit_cases.json")


def _features_df(spark, docs):
    rows = [
        (
            d["url"],
            d["lang"],
            any(
                ord(c) > 126 and c not in "öäå,'" and not (" " <= c <= "~")
                for c in d["text"]
            ),
            datetime.datetime.fromisoformat(d["warc_ts"]),
            len(d["text"]),
            sorted(d.get("sources", [])),
            bool(d.get("is_component", False)),
        )
        for d in docs
    ]
    return spark.createDataFrame(
        rows,
        "url string, lang string, has_diacritics boolean, warc_ts timestamp,"
        " text_len int, sources array<string>, is_component boolean",
    )


@pytest.mark.parametrize(
    "case", VERIFY_CASES, ids=[c["description"][:60] for c in VERIFY_CASES]
)
def test_verify_case(spark, case):
    cfg = DedupConfig()
    other, preferred = case["other"], case["preferred"]
    # convention: side a = preferred (merge base), side b = other
    pairs = spark.createDataFrame(
        [(preferred["url"], other["url"])], "url_a string, url_b string"
    )
    feats = _features_df(spark, [other, preferred])
    host_ids = None
    if case.get("host_ids"):
        host_ids = spark.createDataFrame(
            [(u,) for u in case["host_ids"]], "url string"
        )
    got = pair_reasons(
        attach_features(pairs, feats), cfg, host_ids=host_ids
    ).collect()[0]
    assert got["can_merge"] == case["expected"]["can_merge"], case["description"]
    assert list(got["reasons"]) == case["expected"]["reasons"], case["description"]


@pytest.mark.parametrize(
    "case", EMIT_CASES, ids=[c["description"][:60] for c in EMIT_CASES]
)
def test_emit_case(spark, case):
    cfg = DedupConfig()
    feats = _features_df(spark, case["members"])
    cluster_id = min(d["url"] for d in case["members"])
    members = feats.withColumn("cluster_id", F.lit(cluster_id))
    surv = select_survivors(
        members,
        cfg,
        authority_sources=tuple(case.get("authority_sources", ())),
        run_id="golden",
        run_ts="2024-01-01T00:00:00+00:00",
    )
    surv = reprint_notes(members, surv)
    row = surv.collect()[0]
    exp = case["expected"]
    assert row["survivor_url"] == exp["survivor_url"], case["description"]
    assert list(row["merged_from"]) == exp["merged_from"]
    assert list(row["sources"]) == exp["sources"]
    assert row["n_members"] == exp["n_members"]
    if "notes" in exp:
        assert list(row["notes"]) == exp["notes"]
    # reset001 analogue: fresh deterministic identity present
    assert len(row["cluster_key"]) == 32
    # 583 analogue: lineage struct carries run metadata, injected ts
    assert row["lineage"]["run_id"] == "golden"
    assert row["lineage"]["merged_from_note"] == " + ".join(exp["merged_from"])
