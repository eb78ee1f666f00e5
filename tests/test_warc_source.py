"""WARC source: bit-exact roundtrip, corrupt-shard totality, e2e dedup."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from dedup.extract import escape_wrapper_text
from dedup.warc import (
    _parse_warc_bytes,
    load_pages_warc,
    pack_warc,
    pack_warc_gz,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the band plays waltzing matilda down by the river bend "
    "and every sailor knows the way home across the wine dark sea"
)


def _payload(text: str) -> bytes:
    return (
        "<html><body>" + escape_wrapper_text(text) + "</body></html>"
    ).encode("utf-8")


def _records():
    return [
        ("https://w/a", 1714521600, _payload(BASE)),
        ("https://w/b", 1714521660, _payload(BASE)),
        ("https://w/c", 1714521720, _payload(BASE.replace("sailor", "pilot"))),
        ("https://w/d", 1714521780, _payload(
            "gardening tools and the art of keeping soil alive through "
            "a long wet winter season outside the old house"
        )),
    ]


def test_pack_parse_roundtrip_plain_and_gz():
    recs = _records()
    for blob in (pack_warc(recs), gzip.decompress(pack_warc_gz(recs))):
        got = list(_parse_warc_bytes(blob))
        assert [u for u, _, _ in got] == [u for u, _, _ in recs]
        assert [p for _, _, p in got] == [p for _, _, p in recs]
        assert got[0][1].isoformat() == "2024-05-01T00:00:00+00:00"


def test_pack_warc_gz_is_deterministic_and_member_per_record():
    recs = _records()
    assert pack_warc_gz(recs) == pack_warc_gz(recs)
    # member-per-record: truncating to the first member still yields
    # record 1 (the resynchronization property CC relies on)
    blob = pack_warc_gz(recs[:1]) + b"\x00garbage-not-gzip"
    assert gzip.decompress(pack_warc_gz(recs[:1]))  # sanity
    from dedup.warc import _shard_rows

    assert _shard_rows("x.warc.gz", blob) == []  # bad tail: total, no rows
    assert len(_shard_rows("x.warc.gz", pack_warc_gz(recs))) == 4


def test_truncated_record_keeps_prefix():
    recs = _records()
    blob = pack_warc(recs)
    # chop mid-record-3: records 1-2 survive, the torn tail is dropped
    third_start = blob.find(b"WARC/1.0", blob.find(
        b"WARC/1.0", len(b"WARC/1.0")) + 1)
    got = list(_parse_warc_bytes(blob[: third_start + 40]))
    assert [u for u, _, _ in got] == ["https://w/a", "https://w/b"]


def test_non_http_and_non_response_records():
    # resource-style content passes through; warcinfo records are skipped
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://w/raw\r\n"
        b"WARC-Date: 2024-05-01T00:01:00Z\r\n"
        b"Content-Length: 9\r\n\r\nraw bytes\r\n\r\n"
    )
    got = list(_parse_warc_bytes(info + raw))
    assert got == [(
        "https://w/raw", got[0][1], b"raw bytes",
    )]


def test_load_pages_warc_e2e_dedup(spark, tmp_path):
    land = tmp_path / "warcs"
    os.makedirs(land)
    recs = _records()
    # two shards — the reader must union across files
    (land / "shard-0.warc.gz").write_bytes(pack_warc_gz(recs[:2]))
    (land / "shard-1.warc.gz").write_bytes(pack_warc_gz(recs[2:]))
    (land / "ignored.txt").write_text("not an archive")
    pages = load_pages_warc(spark, str(land))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {f"https://w/{c}" for c in "abcd"}
    # extraction in the same pass is byte-exact vs the wrapper invariant
    assert rows["https://w/a"]["text"] == BASE
    assert rows["https://w/a"]["warc_ts"].year == 2024
    assert bytes(rows["https://w/a"]["html"]) == _payload(BASE)

    from dedup.config import DedupConfig
    from dedup.pipeline import run_dedup

    res = run_dedup(
        pages.select("url", "warc_ts", "text", "lang", "source"),
        DedupConfig(hash_mode="portable"),
    )
    assign = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    res.release()
    assert assign["https://w/a"] == assign["https://w/b"] == assign["https://w/c"]
    assert assign["https://w/d"] != assign["https://w/a"]


def test_streaming_warc_ingest_cross_invocation(spark, tmp_path):
    """Crawl shards land as .warc.gz drops; the streaming pipeline
    drains them through the exactly-once stores with the WARC reader as
    the stream source, resumes across invocations, and the verify tail
    clusters a CROSS-invocation near-dup pair."""
    from dedup.config import DedupConfig
    from dedup.streaming import run_streaming_dedup

    recs = _records()
    # b must be a NEAR-dup, not byte-identical: the streaming exact-
    # dedup watermark drops identical re-crawls before the store (the
    # surviving twin carries the content), which is its own tested
    # behavior — this test targets the cross-batch NEAR-dup state
    recs[1] = (recs[1][0], recs[1][1], _payload(BASE.replace("band", "choir")))
    land = tmp_path / "crawl"
    os.makedirs(land)
    work = str(tmp_path / "warc_work")
    cfg = DedupConfig()

    # invocation 1: shard with a + the unrelated d
    (land / "shard-0.warc.gz").write_bytes(pack_warc_gz([recs[0], recs[3]]))
    res1 = run_streaming_dedup(
        spark, str(land), work, cfg, input_format="warc"
    )
    a1 = {r["url"]: r["cluster_id"] for r in res1.assignments.collect()}
    res1.release()
    assert a1["https://w/a"] != a1["https://w/d"]

    # invocation 2: a second shard lands with a's near-dups b and c —
    # the pair spans invocations, so it must come from the resumed
    # cross-batch state, not from within-batch banding
    (land / "shard-1.warc.gz").write_bytes(pack_warc_gz(recs[1:3]))
    res2 = run_streaming_dedup(
        spark, str(land), work, cfg, input_format="warc"
    )
    a2 = {r["url"]: r["cluster_id"] for r in res2.assignments.collect()}
    res2.release()
    assert a2["https://w/a"] == a2["https://w/b"] == a2["https://w/c"]
    assert a2["https://w/d"] != a2["https://w/a"]


def test_streaming_jsonl_ingest(spark, tmp_path):
    """JSONL drops stream through the same stores (explicit schema,
    omitted-key nulls)."""
    import json as _json

    from dedup.config import DedupConfig
    from dedup.streaming import run_streaming_dedup

    land = tmp_path / "jsonl_land"
    os.makedirs(land)
    rows = [
        {"url": "https://sj/a", "warc_ts_epoch": 1714521600, "text": BASE},
        {"url": "https://sj/b", "warc_ts_epoch": 1714521660,
         "text": BASE.replace("sailor", "pilot")},
    ]
    with open(land / "drop-0.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    res = run_streaming_dedup(
        spark, str(land), str(tmp_path / "jsonl_work"), DedupConfig(),
        input_format="jsonl",
    )
    a = {r["url"]: r["cluster_id"] for r in res.assignments.collect()}
    res.release()
    assert a["https://sj/a"] == a["https://sj/b"]
