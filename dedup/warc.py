"""WARC (ISO 28500) web-archive source — the Common Crawl ingest shape.

Real 100-TB text pipelines start here: crawls ship as ~1 GB `.warc.gz`
shards of response records, each record an independent gzip member (the
CC convention, so a reader can resynchronize mid-file). This module
gives the engine that front door:

* ``load_pages_warc(spark, path)`` — distributed reader producing the
  canonical pages shape (url, warc_ts, html, text, lang, source).
* ``pack_warc_gz(records)`` / ``pack_warc(records)`` — deterministic
  writers (gzip mtime pinned to 0) used by tests and the synthetic
  corpus lowering; also the documented shape for anyone producing
  engine-ingestible archives.

Scale design:

- ``spark.read.format("binaryFile")`` lists the shards and hands each
  file's bytes to one task. The parallelism unit is the SHARD — the
  right granularity, because a WARC file has no random access (gzip
  members + Content-Length framing must be walked serially) and
  binaryFile never splits files regardless of maxPartitionBytes. At the
  100-TB design point a crawl is ~10^5 shards → ~10^5 tasks; per-task
  memory is one decompressed shard (~3-5 GB worst case for CC shards),
  which sizes the executor, not the driver.
- The per-shard walk runs in ``mapInPandas`` over Arrow batches of
  (path, content) — stdlib gzip + bytes slicing, no row-at-a-time UDF,
  and text extraction happens in the SAME pass so payload bytes are
  read exactly once and the wide html column can be pruned immediately
  downstream (dedup/pipeline.py:100 drops it before the first shuffle).
- Totality: a malformed record (truncated payload, missing mandatory
  header, bad framing) ends parsing of THAT shard at the failure point
  — records before it are kept, the task never dies. Bad gzip streams
  yield zero rows for the shard. Production monitoring of dropped mass
  belongs in the metrics side (stat-parity counters), not task
  failures, matching the PERMISSIVE JSONL policy (dedup/pages.py).

Reference analogue: the ingest seam — the reference receives
already-parsed records and validates them
(/root/reference/lib/marc-record-merge-melindautils.js:36-60); here the
archive parse itself is part of the engine, contract-tested bit-exact.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from dedup.extract import extract_text_bytes

_CRLF2 = b"\r\n\r\n"

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, source string"
)


# --------------------------------------------------------------------- write
def _warc_record(url: str, ts_epoch: int | None, payload: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed bytes)."""
    ts = datetime.fromtimestamp(int(ts_epoch or 0), tz=timezone.utc)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(payload)).encode() + _CRLF2 + payload
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + _CRLF2
    )
    return headers + http + _CRLF2


def pack_warc(records: Iterable[tuple[str, int | None, bytes]]) -> bytes:
    """Uncompressed .warc bytes for (url, ts_epoch, html_payload) rows."""
    return b"".join(_warc_record(u, t, p) for u, t, p in records)


def pack_warc_gz(records: Iterable[tuple[str, int | None, bytes]]) -> bytes:
    """CC-convention .warc.gz: each record its own gzip member, mtime
    pinned to 0 so identical inputs produce identical archive bytes."""
    return b"".join(
        gzip.compress(_warc_record(u, t, p), mtime=0) for u, t, p in records
    )


def write_warc_shards(
    pages: DataFrame,
    out_dir: str,
    n_shards: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """WARC sink: lower a pages frame to `n_shards` .warc.gz shard
    files under `out_dir` (executors write the local/shared FS — on a
    real cluster point this at the mounted object store). Deterministic
    and retry-idempotent: shard membership is hash(url) mod n, rows are
    sorted by url within a shard, and gzip mtime is pinned, so a task
    retry rewrites byte-identical files. Returns the (shard, path,
    n_records) manifest; the write happens when the manifest is acted
    on."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    keyed = pages.select(
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards)).alias("shard"),
        F.col(url_col).alias("url"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_epoch"),
        F.col(payload_col).alias("payload"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url", ignore_index=True)
        shard = int(pdf["shard"].iloc[0])
        blob = pack_warc_gz(
            (
                str(u),
                None if pd.isna(t) else int(t),
                b"" if p is None else bytes(p),
            )
            for u, t, p in zip(pdf["url"], pdf["ts_epoch"], pdf["payload"])
        )
        path = os.path.join(out_dir, f"shard-{shard:05d}.warc.gz")
        # atomic publish: a speculative or retried attempt writing the
        # final path directly could interleave with a sibling attempt
        # and tear the file; per-attempt tmp + os.replace is atomic on
        # POSIX, and byte-identical content makes the race harmless
        # whichever attempt lands last
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        finally:
            # a task attempt dying between open() and replace() must
            # not leave its orphaned tmp file behind forever (readers
            # ignore it, but retried runs would accumulate garbage)
            if os.path.exists(tmp):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return pd.DataFrame(
            {"shard": [shard], "path": [path], "n_records": [len(pdf)]}
        )

    return keyed.groupBy("shard").applyInPandas(
        pack, "shard int, path string, n_records long"
    )


# ---------------------------------------------------------------------- read
def _parse_warc_bytes(
    data: bytes,
) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Walk WARC records in decompressed bytes; yields
    (url, warc_date, html_payload) for response records. Stops at the
    first malformed frame (keeping everything before it) — totality
    over corrupt tails without dying."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0 or not data.startswith(b"WARC/", pos):
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + length
        if length < 0 or body_end > n:
            return  # truncated record — keep what came before
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri")
            if url:
                ts: datetime | None = None
                raw_ts = headers.get("warc-date", "")
                try:
                    ts = datetime.strptime(
                        raw_ts, "%Y-%m-%dT%H:%M:%SZ"
                    ).replace(tzinfo=timezone.utc)
                except ValueError:
                    pass
                content = data[body_start:body_end]
                # HTTP response payload: body follows the first blank
                # line; non-HTTP content (resource-style) passes through
                if content.startswith(b"HTTP/"):
                    split = content.find(_CRLF2)
                    payload = content[split + 4 :] if split >= 0 else b""
                else:
                    payload = content
                yield url, ts, payload
        pos = body_end


def _shard_rows(path: str, content: bytes) -> list[tuple]:
    if path.endswith(".gz"):
        try:
            # gzip.decompress walks ALL concatenated members — the CC
            # member-per-record layout decompresses to one plain WARC
            data = gzip.decompress(content)
        except (OSError, EOFError):
            return []  # undecodable shard: zero rows, task survives
    else:
        data = content
    rows = []
    for url, ts, payload in _parse_warc_bytes(data):
        rows.append(
            (url, ts, payload, extract_text_bytes(payload), None, None)
        )
    return rows


def _parse_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["url", "warc_ts", "html", "text", "lang", "source"]
    for pdf in batches:
        out: list[tuple] = []
        for p, c in zip(pdf["path"], pdf["content"]):
            out.extend(_shard_rows(str(p), bytes(c)))
        yield pd.DataFrame(out, columns=cols)


def load_pages_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of .warc / .warc.gz shards into the pages
    shape. One task per shard (see module docstring); text extraction
    runs in the same pass as the parse so payload bytes are touched
    once."""
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    return shards.mapInPandas(_parse_shards, WARC_PAGES_SCHEMA)


def read_pages_stream_warc(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming twin of load_pages_warc: crawl shards landing in
    `path` become a pages STREAM feeding the exactly-once dedup stores
    (dedup/streaming.start_streaming_stores) — the end-to-end crawl
    shape: fetcher drops .warc.gz shards, the engine drains them
    incrementally with cross-batch near-dup state. binaryFile is a
    standard file streaming source, so checkpoints give the same
    exactly-once / resume semantics as the parquet landing path; the
    parse is the stateless mapInPandas shared with the batch reader."""
    shards = (
        spark.readStream.format("binaryFile")
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path", "content")
    )
    return shards.mapInPandas(_parse_shards, WARC_PAGES_SCHEMA)
