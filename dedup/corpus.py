"""Deterministic synthetic page corpus with planted ground truth
(FIXTURES.md §1; SURVEY.md §7 stage 1).

Plants exact / near / substring / simhash-near / boilerplate /
quarantine / unique documents with known cluster labels in a separate
truth table the pipeline never reads. Everything is a pure function of
(seed, n_docs) — numpy Generator, no wall clock.

dup_kind semantics for the e2e tests:
  exact / near / simhash_near / substring — true duplicates of a base
      doc; recall is measured over these.
  source_blocked — a near-dup that SHARES a source with its base: the
      source-overlap guard (noSameLOWTags analogue) must emit a reason
      and block the direct pair.
  boilerplate — many docs sharing a short template (hot LSH buckets) but
      each below the Jaccard threshold vs the others: they must NOT
      merge, and the bucket cap must engage.
  quarantine — empty/sentinel docs filtered before pairing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dedup.pages import EPOCH_BASE

_VOCAB = [
    # small shared vocabulary → realistic shingle collisions
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "dup",
    "group", "query", "row", "data", "slow", "filter", "customer", "line",
    "value", "column", "big", "agg", "vector", "a",
]
_LANGS = ["fi", "sv", "en", "de", "fr"]
_SOURCES = [f"crawl-{c}" for c in "abcdefgh"]


def _words(rng: np.random.Generator, n: int) -> list[str]:
    return [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n)]


def generate_corpus(
    n_docs: int = 2000, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (pages_pdf, truth_pdf, sources_pdf)."""
    rng = np.random.default_rng(seed)
    rows, truth, srcrows = [], [], []
    next_id = 0

    def emit(text: str, lang: str, cluster: int, kind: str,
             sources: list[str], ts_off: int) -> str:
        nonlocal next_id
        url = f"https://site{next_id % 97}.example/p/{next_id}"
        rows.append(
            dict(
                url=url,
                warc_ts=EPOCH_BASE + next_id * 60 + ts_off,
                html=("<html><body>" + text + "</body></html>").encode(),
                text=text,
                lang=lang,
            )
        )
        truth.append(dict(url=url, true_cluster_id=cluster, dup_kind=kind))
        for s in sources:
            srcrows.append(
                dict(url=url, source=s, source_local_id=f"{s}:{next_id}")
            )
        next_id += 1
        return url

    n_base = max(n_docs * 60 // 100, 1)
    cluster = 0
    base_docs: list[tuple[int, str, str, str]] = []  # (cluster, text, lang, source)
    cluster_sources: dict[int, set[str]] = {}  # a source crawls a page once
    for _ in range(n_base):
        nw = int(rng.integers(40, 120))
        text = " ".join(_words(rng, nw))
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        src = _SOURCES[int(rng.integers(0, len(_SOURCES)))]
        emit(text, lang, cluster, "unique", [src], 0)
        base_docs.append((cluster, text, lang, src))
        cluster_sources[cluster] = {src}
        cluster += 1

    def pick_base() -> tuple[int, str, str, str]:
        return base_docs[int(rng.integers(0, len(base_docs)))]

    def fresh_source(cid: int) -> str:
        """A source no other member of this cluster has — models 'each
        crawl captured the page once'; accidental overlaps would
        (correctly) trip the source guard and poison the recall truth."""
        used = cluster_sources.setdefault(cid, set())
        choices = [s for s in _SOURCES if s not in used]
        if not choices:
            choices = _SOURCES
        s = choices[int(rng.integers(0, len(choices)))]
        used.add(s)
        return s

    def _jacc(a: str, b: str, k: int = 9) -> float:
        sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 1))}
        sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 1))}
        return len(sa & sb) / len(sa | sb)

    def mutate(text: str, n_mut: int) -> str:
        toks = text.split()
        for _ in range(n_mut):
            toks[int(rng.integers(0, len(toks)))] = _VOCAB[
                int(rng.integers(0, len(_VOCAB)))
            ]
        return " ".join(toks)

    def mutate_above_threshold(text: str, min_j: float = 0.82) -> str:
        """Planted near-dups must actually clear the Jaccard threshold."""
        n_mut = int(rng.integers(1, 3)) if len(text.split()) >= 80 else 1
        for tries in range(4):
            cand = mutate(text, max(n_mut - tries, 1))
            if _jacc(text, cand) >= min_j:
                return cand
        return text  # degenerate fallback: exact copy still a true dup

    budget = n_docs - n_base
    kinds = (
        ["exact"] * (budget * 18 // 100)
        + ["near"] * (budget * 32 // 100)
        + ["substring"] * (budget * 10 // 100)
        + ["simhash_near"] * (budget * 10 // 100)
        + ["boilerplate"] * (budget * 15 // 100)
        + ["source_blocked"] * (budget * 5 // 100)
        + ["quarantine"] * (budget * 5 // 100)
    )
    kinds += ["near"] * (budget - len(kinds))

    # shared template → hot LSH buckets; each boiler doc adds enough
    # unique tail (~3 random words + id token) to stay below the 0.8
    # Jaccard threshold vs its siblings while sharing most band keys
    boiler = " ".join(_words(rng, 12))
    for kind in kinds:
        cid, text, lang, bsrc = pick_base()
        ts = int(rng.integers(1, 9999))
        if kind == "exact":
            emit(text, lang, cid, "exact", [fresh_source(cid)], ts)
        elif kind == "near":
            emit(mutate_above_threshold(text), lang, cid, "near",
                 [fresh_source(cid)], ts)
        elif kind == "simhash_near":
            emit(mutate_above_threshold(text), lang, cid, "simhash_near",
                 [fresh_source(cid)], ts)
        elif kind == "source_blocked":
            # shares the base's source → direct pair must be blocked
            emit(mutate_above_threshold(text), lang, cid, "source_blocked",
                 [bsrc], ts)
        elif kind == "substring":
            pad_a = " ".join(_words(rng, 15))
            pad_b = " ".join(_words(rng, 15))
            emit(f"{pad_a} {text} {pad_b}", lang, cid, "substring",
                 [fresh_source(cid)], ts)
        elif kind == "boilerplate":
            tail = " ".join(_words(rng, 3))
            emit(f"{boiler} {tail} bp{next_id_token(truth)}", lang, cluster,
                 "boilerplate", [_SOURCES[int(rng.integers(0, len(_SOURCES)))]],
                 ts)
            cluster += 1
        elif kind == "quarantine":
            mode = int(rng.integers(0, 3))
            # keep text a fixed point of extraction (whitespace-normal)
            qtext = ["", "^^truncated " + text[:40].strip(),
                     "noindex " + text[:40].strip()][mode]
            emit(qtext, lang, cluster, "quarantine", [bsrc], 0)
            cluster += 1

    pages = pd.DataFrame(rows)
    pages["warc_ts"] = pd.to_datetime(pages["warc_ts"], unit="s", utc=True)
    return pages, pd.DataFrame(truth), pd.DataFrame(srcrows)


def next_id_token(truth: list) -> int:
    return len(truth)


def corpus_dataframes(
    spark: SparkSession, n_docs: int = 2000, seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    pages_pdf, truth_pdf, src_pdf = generate_corpus(n_docs, seed)
    from dedup.schema import PAGES_SCHEMA, SOURCES_SCHEMA, TRUTH_SCHEMA

    pages_pdf = pages_pdf.copy()
    pages_pdf["warc_ts"] = pages_pdf["warc_ts"].dt.tz_localize(None)
    return (
        spark.createDataFrame(pages_pdf, PAGES_SCHEMA),
        spark.createDataFrame(truth_pdf, TRUTH_SCHEMA),
        spark.createDataFrame(src_pdf, SOURCES_SCHEMA),
    )
