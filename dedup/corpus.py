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
  rule_blocked — a ≥0.8-Jaccard near-dup carrying a tracking_ids entry:
      the neitherHas stop-field rule (checkFieldRequirements analogue)
      must block it.
  count_blocked — a ≥0.8-Jaccard near-dup with an extra headings entry:
      the sameAuthorType count gate must block it.
  extent_blocked — a ≥0.8-Jaccard near-dup with a conflicting (or
      mutually-uninferrable) extent string: the same300TypeAndCount
      gate must block it.
  boilerplate — many docs sharing a short template (hot LSH buckets) but
      each below the Jaccard threshold vs the others: they must NOT
      merge, and the bucket cap must engage.
  quarantine — empty/sentinel docs filtered before pairing.

Every dup-family member inherits its base's metadata columns
(canonical_links / meta_tags / tracking_ids / headings / extent)
verbatim unless its kind exists to violate one of them — copies of a
page share the page's metadata, so the production gates stay recall-
neutral for true duplicates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dedup.extract import escape_wrapper_text
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

    _EXTENTS = ["12 s.", "XV, 514 s. :", "2 nid.", "kartta"]

    def base_meta(cid: int) -> dict:
        """Deterministic page metadata for a base doc; dup-family members
        inherit it verbatim (copies of a page share its metadata)."""
        return dict(
            canonical_links=[f"https://canon.example/{cid}"],
            meta_tags=[f"og:site=site{cid % 7}"] if cid % 2 == 0 else [],
            tracking_ids=[],
            headings=[f"heading {cid}"],
            extent=_EXTENTS[cid % len(_EXTENTS)],
        )

    def emit(text: str, lang: str, cluster: int, kind: str,
             sources: list[str], ts_off: int, meta: dict | None = None) -> str:
        nonlocal next_id
        url = f"https://site{next_id % 97}.example/p/{next_id}"
        m = meta if meta is not None else base_meta(cluster)
        rows.append(
            dict(
                url=url,
                warc_ts=EPOCH_BASE + next_id * 60 + ts_off,
                html=(
                    "<html><body>" + escape_wrapper_text(text)
                    + "</body></html>"
                ).encode(),
                text=text,
                lang=lang,
                **m,
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
        + ["near"] * (budget * 26 // 100)
        + ["substring"] * (budget * 10 // 100)
        + ["simhash_near"] * (budget * 10 // 100)
        + ["boilerplate"] * (budget * 15 // 100)
        + ["source_blocked"] * (budget * 5 // 100)
        + ["rule_blocked"] * (budget * 4 // 100)
        + ["count_blocked"] * (budget * 2 // 100)
        + ["extent_blocked"] * (budget * 2 // 100)
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
            # word-order shuffle: token MULTISET identical (weighted
            # SimHash Hamming == 0) while char-shingle Jaccard collapses
            # far below 0.8 — only the SimHash channel can catch it
            toks = text.split()
            perm = rng.permutation(len(toks))
            emit(" ".join(toks[i] for i in perm), lang, cid, "simhash_near",
                 [fresh_source(cid)], ts)
        elif kind == "source_blocked":
            # shares the base's source → direct pair must be blocked
            emit(mutate_above_threshold(text), lang, cid, "source_blocked",
                 [bsrc], ts)
        elif kind == "rule_blocked":
            # carries a tracking id → the neitherHas stop-field rule
            # (validate-fields.js:74-82 analogue) blocks every pair
            m = base_meta(cid)
            m["tracking_ids"] = [f"trk-{next_id_token(truth)}"]
            emit(mutate_above_threshold(text), lang, cid, "rule_blocked",
                 [fresh_source(cid)], ts, meta=m)
        elif kind == "count_blocked":
            # extra heading → sameAuthorType count gate blocks
            # (mergeability-validators.js:123-131 analogue)
            m = base_meta(cid)
            m["headings"] = m["headings"] + [f"extra {next_id_token(truth)}"]
            emit(mutate_above_threshold(text), lang, cid, "count_blocked",
                 [fresh_source(cid)], ts, meta=m)
        elif kind == "extent_blocked":
            # conflicting extent → same300TypeAndCount blocks. Alternate
            # deterministically between the two reject paths: a different
            # inferred volume count against an inferable base, and a
            # second (distinct) uninferrable string against an
            # uninferrable base → 'Could not infer' path
            tok = next_id_token(truth)
            if tok % 2 == 1:
                kartta_bases = [bd for bd in base_docs if bd[0] % 4 == 3]
                if kartta_bases:
                    cid, text, lang, bsrc = kartta_bases[
                        tok % len(kartta_bases)
                    ]
            m = base_meta(cid)
            if m["extent"] == "kartta":
                m["extent"] = f"karttoja {tok}"
            else:
                m["extent"] = f"{3 + tok % 89} nid."
            emit(mutate_above_threshold(text), lang, cid, "extent_blocked",
                 [fresh_source(cid)], ts, meta=m)
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

    def frame(pdf, schema) -> DataFrame:
        # Spark 4's createDataFrame (arrow path included) roots the
        # frame on a LocalRelation — the ROWS live inside the logical
        # plan, and every downstream plan construction / optimizer pass
        # drags them along (measured: +2-3 s of per-run driver wall in
        # the 30k-doc pipeline, growing with corpus size). An eager
        # localCheckpoint re-roots on an RDD leaf: same rows, O(1)
        # plan, one materialization job here instead of a
        # driver-side LocalTableScan per action.
        return spark.createDataFrame(pdf, schema).localCheckpoint(
            eager=True
        )

    return (
        frame(pages_pdf, PAGES_SCHEMA),
        frame(truth_pdf, TRUTH_SCHEMA),
        frame(src_pdf, SOURCES_SCHEMA),
    )
