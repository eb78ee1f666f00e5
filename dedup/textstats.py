"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (whole-stage codegen; no UDFs) so they run
at scan speed and push down cleanly. Outputs are integer-scaled where
fractional (×10⁶, floor) so results hash identically across engines in
the driver's DuckDB comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword marker lists for the n-gram/stopword
# language heuristic (classic McNamee-style profile matching, reduced to
# high-frequency function words)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
    "fi": ["ja", "on", "ei", "että", "joka"],
    "sv": ["och", "att", "det", "som", "en"],
}


def _count_occurrences(text: Column, token: str) -> Column:
    """Occurrences of ' token ' in ' text ' — expressible identically in
    DuckDB ((length(x)-length(replace(x,t,'')))/length(t)).

    Single spaces are DOUBLED before matching: plain replace() removes
    non-overlapping matches, so adjacent repeats (' the the the ')
    would otherwise count 2 instead of 3 — each occurrence must own
    both of its delimiting spaces."""
    spaced = F.replace(text, F.lit(" "), F.lit("  "))
    padded = F.concat(F.lit(" "), spaced, F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(
            (_count_occurrences(F.lower(text), w) for w in words), F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax over marker-hit counts; 'und' when nothing matched.
    Deterministic tie-break: array_max compares the (score, lang)
    structs field-by-field, so ties pick the lexicographically LAST
    language name (descending) — the DuckDB oracle mirrors this with
    ORDER BY score DESC, lang DESC."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(v.alias("score"), F.lit(k).alias("lang"))
            for k, v in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def _ws_trim(text: Column) -> Column:
    """Strip BOUNDARY whitespace of every kind — F.trim strips ASCII
    spaces only, so 'x\\n' would keep its newline and split() would
    emit a trailing empty token."""
    return F.regexp_replace(text, r"^\s+|\s+$", "")


def token_count(text: Column) -> Column:
    """Whitespace tokenization; null/blank/whitespace-only text counts
    0 (not NULL, not a phantom boundary token)."""
    t = _ws_trim(text)
    return F.when(t.isNull() | (F.length(t) == 0), F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


# translate-fold for the BPE-ish tokenizer: every char of the alnum-ish
# class [0-9A-Za-zÀ-ÿ] maps onto 'a', turning the 4-component regex
# classes below into ≤2-component ones. java.util.regex drops to a
# ~27-40x slower, non-thread-scaling path when a character class unions
# more than two components (measured on this host; see normalize.py) —
# folding preserves run boundaries and the punct count exactly.
_BPE_FOLD_SRC = (
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    + "".join(chr(c) for c in range(0xC0, 0x100))  # À-ÿ, the full range
)
_BPE_FOLD_DST = "a" * len(_BPE_FOLD_SRC)


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish counting: alnum runs + each punctuation mark counts
    one token (a BPE-flavored regex heuristic). Computed over the
    translate-folded text (see _BPE_FOLD_SRC) so both regex classes
    stay on the JVM fast path — bit-identical to the direct 4-component
    form (equivalence pinned by test)."""
    folded = F.translate(text, _BPE_FOLD_SRC, _BPE_FOLD_DST)
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.split(folded, r"[^a-z]+"),
                lambda s: F.length(s) > 0,
            )
        )
        + F.length(F.regexp_replace(folded, r"[a-z\s]+", ""))
    ).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    """Quality heuristics (Gopher/C4-style rules on cheap stats)."""
    t = _ws_trim(text)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    # ASCII-fast-path form of length(regexp_replace(t,'[^a-zA-Zåäö]',''))
    # — non-ASCII chars in a regex class drop java.util.regex to a ~40x
    # slower path (see dedup/normalize.py). Only the COUNT matters here,
    # so åäö fold onto 'a' (kept by the class) before the ASCII replace.
    n_alpha = F.length(
        F.regexp_replace(F.translate(t, "åäö", "aaa"), "[^a-zA-Z]", "")
    ).cast("long")
    # translate, not a 6-component regex class (the same JVM cliff the
    # n_alpha comment describes): count = chars removed by deleting
    # every punctuation mark
    n_punct = (
        F.length(t) - F.length(F.translate(t, ".,!?;:", ""))
    ).cast("long")
    n_stop = sum(
        (_count_occurrences(F.lower(t), w) for w in LANG_MARKERS["en"]), F.lit(0)
    ).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_punct": n_punct,
        "n_stop": n_stop,
        # integer-scaled ratios (micro-units, floor) — engine-stable
        "alpha_ratio_micro": F.floor(n_alpha * 1000000 / F.greatest(n_chars, F.lit(1))).cast("long"),
        "punct_ratio_micro": F.floor(n_punct * 1000000 / F.greatest(n_chars, F.lit(1))).cast("long"),
        "mean_token_len_micro": F.floor(n_chars * 1000000 / F.greatest(n_tokens, F.lit(1))).cast("long"),
    }


def quality_score_micro(text: Column) -> Column:
    """Composite 0..1_000_000 quality score: alpha-heavy, some
    stopwords, sane token length. Weights are fixed & documented."""
    f = quality_features(text)
    len_ok = F.when((f["n_tokens"] >= 20) & (f["n_tokens"] <= 100000), F.lit(1)).otherwise(F.lit(0))
    stop_ok = F.when(f["n_stop"] >= 2, F.lit(1)).otherwise(F.lit(0))
    mean_ok = F.when(
        (f["mean_token_len_micro"] >= 2_000_000)
        & (f["mean_token_len_micro"] <= 12_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        f["alpha_ratio_micro"] * 40 / 100
        + len_ok * 200000
        + stop_ok * 200000
        + mean_ok * 200000
    ).cast("long")


def doc_fingerprint(norm_text: Column, k: int = 9) -> Column:
    """64-bit document fingerprint = xxhash64 of the lexicographically
    smallest k-shingle set member joined with the doc length — a cheap
    rolling-hash-flavored content id stable under whitespace noise."""
    from dedup.minhash import shingles_expr

    sh = shingles_expr(norm_text, k)
    return F.xxhash64(F.array_min(sh), F.array_max(sh), F.length(norm_text))


def with_textstats(pages: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    out = pages.withColumn("lang_pred", lang_id(c)).withColumn(
        "n_tokens", token_count(c)
    ).withColumn("quality_micro", quality_score_micro(c))
    return out
