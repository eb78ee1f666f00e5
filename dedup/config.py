"""Pipeline configuration.

The reference wires behaviour through per-tag config dicts
(lib/mergeability-validators.js:95-100, lib/record-utils.js:31-38); the
rebuild concentrates all knobs in one dataclass that every stage takes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# 2^61 - 1 (Mersenne); the modulus for the portable affine permutations.
MERSENNE_61 = (1 << 61) - 1

# Stop-field rule vocabulary of the reference's validate-fields engine
# (lib/validate-fields.js:32-94). See dedup/rules.py.
DEFAULT_FIELD_RULES: dict[str, list[str]] = {
    # web analogues of the reference's configured tags
    # (lib/mergeability-validators.js:95-100):
    #   027 neitherHas; 240 identical|neitherHas;
    #   830 identical|preferredIsSupersetExceptIfEmpty; 880 identical|otherHas
    "canonical_links": ["identical", "preferredIsSupersetExceptIfEmpty"],
    "meta_tags": ["identical", "otherHas"],
    "tracking_ids": ["neitherHas"],
}


@dataclass(frozen=True)
class DedupConfig:
    """All knobs for one dedup run. Deterministic given (seed, knobs)."""

    # --- shingling / signatures -------------------------------------
    k_shingle: int = 9          # char k-grams over normalized text
    num_perm: int = 64          # MinHash permutations (fast mode)
    bands: int = 16             # LSH bands b
    rows_per_band: int = 4      # LSH rows r  (b*r == num_perm)
    seed: int = 42
    # candidate pairs must collide in >= this many bands (fast mode):
    # at J=0.80, band-collision count ~ Binomial(16, 0.8^4=0.41),
    # P[X < 2] ≈ 0.0027 (and ≈ 2e-4 at J=0.85) — well inside the 0.99
    # recall budget, while most sub-threshold boilerplate pairs collide
    # exactly once and are pruned on slim 16-byte rows BEFORE any
    # signature/shingle array join. Set to 1 for maximum recall.
    min_band_collisions: int = 2

    # fast-mode shingle hash width: 31 (int, half the join bytes) or 64
    shingle_hash_bits: int = 31

    # hash_mode:
    #   "fast"     — JVM xxhash64 shingle hashes + numpy splitmix64
    #                permutations (production path)
    #   "portable" — md5-derived 60-bit hashes expressible identically
    #                in Spark SQL and DuckDB (oracle-checked path)
    hash_mode: str = "fast"

    # portable mode uses a smaller signature so the DuckDB oracle stays
    # cheap; parity (not recall) is what that mode certifies.
    portable_num_perm: int = 16
    portable_bands: int = 4
    portable_rows_per_band: int = 4

    # --- verification ----------------------------------------------
    jaccard_threshold: float = 0.80   # north_rule minimum-slice threshold
    # MinHash-agreement pre-filter before the exact-Jaccard join (fast
    # mode only): floor 0.5 at num_perm=128 loses true >=0.8 pairs with
    # probability < 1e-12 while pruning sub-threshold boilerplate pairs
    # before the wide shingle-array shuffle.
    estimate_prefilter: bool = True
    estimate_floor: float = 0.5

    # --- SimHash channel -------------------------------------------
    simhash_bits: int = 64
    simhash_chunks: int = 4           # pigeonhole chunks (distance <= chunks-1)
    simhash_max_hamming: int = 3
    # Degenerate-short-doc guard: SimHash pairs bypass the Jaccard gate
    # (Hamming IS the channel's verification), but a frequency-weighted
    # fingerprint over a handful of tokens is dominated by shared
    # vocabulary — two unrelated short docs can collide within the
    # Hamming ball. Docs whose normalized text is shorter than this
    # never enter the channel (they still reach exact/LSH dedup).
    simhash_min_len: int = 64

    # --- word n-gram Jaccard channel --------------------------------
    # exact word-n-gram Jaccard (w-shingling, Broder 1997) — see
    # dedup/ngram.py. n = gram width in WORDS over the normalized text.
    ngram_n: int = 3
    # document-frequency cap for CANDIDATE GENERATION: grams in more
    # docs than this are boilerplate vocabulary and never seed a pair
    # (the prefix-filter / stop-gram move — same role as the LSH
    # hot-bucket cap); the Jaccard VALUE still counts every gram.
    ngram_df_cap: int = 64
    # exact n-gram Jaccard a pair must reach to be emitted. Word
    # trigram Jaccard is much stricter than char-9-gram Jaccard (one
    # edited word kills n grams), so the channel default sits below the
    # char-shingle threshold.
    ngram_jaccard_threshold: float = 0.5

    # --- substring / suffix channel --------------------------------
    fingerprint_window: int = 32      # winnowing window (chars)
    substring_min_len: int = 64       # shorter docs skip the channel
    substring_min_shared: int = 2     # shared fingerprints to become candidate
    # fingerprint buckets run over exact-dup REPRESENTATIVES, so sizes
    # count distinct texts; containment families (one page quoted by
    # many) are legitimate up to this cap, boilerplate floods beyond it
    # take the star path
    substring_max_bucket: int = 64
    # Distributed-LCP per-DOC fan-out bound: the block pass ships each
    # doc's norm_text once per eligible fingerprint block, so a
    # quote-heavy doc sharing hundreds of distinct passages would
    # replicate its text hundreds of times through the shuffle. Each doc
    # joins at most this many blocks (rarest blocks first — smallest
    # block size, then fp, deterministic); the skipped mass is reported,
    # never silent. None = unbounded (oracle/parity runs).
    # int = fixed bound; None = unbounded (oracle/parity runs); "auto" =
    # size the bound from the data at runtime as the exact p99 of
    # per-doc eligible-block counts (BASELINE.md's sizing rule "cap ≥
    # p99 eligible-block count" — 99% of docs keep every block, only
    # the hyper-quoting tail is bounded, and the skipped mass is still
    # reported). Computed from a collected histogram of distinct
    # per-doc block counts (bounded by max fingerprints per doc), so it
    # is deterministic — no approx-percentile merge-order wobble.
    lcp_max_blocks_per_doc: int | str | None = 128

    # --- skew / scale hygiene --------------------------------------
    # LSH band bucket cap: buckets above this switch to O(m) star pairs.
    # 16 keeps worst-case per-bucket expansion at 120 pairs; genuine
    # mega-clusters keep recall through the star hub (and a true ≥0.8
    # pair collides in ~13 of 32 bands, so losing one bucket's full
    # expansion costs nothing), while boilerplate floods stop inflating
    # the verification join (measured: cap 64 → 1.68M candidates on a
    # 200k corpus, mostly sub-threshold boilerplate).
    max_bucket_size: int = 16
    shuffle_partitions: int = 32
    # auto partition sizing (session.auto_shuffle_partitions): target
    # docs per shuffle partition — the constant-partition-SIZE rule the
    # 4M scaling probe measured (BENCH_SCALING.json stretch_4m: 125k
    # docs/partition holds 0.78-0.83 efficiency; 250k collapses to
    # 0.59). cli/bench/scaling compute partitions = max(cores,
    # ceil(docs / this)) instead of hand-picking a count.
    target_docs_per_partition: int = 125_000

    # --- survivor selection ----------------------------------------
    lang_priority: tuple[str, ...] = ("fi", "sv", "en", "de", "fr", "es", "zh")
    # preferredRecordInFENNI analogue (mergeability-validators.js:69-81):
    # a cluster member carrying any of these sources outranks every
    # non-authority member in survivor selection, before freshness.
    authority_sources: tuple[str, ...] = ()

    # --- rule engine ------------------------------------------------
    field_rules: dict[str, list[str]] = field(
        default_factory=lambda: dict(DEFAULT_FIELD_RULES)
    )
    # sameAuthorType analogue (mergeability-validators.js:123-131): field
    # count equality checked in THIS order; the reference throws at the
    # first mismatch, so order is semantics.
    count_fields: tuple[str, ...] = ("headings",)

    # --- integrity ---------------------------------------------------
    # one cheap aggregate asserting count_distinct(uid) == count(url)
    # before any surrogate-keyed shuffle: a 64-bit collision would
    # silently fuse two unrelated pages (expected colliding pairs at
    # 10^12 docs ≈ n²/2⁶⁵ ≈ 27k — uid_bits=128 is required at that
    # scale; at the sandbox's ≤10⁷ docs the expected count is ≤ 3e-6,
    # and this check turns 'silent' into 'loud').
    check_uid_collisions: bool = True
    # Overlap driver planning with executor work by materializing the
    # clean/sigs caches (and the uid invariant) from a background
    # thread; joined before the first big action, errors re-raised.
    # Saves ~20-35 s of serial wall per run, but it is driver-side
    # cleverness — turn it off when debugging a run on a real cluster
    # so every job belongs to the foreground call stack.
    warm_caches_async: bool = True
    # surrogate-key width: 64 → xxhash64 long (8 bytes through every
    # band/candidate/CC shuffle — the production default at ≤10¹⁰ docs);
    # 128 → unhex(md5), a 16-byte binary digest, for the 10^12-doc
    # design point where 64-bit birthday collisions become expected.
    # Every operator treats uid as an opaque orderable key, so the two
    # paths produce identical cluster assignments.
    uid_bits: int = 64
    # connected-components regime bound override: None → the module
    # default (dedup/cluster.DRIVER_CC_MAX_EDGES, 10M edges); 0 forces
    # the distributed star loop regardless of edge count. The scaling
    # protocol pins 0 so the gate measures the LARGE-graph regime (at
    # the 10¹²-doc design point the verified edge set far exceeds any
    # driver bound, so the loop is what actually runs there); production
    # leaves None and small graphs label on the driver.
    cc_driver_max_edges: int | None = None

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError("bands * rows_per_band must equal num_perm")
        if self.portable_bands * self.portable_rows_per_band != self.portable_num_perm:
            raise ValueError("portable bands * rows must equal portable_num_perm")
        if self.hash_mode not in ("fast", "portable"):
            raise ValueError(f"unknown hash_mode {self.hash_mode!r}")
        if self.uid_bits not in (64, 128):
            raise ValueError("uid_bits must be 64 or 128")
        if not 1 <= self.simhash_bits <= 64:
            # the batch kernel packs bits into one uint64 word
            # (dedup/simhash.py simhash_batch unpackbits path) — >64
            # would silently truncate to the low 64 bits
            raise ValueError("simhash_bits must be in [1, 64]")

    @property
    def effective_num_perm(self) -> int:
        return self.num_perm if self.hash_mode == "fast" else self.portable_num_perm

    @property
    def effective_bands(self) -> int:
        return self.bands if self.hash_mode == "fast" else self.portable_bands

    @property
    def effective_rows(self) -> int:
        return (
            self.rows_per_band
            if self.hash_mode == "fast"
            else self.portable_rows_per_band
        )

    @property
    def effective_min_band_collisions(self) -> int:
        """The default prune (2) is calibrated for the fast mode's 16
        bands (see the Binomial math at the field); with the portable
        mode's 4 bands the same prune drops ~46% of true J=0.8 pairs
        (P[Binom(4, 0.41) ≥ 2] ≈ 0.54), so few-band configs fall back
        to no pruning rather than silently halving recall."""
        if self.effective_bands < 8:
            return min(self.min_band_collisions, 1)
        return self.min_band_collisions
