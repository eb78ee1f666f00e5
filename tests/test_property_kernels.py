"""Property-based (hypothesis) tests over the pure numpy kernels — the
algorithmic core that every Spark stage trusts. No JVM involved, so
these run fast and explore adversarial inputs (repeats, separators,
short strings, unicode) that the corpus tiers don't.

Pinned properties:
  * rolling_poly_hashes == the naive Σ b[i+j]·257^j mod 2⁶⁴ definition
    (the shared MinHash/winnowing hash construction).
  * winnowing recall guarantee (Schleimer et al., SIGMOD'03): any
    shared substring of length ≥ window + k - 1 selects at least one
    identical fingerprint in both docs — THE blocking soundness the
    substring and LCP channels rest on.
  * winnow_fingerprints ⊆ the doc's k-gram hash set, deterministic.
  * simhash_batch == simhash_reference per segment, any segmentation.
  * minhash_batch == minhash_rows per doc (cache-blocked == naive).
  * suffix_array_lcp_pairs == brute-force width-gram-sharing relation.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dedup.hashing import (
    minhash_batch,
    minhash_rows,
    perm_seeds,
    rolling_poly_hashes,
    splitmix64,
)
from dedup.simhash import simhash_batch, simhash_reference
from dedup.suffix import suffix_array_lcp_pairs, winnow_fingerprints

# normalized-alphabet text (the kernels only ever see normalizer output:
# lowercase ascii + digits + space — plus åäö which are multi-byte utf-8)
TEXT = st.text(alphabet="ab 01åäö", min_size=0, max_size=200)


@given(st.binary(min_size=1, max_size=300), st.integers(1, 12))
@settings(max_examples=200, deadline=None)
def test_rolling_poly_hashes_matches_naive(data, width):
    b = np.frombuffer(data, dtype=np.uint8)
    got = rolling_poly_hashes(b, width)
    n = len(b) - width + 1
    if n <= 0:
        assert len(got) == 0
        return
    base = np.uint64(257)
    naive = np.zeros(n, dtype=np.uint64)
    for j in range(width):
        naive += b[j : j + n].astype(np.uint64) * base ** np.uint64(j)
    assert (got == splitmix64(naive)).all()


@given(TEXT)
@settings(max_examples=150, deadline=None)
def test_winnow_subset_of_kgram_hashes_and_deterministic(text):
    k, window = 9, 32
    fps = winnow_fingerprints(text, k, window)
    assert (fps == winnow_fingerprints(text, k, window)).all()
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    allh = set(rolling_poly_hashes(b, k).tolist()) if len(b) >= k else set()
    assert set(fps.tolist()) <= allh
    # the kernel's short-doc gate is CHAR length (its documented
    # contract; multi-byte åäö can make bytes ≥ k while chars < k — the
    # channels filter at substring_min_len=64 chars long before this
    # matters): text of ≥ k CHARS always selects ≥ 1 fingerprint
    if len(text) >= k:
        assert len(fps) >= 1


@given(
    st.text(alphabet="ab", min_size=40, max_size=120),
    st.text(alphabet="cd ", min_size=0, max_size=60),
    st.text(alphabet="ce ", min_size=0, max_size=60),
)
@settings(max_examples=100, deadline=None)
def test_winnowing_recall_guarantee(shared, pre, post):
    """Shared substring of length ≥ window + k - 1 (= 40 at k=9, w=32)
    ⇒ the two docs share at least one selected fingerprint."""
    k, window = 9, 32
    a = pre + shared
    b = shared + post
    fa = set(winnow_fingerprints(a, k, window).tolist())
    fb = set(winnow_fingerprints(b, k, window).tolist())
    assert fa & fb, "winnowing guarantee violated"


@given(
    st.lists(
        st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=30),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_simhash_batch_matches_reference_any_segmentation(docs):
    concat = np.concatenate(
        [np.asarray(d, dtype=np.int64).view(np.uint64) for d in docs]
    )
    lens = np.fromiter((len(d) for d in docs), dtype=np.int64)
    offsets = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    got = simhash_batch(concat, offsets)
    for i, d in enumerate(docs):
        ref = simhash_reference(
            np.asarray(d, dtype=np.int64).view(np.uint64)
        )
        assert int(got[i]) == ref


@given(
    st.lists(
        st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=40),
        min_size=1,
        max_size=10,
    ),
    st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_minhash_batch_matches_per_doc_rows(docs, seed):
    seeds = perm_seeds(8, seed)
    concat = np.concatenate(
        [np.asarray(d, dtype=np.int64).view(np.uint64) for d in docs]
    )
    lens = np.fromiter((len(d) for d in docs), dtype=np.int64)
    offsets = np.zeros(len(docs), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    got = minhash_batch(concat, offsets, seeds)
    for i, d in enumerate(docs):
        ref = minhash_rows(
            np.asarray(d, dtype=np.int64).view(np.uint64), seeds
        )
        assert (got[i] == ref).all()


@given(
    st.dictionaries(
        st.text(alphabet="uv", min_size=1, max_size=4).map(
            lambda s: "u/" + s
        ),
        st.text(alphabet="xy z", min_size=0, max_size=150),
        min_size=0,
        max_size=6,
    ),
    st.integers(8, 64),
)
@settings(max_examples=80, deadline=None)
def test_suffix_kernel_equals_bruteforce_gram_sharing(texts, min_lcp):
    width = min(min_lcp, 64)
    got = set(suffix_array_lcp_pairs(texts, min_lcp))
    grams = {
        u: {
            t[i : i + width] for i in range(len(t) - width + 1)
        }
        for u, t in texts.items()
    }
    urls = sorted(texts)
    expected = set()
    for i, a in enumerate(urls):
        for b in urls[i + 1 :]:
            if grams[a] & grams[b]:
                expected.add((a, b))
    assert got == expected


# ---------------------------------------------------------------------------
# media codecs (dedup/multimodal.py): round-trip identity + corrupt-input
# totality — the 100-TB policy is "a bad payload never kills a scan", so
# decode must either return, raise NotImplementedError, or raise
# ValueError/struct.error (the types the feature fns catch), never
# anything else, on ARBITRARY bytes.
# ---------------------------------------------------------------------------

from dedup.multimodal import (  # noqa: E402
    _probe_header,
    decode_audio,
    decode_image,
    pack_bmp,
    pack_wav,
)


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2 ** 32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    pix = np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    payload = pack_bmp(pix)
    assert np.array_equal(decode_image(payload), pix)
    kind, pw, ph, _sr, _nf = _probe_header(payload)
    assert (kind, pw, ph) == ("image", w, h)


@given(
    st.integers(0, 500),
    st.integers(1, 2),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(0, 2 ** 32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    pcm = np.random.default_rng(seed).integers(
        -(2 ** 15), 2 ** 15, (n, ch)
    ).astype(np.int16)
    frames, got_rate = decode_audio(pack_wav(pcm, rate))
    assert got_rate == rate
    assert np.array_equal(frames, pcm)
    kind, _w, _h, sr, nf = _probe_header(pack_wav(pcm, rate))
    assert (kind, sr, nf) == ("audio", rate, n)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=300, deadline=None)
def test_codecs_total_on_arbitrary_bytes(payload):
    import struct as _struct

    for fn in (decode_image, decode_audio):
        try:
            fn(payload)
        except (NotImplementedError, ValueError, _struct.error):
            pass  # the allowed failure modes (feature fns catch these)
    # the header probe NEVER raises — nulls on anything unparseable
    _probe_header(payload)


@given(st.binary(min_size=0, max_size=300), st.integers(0, 2 ** 32 - 1))
@settings(max_examples=200, deadline=None)
def test_codecs_total_on_truncated_real_containers(tail, seed):
    """Adversarial: REAL container magic followed by truncation/garbage
    — the case arbitrary bytes almost never hit by chance."""
    import struct as _struct

    rng = np.random.default_rng(seed)
    real_bmp = pack_bmp(rng.integers(0, 256, (9, 9, 3), dtype=np.uint8))
    real_wav = pack_wav(
        rng.integers(-100, 100, (50, 1)).astype(np.int16), 8000
    )
    cut = int(rng.integers(0, 60))
    for payload in (
        real_bmp[:cut] + tail,
        real_wav[:cut] + tail,
        b"BM" + tail,
        b"RIFF" + tail[:4] + b"WAVE" + tail,
    ):
        for fn in (decode_image, decode_audio):
            try:
                fn(payload)
            except (NotImplementedError, ValueError, _struct.error):
                pass
        _probe_header(payload)
