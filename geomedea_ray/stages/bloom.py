"""Distributed Bloom filter for map-side join pruning.

No reference counterpart (the reference has no joins at all — SURVEY
§2.5); this is the classic shuffle-volume lever for large×large joins
at 100 TB: when the probe side is much bigger than the build side's
key set, a few-MB bitmap broadcast once per worker lets every probe
batch drop non-matching rows BEFORE the all-to-all exchange, so the
shuffle moves only rows that can join (plus a bounded false-positive
trickle, which the downstream merge eliminates — correctness never
depends on the filter).

Build discipline mirrors every other combine in this repo: per-block
partial bitmaps (bounded by ``num_bits/8`` bytes each, never by row
count), a two-level TREE OR-combine, one driver-side ``frombuffer``.
Double hashing (Kirsch-Mitzenmacher 2006: ``h_i = h1 + i*h2``) gives
``num_hashes`` independent probes from one siphash pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: sizing: 16 bits/key at k=7 hashes ≈ 0.04% false-positive rate
BLOOM_BITS_PER_KEY = 16
BLOOM_HASHES = 7
#: bitmap cap — 16 MiB broadcast; beyond ~2^27/16 ≈ 8.4M distinct keys
#: the FPR degrades gracefully instead of the broadcast growing
MAX_BLOOM_BITS = 1 << 27
MIN_BLOOM_BITS = 1 << 13


def _key_hash(series: pd.Series) -> np.ndarray:
    """Dtype-normalized deterministic 64-bit hash: integer keys hash as
    int64 so the SAME key value hashes identically when the two join
    sides store it at different widths (int32 lineitem vs int64 orders
    would otherwise silently never match)."""
    if pd.api.types.is_integer_dtype(series):
        series = series.astype("int64")
    elif not pd.api.types.is_object_dtype(series):
        series = series.astype("object")
    return pd.util.hash_pandas_object(
        series, index=False, hash_key="geomedea_ray_01!"
    ).to_numpy(np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain, Vigna) — derives
    the second, independent hash stream from the first."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Immutable packed bitmap + probe parameters. Small enough to
    ``ray.put`` once and fetch per worker (util.get_once)."""

    __slots__ = ("bitmap", "num_bits", "num_hashes")

    def __init__(self, bitmap: np.ndarray, num_bits: int, num_hashes: int):
        self.bitmap = bitmap  # uint8[num_bits/8]
        self.num_bits = num_bits
        self.num_hashes = num_hashes

    def contains(self, series: pd.Series) -> np.ndarray:
        """Vectorized membership test → bool[n]. False ⇒ definitely
        absent; True ⇒ present or false positive."""
        if len(series) == 0:
            return np.zeros(0, bool)
        h1 = _key_hash(series)
        h2 = _splitmix64(h1) | np.uint64(1)
        mask = np.uint64(self.num_bits - 1)
        ok = np.ones(len(h1), bool)
        for i in range(self.num_hashes):
            p = (h1 + np.uint64(i) * h2) & mask
            byte = self.bitmap[(p >> np.uint64(3)).astype(np.int64)]
            ok &= ((byte >> (p & np.uint64(7)).astype(np.uint8)) & np.uint8(1)).astype(bool)
        return ok


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def auto_num_bits(count: int) -> int:
    """Bitmap size for ``count`` keys: BLOOM_BITS_PER_KEY bits each,
    power of two, clamped to [MIN_BLOOM_BITS, MAX_BLOOM_BITS]."""
    return min(
        MAX_BLOOM_BITS,
        max(MIN_BLOOM_BITS, _next_pow2(BLOOM_BITS_PER_KEY * max(count, 1))),
    )


def _set_bits(bm: np.ndarray, series: pd.Series, num_bits: int, k: int) -> None:
    if len(series) == 0:
        return
    mask = np.uint64(num_bits - 1)
    h1 = _key_hash(series)
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(k):
        p = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(
            bm,
            (p >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
        )


def bloom_from_series(
    series: pd.Series,
    num_bits: int | None = None,
    num_hashes: int = BLOOM_HASHES,
) -> BloomFilter:
    """Single-shot driver-side build — the fast path when the build
    side is already small/local (the distributed TREE build's two
    repartition barriers cost ~1.5 s of latency that dwarfs a small
    side's hashing work)."""
    if num_bits is None:
        num_bits = auto_num_bits(len(series))
    bm = np.zeros(num_bits // 8, np.uint8)
    _set_bits(bm, series, num_bits, num_hashes)
    return BloomFilter(bm, num_bits, num_hashes)


def bloom_build(
    ds,
    col: str,
    num_bits: int | None = None,
    num_hashes: int = BLOOM_HASHES,
) -> BloomFilter:
    """Build a BloomFilter over ``ds[col]`` with one streaming pass.

    ``num_bits`` defaults to ``BLOOM_BITS_PER_KEY × ds.count()``
    rounded to a power of two (``& mask`` instead of ``%``), clamped to
    [2^13, 2^27]; pass it explicitly when the distinct-key count is
    known to be far below the row count. ``ds.count()`` is free on a
    materialized dataset (metadata) — callers in the join path hand in
    the already-materialized build side.
    """
    if num_bits is None:
        num_bits = auto_num_bits(ds.count())
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    nbytes = num_bits // 8
    k = num_hashes

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(nbytes, np.uint8)
        _set_bits(bm, df[col], num_bits, k)
        return pd.DataFrame({"bm": [bm.tobytes()]})

    def _orc(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, np.uint8)
        for b in df["bm"]:
            acc |= np.frombuffer(b, np.uint8)
        return pd.DataFrame({"bm": [acc.tobytes()]})

    rows = (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_orc, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_orc, batch_format="pandas", batch_size=None)
        .take(1)
    )
    bitmap = np.frombuffer(rows[0]["bm"], np.uint8).copy()
    return BloomFilter(bitmap, num_bits, num_hashes)
