"""Hilbert space-filling-curve math, vectorized with numpy.

Bit-compatible with the reference engine's key derivation
(reference: geomedea/src/writer/hilbert.rs:5-78): 16-bit x/y are
interleaved into a 32-bit Hilbert d-index using the public-domain
branchless algorithm from https://github.com/rawrunprotected/hilbert_curves
(the same public-domain source the reference credits). Verified against
the reference goldens 143165576 / 2720145952
(reference: geomedea/src/writer/hilbert.rs:85-98) in
tests/test_hilbert.py.
"""

from __future__ import annotations

import numpy as np

#: Coordinates are scaled into ``0..HILBERT_MAX`` before interleaving
#: (reference: geomedea/src/writer/hilbert.rs:5).
HILBERT_MAX = np.uint32(0xFFFF)

_U1 = np.uint32(1)
_MASKS = (
    (np.uint32(0x00FF00FF), np.uint32(8)),
    (np.uint32(0x0F0F0F0F), np.uint32(4)),
    (np.uint32(0x33333333), np.uint32(2)),
    (np.uint32(0x55555555), np.uint32(1)),
)


def hilbert_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Map (x, y) in [0, 65535]^2 to the 32-bit Hilbert d-index.

    Vectorized, branchless; all ops on uint32 arrays. Public-domain
    algorithm (rawrunprotected/hilbert_curves), same variant as the
    reference (geomedea/src/writer/hilbert.rs:8-64).
    """
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = HILBERT_MAX

    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)

    a2 = a | (b >> _U1)
    b2 = (a >> _U1) ^ a
    c2 = ((c >> _U1) ^ (b & (d >> _U1))) ^ c
    d2 = ((a & (c >> _U1)) ^ (d >> _U1)) ^ d
    a, b, c, d = a2, b2, c2, d2

    s = np.uint32(2)
    a2 = (a & (a >> s)) ^ (b & (b >> s))
    b2 = (a & (b >> s)) ^ (b & ((a ^ b) >> s))
    c2 = c ^ ((a & (c >> s)) ^ (b & (d >> s)))
    d2 = d ^ ((b & (c >> s)) ^ ((a ^ b) & (d >> s)))
    a, b, c, d = a2, b2, c2, d2

    s = np.uint32(4)
    a2 = (a & (a >> s)) ^ (b & (b >> s))
    b2 = (a & (b >> s)) ^ (b & ((a ^ b) >> s))
    c2 = c ^ ((a & (c >> s)) ^ (b & (d >> s)))
    d2 = d ^ ((b & (c >> s)) ^ ((a ^ b) & (d >> s)))
    a, b, c, d = a2, b2, c2, d2

    s = np.uint32(8)
    c2 = c ^ ((a & (c >> s)) ^ (b & (d >> s)))
    d2 = d ^ ((b & (c >> s)) ^ ((a ^ b) & (d >> s)))

    a = c2 ^ (c2 >> _U1)
    b = d2 ^ (d2 >> _U1)

    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    for mask, shift in _MASKS:
        i0 = (i0 | (i0 << shift)) & mask
        i1 = (i1 | (i1 << shift)) & mask
    return (i1 << _U1) | i0


def scaled_hilbert(
    lng_i32: np.ndarray,
    lat_i32: np.ndarray,
    extent: tuple[int, int, int, int],
) -> np.ndarray:
    """Hilbert index of scaled-int32 points within a global extent.

    Reproduces the reference's integer math exactly (reference:
    geomedea/src/writer/hilbert.rs:70-78): widths computed as
    ``(max - min) as u32``, then ``(p - min) as u64 * 65535 / width``
    with u64 intermediates and floor division.

    ``extent`` is ``(min_lng, min_lat, max_lng, max_lat)`` in scaled
    int32 units. A degenerate zero-width axis maps to x=0 (the
    reference would divide by zero; we guard — the result for a
    single-point extent is well-defined as cell 0).
    """
    min_lng, min_lat, max_lng, max_lat = (int(v) for v in extent)
    w = np.uint64(np.uint32(max_lng - min_lng)) or np.uint64(1)
    h = np.uint64(np.uint32(max_lat - min_lat)) or np.uint64(1)
    hm = np.uint64(65535)
    dx = (np.asarray(lng_i32, dtype=np.int64) - min_lng).astype(np.uint64)
    dy = (np.asarray(lat_i32, dtype=np.int64) - min_lat).astype(np.uint64)
    x = (dx * hm // w).astype(np.uint32)
    y = (dy * hm // h).astype(np.uint32)
    return hilbert_u32(x, y)


def hilbert_cell_id(hilbert: np.ndarray, res: int) -> np.ndarray:
    """Hierarchical cell id at resolution ``res`` (0..16).

    The top ``2*res`` bits of the 32-bit Hilbert index — a
    Hilbert-ordered quadtree cell, functionally S2-like: prefix cells
    nest, and each cell is a contiguous Hilbert range
    ``[cell << (32-2r), (cell+1) << (32-2r))`` so cell queries become
    range queries over the spatial sort order. This generalizes the
    reference's Hilbert scaling (geomedea/src/writer/hilbert.rs:70-78)
    into an addressable cell scheme (SURVEY §7.0).
    """
    if not 0 <= res <= 16:
        raise ValueError(f"res must be in 0..16, got {res}")
    shift = np.uint32(32 - 2 * res)
    h = np.asarray(hilbert, dtype=np.uint32)
    if res == 0:
        return np.zeros_like(h)
    return h >> shift


def cell_range(cell_id: int, res: int) -> tuple[int, int]:
    """Half-open Hilbert-index range [lo, hi) covered by a cell."""
    shift = 32 - 2 * res
    lo = cell_id << shift
    hi = (cell_id + 1) << shift
    return lo, hi


def morton_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Plain bit-interleave (Z-order / Morton) of two 16-bit coords —
    the layout A/B baseline against the Hilbert curve: one magic-bits
    spread per axis, no rotation, cheaper to compute but with the
    well-known locality seams at power-of-two boundaries (a Z jump
    crosses the whole domain; Hilbert never does). Same [0, 65535]^2
    domain and uint32 key space as hilbert_u32, so every downstream
    consumer (sort, manifest ranges, cell ids) is key-compatible."""
    i0 = np.asarray(x, dtype=np.uint32)
    i1 = np.asarray(y, dtype=np.uint32)
    for mask, shift in _MASKS:
        i0 = (i0 | (i0 << shift)) & mask
        i1 = (i1 | (i1 << shift)) & mask
    return (i1 << _U1) | i0


def scaled_morton(
    lng_i32: np.ndarray,
    lat_i32: np.ndarray,
    extent: tuple[int, int, int, int],
) -> np.ndarray:
    """Morton index with the SAME u64 extent scaling as scaled_hilbert
    (only the final interleave differs), so layout comparisons isolate
    the curve itself."""
    min_lng, min_lat, max_lng, max_lat = (int(v) for v in extent)
    w = np.uint64(np.uint32(max_lng - min_lng)) or np.uint64(1)
    h = np.uint64(np.uint32(max_lat - min_lat)) or np.uint64(1)
    hm = np.uint64(65535)
    dx = (np.asarray(lng_i32, dtype=np.int64) - min_lng).astype(np.uint64)
    dy = (np.asarray(lat_i32, dtype=np.int64) - min_lat).astype(np.uint64)
    x = (dx * hm // w).astype(np.uint32)
    y = (dy * hm // h).astype(np.uint32)
    return morton_u32(x, y)
