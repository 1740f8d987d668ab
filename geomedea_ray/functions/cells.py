"""Raster tile / quadkey math, vectorized.

The reference's Hilbert scaling (geomedea/src/writer/hilbert.rs:70-78)
generalizes to two tile addressing schemes used by the raster↔vector
assignment operator (SURVEY §2.5, §7.2 step 6):

- ``tile_xy_eq``: equirectangular (plate-carrée) tiles — pure
  arithmetic, exactly reproducible in an SQL oracle (the
  oracle-checked scheme).
- ``tile_xy_mercator``: standard Web-Mercator slippy-map tiles —
  the production scheme; validated in pytest against a scalar oracle
  (transcendental functions may differ by ulps across libms, so it is
  not hash-compared against DuckDB).
"""

from __future__ import annotations

import numpy as np


def tile_xy_eq(lng, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Equirectangular tile coords at ``zoom`` (2^z × 2^z grid).

    tx = floor((lng+180)/360 * 2^z), ty = floor((90-lat)/180 * 2^z),
    clipped to [0, 2^z - 1]. The expression order matters: the SQL
    oracle mirrors it verbatim so doubles round identically.
    """
    n = float(1 << zoom)
    lng = np.asarray(lng, np.float64)
    lat = np.asarray(lat, np.float64)
    tx = np.floor((lng + 180.0) / 360.0 * n)
    ty = np.floor((90.0 - lat) / 180.0 * n)
    hi = (1 << zoom) - 1
    tx = np.clip(tx, 0, hi).astype(np.int32)
    ty = np.clip(ty, 0, hi).astype(np.int32)
    return tx, ty


def tile_xy_mercator(lng, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator XYZ tile coords (slippy-map convention)."""
    n = float(1 << zoom)
    lng = np.asarray(lng, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -85.05112878, 85.05112878)
    tx = np.floor((lng + 180.0) / 360.0 * n)
    lat_r = np.radians(lat)
    ty = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n)
    hi = (1 << zoom) - 1
    return (
        np.clip(tx, 0, hi).astype(np.int32),
        np.clip(ty, 0, hi).astype(np.int32),
    )


def tile_id(tx: np.ndarray, ty: np.ndarray, zoom) -> np.ndarray:
    """Pack (z, x, y) into one int64: (z << 58) | (x << 29) | y.

    29 bits per axis supports zoom ≤ 29; a single sortable key so tile
    groupbys shuffle on one int column. ``zoom`` may be a scalar or a
    per-row array (mixed-level outputs like the tile pyramid).
    """
    return (
        (np.asarray(zoom, np.int64) << np.int64(58))
        | (np.asarray(tx, np.int64) << np.int64(29))
        | np.asarray(ty, np.int64)
    )


def tile_id_unpack(tid) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    tid = np.asarray(tid, np.int64)
    z = (tid >> np.int64(58)) & np.int64(0x3F)
    x = (tid >> np.int64(29)) & np.int64((1 << 29) - 1)
    y = tid & np.int64((1 << 29) - 1)
    return z, x, y


def quadkey(tx, ty, zoom: int) -> np.ndarray:
    """Bing-style quadkey strings (one char per zoom level)."""
    tx = np.asarray(tx, np.int64)
    ty = np.asarray(ty, np.int64)
    out = np.full(tx.shape, "", dtype=object)
    for z in range(zoom, 0, -1):
        mask = np.int64(1) << np.int64(z - 1)
        digit = ((tx & mask) != 0).astype(np.int64) + 2 * ((ty & mask) != 0).astype(np.int64)
        out = np.char.add(out.astype(str), digit.astype(str)).astype(object)
    return out.astype(str)


def parent_tile(tx, ty, levels: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Tile coords ``levels`` up the pyramid (integer halving)."""
    return (
        np.asarray(tx, np.int64) >> np.int64(levels),
        np.asarray(ty, np.int64) >> np.int64(levels),
    )


#: geohash base32 alphabet (public standard — no a/i/l/o)
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spread: ≤31-bit value → 62-bit with zeros
    between bits (classic magic-number shifts, public bit-twiddling)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def geohash_encode(lng, lat, precision: int = 6) -> np.ndarray:
    """Standard geohash strings (Niemeyer's public scheme), fully
    vectorized: scale lng/lat to ``ceil(5·precision/2)``-bit integers
    with the floor expression the SQL mirror repeats VERBATIM,
    interleave (longitude takes the first/odd bit), then map each
    5-bit group through the base32 alphabet with one numpy take per
    character position. Supports even precisions up to 12 and odd ones
    by dropping the trailing bits."""
    if not (1 <= precision <= 12):
        raise ValueError("precision must be in 1..12")
    nbits = 5 * precision
    bx = (nbits + 1) // 2          # lng bits (first of each pair)
    by = nbits // 2
    lng = np.asarray(lng, np.float64)
    lat = np.asarray(lat, np.float64)
    x = np.floor((lng + 180.0) / 360.0 * float(1 << bx)).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * float(1 << by)).astype(np.int64)
    x = np.clip(x, 0, (1 << bx) - 1)
    y = np.clip(y, 0, (1 << by) - 1)
    # interleave: lng at the most-significant (even-index) positions
    if bx == by:
        code = (_spread_bits32(x) << 1) | _spread_bits32(y)
    else:  # odd precision: one extra lng bit leads
        code = (((_spread_bits32(x >> 1) << 1) | _spread_bits32(y))
                << 1) | (x & 1)
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), np.uint8)
    chars = np.empty((precision, len(x)), np.uint8)
    for i in range(precision):
        shift = nbits - 5 * (i + 1)
        chars[i] = alpha[(code >> shift) & 31]
    return chars.T.copy().view(f"S{precision}").reshape(-1).astype(str)


# ----------------------------------------------------------------------
# hexagonal cells (H3-style axial grid — the north rule names "H3/S2";
# the Hilbert quadtree above is the S2-like leg, this is the hex leg)

#: sqrt(3)/3 and 2/3 as the EXACT doubles both the kernel and the SQL
#: mirror multiply by (the SQL embeds repr() of these — the shortest
#: roundtripping decimal parses back to the identical double, so every
#: downstream IEEE op is bit-identical on both sides)
HEX_SQRT3_3 = float(np.sqrt(3.0) / 3.0)   # 0.5773502691896257
HEX_TWO_THIRDS = 2.0 / 3.0                # 0.6666666666666666


def hex_cell(lng, lat, res: int = 5):
    """Axial hex-cell assignment (pointy-top, plate-carrée plane).

    This is OUR hex grid semantics — H3's public API shape (lnglat →
    hex cell id at a resolution) over a documented planar projection
    (equirectangular; H3's icosahedral gnomonic projection needs
    spherical tables out of scope here). Cell size ``s = 360 / 2^res``
    degrees. Returns ``(q, r)`` axial coordinates as int64 arrays.

    Exactly hash-mirrorable in SQL: axial fractional coords → cube
    rounding, every float op written in the IDENTICAL IEEE order on
    both sides, rounding via FLOOR(v + 0.5) (NEVER round() — DuckDB
    half-away vs numpy half-even, CLAUDE.md round-3 rule), strict
    ``>`` comparisons for the cube-round fix so ties take the same
    branch everywhere."""
    if not (0 <= res <= 20):
        raise ValueError("res must be in 0..20")
    lng = np.asarray(lng, np.float64)
    lat = np.asarray(lat, np.float64)
    s = 360.0 / float(1 << res)
    qf = (HEX_SQRT3_3 * lng - lat / 3.0) / s
    rf = (HEX_TWO_THIRDS * lat) / s
    yf = -qf - rf
    rq = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rr = np.floor(rf + 0.5)
    dq = np.abs(rq - qf)
    dy = np.abs(ry - yf)
    dr = np.abs(rr - rf)
    # cube-round: fix the coordinate with the largest rounding error so
    # q + y + r == 0 again; fixing y leaves (q, r) as rounded
    fix_q = (dq > dy) & (dq > dr)
    fix_r = (~fix_q) & (~(dy > dr))
    q = np.where(fix_q, -ry - rr, rq)
    r = np.where(fix_r, -rq - ry, rr)
    return q.astype(np.int64), r.astype(np.int64)


def hex_center(q, r, res: int = 5):
    """Planar center of an axial hex cell — the inverse map used by the
    containment pytest (hex_cell(hex_center(q, r)) == (q, r))."""
    q = np.asarray(q, np.float64)
    r = np.asarray(r, np.float64)
    s = 360.0 / float(1 << res)
    lat = 1.5 * s * r
    lng = np.sqrt(3.0) * s * q + lat / np.sqrt(3.0)
    return lng, lat
