"""Coordinate quantization + bounds math, vectorized.

Bit-compatible with the reference's data model (reference:
geomedea/src/geometry/mod.rs:282-343, geomedea/src/bounds.rs:24-119):
coordinates are scaled-decimal int32 (1e7 per degree, truncating cast),
bounds are closed-interval int32 rects, centers use unsigned integer
half-widths.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: 1e7 scaled units per degree — COORD_PRECISION_NANOS=100
#: (reference: geomedea/src/geometry/mod.rs:282-287).
COORD_SCALE = 10_000_000


def quantize(degrees) -> np.ndarray:
    """Degrees → scaled int32. TRUNCATES toward zero (C cast), not
    rounds — required for bit-compat (reference:
    geomedea/src/geometry/mod.rs:295-297; golden (-118.2562, 34.1060)
    → (-1182562000, 341060000) at geometry/mod.rs:350-355)."""
    d = np.asarray(degrees, dtype=np.float64) * float(COORD_SCALE)
    # int64 first so |values| > 2^31 don't trip C-cast UB; then narrow.
    return np.trunc(d).astype(np.int64).astype(np.int32)


def dequantize(scaled) -> np.ndarray:
    """Scaled int32 → degrees (reference: geometry/mod.rs:291-293)."""
    return np.asarray(scaled, dtype=np.float64) / float(COORD_SCALE)


@dataclass(frozen=True)
class Bounds:
    """Closed-interval rect in scaled int32 units
    (reference: geomedea/src/bounds.rs:5-9)."""

    min_lng: int
    min_lat: int
    max_lng: int
    max_lat: int

    @staticmethod
    def empty() -> "Bounds":
        i32 = np.iinfo(np.int32)
        return Bounds(i32.max, i32.max, i32.min, i32.min)

    @staticmethod
    def from_degrees(min_lng: float, min_lat: float, max_lng: float, max_lat: float) -> "Bounds":
        q = quantize([min_lng, min_lat, max_lng, max_lat])
        return Bounds(int(q[0]), int(q[1]), int(q[2]), int(q[3]))

    def as_tuple(self) -> tuple[int, int, int, int]:
        return (self.min_lng, self.min_lat, self.max_lng, self.max_lat)

    def extend(self, other: "Bounds") -> "Bounds":
        return Bounds(
            min(self.min_lng, other.min_lng),
            min(self.min_lat, other.min_lat),
            max(self.max_lng, other.max_lng),
            max(self.max_lat, other.max_lat),
        )

    def center(self) -> tuple[int, int]:
        """Integer center: min + (unsigned width)/2 — reproduces the
        reference's integer division exactly (reference:
        geomedea/src/bounds.rs:90-99; goldens bounds.rs:127-140)."""
        w = int(np.uint32(np.int64(self.max_lng) - np.int64(self.min_lng)))
        h = int(np.uint32(np.int64(self.max_lat) - np.int64(self.min_lat)))
        return (
            int(np.int32(np.int64(self.min_lng) + w // 2)),
            int(np.int32(np.int64(self.min_lat) + h // 2)),
        )

    def intersects(self, other: "Bounds") -> bool:
        """Closed-interval overlap (reference: bounds.rs:101-119)."""
        return not (
            self.max_lng < other.min_lng
            or self.max_lat < other.min_lat
            or self.min_lng > other.max_lng
            or self.min_lat > other.max_lat
        )


def bbox_center_i32(min_lng, min_lat, max_lng, max_lat):
    """Vectorized integer bbox center (same math as Bounds.center)."""
    w = (np.asarray(max_lng, np.int64) - np.asarray(min_lng, np.int64)).astype(np.uint32)
    h = (np.asarray(max_lat, np.int64) - np.asarray(min_lat, np.int64)).astype(np.uint32)
    cx = (np.asarray(min_lng, np.int64) + (w // 2).astype(np.int64)).astype(np.int32)
    cy = (np.asarray(min_lat, np.int64) + (h // 2).astype(np.int64)).astype(np.int32)
    return cx, cy


def bbox_intersects(
    amin_lng, amin_lat, amax_lng, amax_lat, bounds: Bounds
) -> np.ndarray:
    """Vectorized closed-interval rect-vs-rect intersection test of N
    bboxes against one query bounds (reference semantics:
    bounds.rs:101-119 — used by select_bbox with NO exact geometry
    refinement, see packed_r_tree/reader.rs:36-38)."""
    return (
        (np.asarray(amax_lng) >= bounds.min_lng)
        & (np.asarray(amax_lat) >= bounds.min_lat)
        & (np.asarray(amin_lng) <= bounds.max_lng)
        & (np.asarray(amin_lat) <= bounds.max_lat)
    )


def haversine_m(lng1, lat1, lng2, lat2) -> np.ndarray:
    """Great-circle distance in meters (degrees in, vectorized)."""
    R = 6_371_008.8
    p1 = np.radians(np.asarray(lat1, np.float64))
    p2 = np.radians(np.asarray(lat2, np.float64))
    dl = np.radians(np.asarray(lng2, np.float64) - np.asarray(lng1, np.float64))
    dp = p2 - p1
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def planar_sq_dist(lng, lat, qlng: float, qlat: float) -> np.ndarray:
    """Squared planar distance in degrees^2. Written as the exact
    expression ``(lng-q)*(lng-q) + (lat-q)*(lat-q)`` so an SQL oracle
    evaluating the same expression gets bit-identical doubles."""
    dx = np.asarray(lng, np.float64) - qlng
    dy = np.asarray(lat, np.float64) - qlat
    return dx * dx + dy * dy


def point_in_polygon(lng, lat, poly_x: np.ndarray, poly_y: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-cast point-in-polygon test.

    ``poly_x/poly_y``: polygon ring vertices (float64 degrees, not
    closed — last→first edge implied). Points exactly on a horizontal
    edge follow the half-open convention (count edges whose (y1<=p<y2)
    or (y2<=p<y1)). N points against one ring at once.

    This is the exact refinement the reference does NOT have (its
    select_bbox is bbox-intersects only — reference:
    geomedea/src/packed_r_tree/reader.rs:36-38); required new work per
    the north rule.
    """
    px = np.asarray(lng, np.float64)
    py = np.asarray(lat, np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(poly_x)
    j = n - 1
    for i in range(n):
        x1, y1 = poly_x[i], poly_y[i]
        x2, y2 = poly_x[j], poly_y[j]
        cond = (y1 <= py) != (y2 <= py)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xcross = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (px < xcross)
        j = i
    return inside


def shoelace_area2(coords, ring_lens) -> int:
    """EXACT twice-signed shoelace area of one feature's rings on the
    quantized integer grid: Σ over rings Σᵢ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) over
    consecutive stored vertices (GeoJSON rings carry the closing
    duplicate vertex, so consecutive pairs ARE the closed shoelace).
    Arbitrary-precision Python ints — cross terms reach ~1.6e18 and
    ring sums exceed int64 on planet-scale polygons; the SQL mirror
    uses HUGEINT. CCW outer rings are positive, CW (holes) negative;
    the signed sum over all rings is the net enclosed area ×2.

    ``coords`` is the engine's flat [x0, y0, x1, y1, …] int list,
    ``ring_lens`` the per-ring vertex counts."""
    total = 0
    off = 0
    for n in ring_lens:
        seg = coords[2 * off: 2 * (off + n)]
        xs, ys = seg[0::2], seg[1::2]
        total += sum(
            int(x) * int(y2) - int(x2) * int(y)
            for x, y, x2, y2 in zip(xs, ys, xs[1:], ys[1:])
        )
        off += n
    return total
