"""A fixed, deterministic world polygon set for point-in-polygon joins.

Plays the role of the reference's `countries`/`USCounties` fixtures
(FIXTURES.md §F3/F4 — real blobs absent from the checkout). Vertices
deliberately sit on x.xx5 offsets so no synthetic point (0.01-degree
grid, sources/tables.py) ever lies exactly on an edge: the Ray raycast
and the SQL oracle then classify every point identically.

The same spec generates BOTH the numpy polygons and the DuckDB raycast
SQL (see ``raycast_sql``), so the two sides can never drift.
"""

from __future__ import annotations

import numpy as np

# (poly_id, name, [(lng, lat), ...])  — mix of triangles, quads and one
# concave polygon; disjoint except POLY_OVERLAP_* which intentionally
# overlap to exercise multi-match join semantics.
POLYGONS: list[tuple[int, str, list[tuple[float, float]]]] = [
    (1, "tri_atlantic", [(-60.005, -20.005), (-20.005, -20.005), (-40.005, 20.005)]),
    (2, "quad_europe", [(-10.005, 35.005), (30.005, 35.005), (30.005, 60.005), (-10.005, 60.005)]),
    (3, "tri_pacific", [(150.005, -40.005), (179.005, -40.005), (165.005, 0.005)]),
    (4, "quad_asia", [(60.005, 5.005), (120.005, 5.005), (120.005, 55.005), (60.005, 55.005)]),
    (5, "concave_americas", [
        (-130.005, -50.005), (-70.005, -50.005), (-70.005, 30.005),
        (-100.005, -10.005), (-130.005, 30.005),
    ]),
    (6, "tri_africa", [(-15.005, -30.005), (45.005, -30.005), (15.005, 30.005)]),
    (7, "quad_overlap_a", [(0.005, -60.005), (40.005, -60.005), (40.005, -35.005), (0.005, -35.005)]),
    (8, "quad_overlap_b", [(20.005, -70.005), (60.005, -70.005), (60.005, -45.005), (20.005, -45.005)]),
]


def polygon_arrays() -> list[tuple[int, str, np.ndarray, np.ndarray, tuple[float, float, float, float]]]:
    """(poly_id, name, xs, ys, bbox) per polygon — bbox for the
    prefilter (the reference's only test — bbox intersects; the
    raycast is the exact refinement on top)."""
    out = []
    for pid, name, verts in POLYGONS:
        xs = np.array([v[0] for v in verts], np.float64)
        ys = np.array([v[1] for v in verts], np.float64)
        out.append((pid, name, xs, ys, (xs.min(), ys.min(), xs.max(), ys.max())))
    return out


def raycast_sql(lng_expr: str, lat_expr: str, verts: list[tuple[float, float]]) -> str:
    """Even-odd raycast as a DuckDB boolean expression, mirroring
    functions.geo.point_in_polygon term by term (half-open rule
    ``(y1<=p) != (y2<=p)``, crossing test ``px < x1+(py-y1)*(x2-x1)/(y2-y1)``)."""
    terms = []
    n = len(verts)
    j = n - 1
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[j]
        j_prev, j = j, i
        if y1 == y2:
            # horizontal edge: the half-open guard (y1<=p)!=(y2<=p) is
            # identically false, so the term never contributes — skip
            # it entirely rather than emit a division by (y2-y1)=0
            # whose safety would hinge on SQL type-promotion quirks
            continue
        cond = f"((({y1!r} <= {lat_expr}) != ({y2!r} <= {lat_expr}))"
        cross = (
            f" AND ({lng_expr} < {x1!r} + ({lat_expr} - {y1!r}) * "
            f"({x2!r} - {x1!r}) / ({y2!r} - {y1!r})))"
        )
        terms.append(f"(CASE WHEN {cond}{cross} THEN 1 ELSE 0 END)")
    return f"(({' + '.join(terms)}) % 2 = 1)"
