"""Deterministic synthetic analogues of the reference's test corpus
(FIXTURES.md F2/F3/F4 — the original blobs are absent from the
reference checkout, so these are schema+count contracts re-synthesized
as seeded generators; same seed → same features).

- ``places_features``:   1,249 Point features (NAME, ADM0_A3), incl. a
  near-pole point — analogue of test_fixtures/places.json.
- ``countries_features``: 179 Polygon outlines with ``name`` — analogue
  of test_fixtures/countries.geojson.
- ``counties_features``: 3,221 MultiPolygon "counties" laid out so the
  analogue of the reference's USCounties select_bbox golden holds
  EXACTLY: select_all = 3,221 and the contract rect returns **140**
  features, all MultiPolygon (reference golden:
  geomedea/src/http_reader.rs:786-803, counts asserted at
  benches/http_read.rs:16,33) under the reference's bbox-intersects
  semantics.
"""

from __future__ import annotations

import numpy as np

#: the F4 contract query rect: exactly 2 grid columns × 70 rows = 140
COUNTIES_BBOX_RECT = (-86.0, 9.0, -84.0, 40.0)
COUNTIES_BBOX_COUNT = 140
COUNTIES_COUNT = 3221

PLACES_COUNT = 1249

COUNTRIES_COUNT = 179


def places_features(seed: int = 1249) -> list[dict]:
    rng = np.random.default_rng(seed)
    lng = rng.uniform(-179.99, 179.99, PLACES_COUNT)
    lat = rng.uniform(-84.99, 84.99, PLACES_COUNT)
    # the near-pole row the reference fixture is known for
    # (geozero_writer.rs:682-683)
    lng[0], lat[0] = 176.99445209423166, -89.99999981438727
    codes = ["".join(c) for c in rng.choice(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
                                            (PLACES_COUNT, 3))]
    return [
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [float(lng[i]), float(lat[i])]},
            "properties": {"NAME": f"place-{i}", "ADM0_A3": codes[i]},
        }
        for i in range(PLACES_COUNT)
    ]


def countries_features(seed: int = 179) -> list[dict]:
    rng = np.random.default_rng(seed)
    out = []
    for i in range(COUNTRIES_COUNT):
        cx = rng.uniform(-165, 165)
        cy = rng.uniform(-70, 70)
        r = rng.uniform(1.0, 5.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang) * 0.7
        ring = [[float(x), float(y)] for x, y in zip(xs, ys)]
        ring.append(ring[0])
        out.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {"name": f"country-{i}"},
            }
        )
    return out


def counties_features() -> list[dict]:
    """46 lng columns × 70 lat rows = 3,220 cells + 1 remote cell.

    Columns: 1° wide starting at −112, cells inset 0.005° so neighbors
    (and the contract rect's edges) never touch under closed-interval
    intersection. Rows: 0.4° tall from lat 10, inset 0.002°. The rect
    ``COUNTIES_BBOX_RECT`` = (−86, 9, −84, 40) therefore intersects
    exactly columns −86 and −85 (col −87 tops out at −86.005 < −86;
    col −84 starts at −83.995 > −84) × all 70 rows = 140 features.
    """
    feats = []
    fid = 0
    for col in range(46):
        lng_lo = -112.0 + col
        for row in range(70):
            lat_lo = 10.0 + row * 0.4
            x0, x1 = lng_lo + 0.005, lng_lo + 0.995
            y0, y1 = lat_lo + 0.002, lat_lo + 0.398
            xm = (x0 + x1) / 2
            # two parts spanning the full cell bbox (left + right half)
            part = lambda a, b: [[[a, y0], [b, y0], [b, y1], [a, y1], [a, y0]]]
            feats.append(
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "MultiPolygon",
                        "coordinates": [part(x0, xm - 0.01), part(xm + 0.01, x1)],
                    },
                    "properties": {"county_id": fid, "name": f"county-{col}-{row}"},
                }
            )
            fid += 1
    # the +1 far-away county (never in the contract rect)
    feats.append(
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [[[[-150.0, 60.0], [-149.0, 60.0], [-149.0, 61.0],
                                  [-150.0, 61.0], [-150.0, 60.0]]]],
            },
            "properties": {"county_id": fid, "name": "county-remote"},
        }
    )
    assert len(feats) == COUNTIES_COUNT
    return feats
