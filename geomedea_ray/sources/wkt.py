"""WKT parser/formatter (F8 — reference: geomedea/src/wkt.rs:24-142
implements a minimal WKT dialect as a test DSL; here it is also the
geometry column of the CSV ingest bridge, sources/csv_source.py).

Supports POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
MULTIPOLYGON, GEOMETRYCOLLECTION and EMPTY, converting to/from
GeoJSON geometry dicts (the interchange format the rest of the
bridge uses)."""

from __future__ import annotations

import re

_TYPES = (
    "GEOMETRYCOLLECTION", "MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
    "POLYGON", "LINESTRING", "POINT",
)

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _coords_text(s: str, start: int) -> tuple[str, int]:
    """Balanced-paren span starting at s[start] == '('; returns the
    inner text and the index just past the closing paren."""
    assert s[start] == "("
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1:i], i + 1
    raise ValueError(f"unbalanced parentheses in WKT: {s[start:start+40]!r}")


def _parse_point_list(text: str) -> list[list[float]]:
    """'x y, x y, …' → [[x, y], …] (z/m ordinates rejected)."""
    pts = []
    for part in text.split(","):
        nums = _NUM.findall(part)
        if len(nums) != 2:
            raise ValueError(f"expected 'x y' pair, got {part.strip()!r}")
        pts.append([float(nums[0]), float(nums[1])])
    return pts


def _parse_nested(text: str) -> list[str]:
    """Split 'ring, ring, …' where each ring is '(…)' — top level only."""
    out, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [c.strip()[1:-1] if c.strip().startswith("(") else c.strip() for c in out]


def parse_wkt(s: str) -> dict | None:
    """WKT string → GeoJSON geometry dict (None for 'EMPTY' point)."""
    s = s.strip()
    up = s.upper()
    for t in _TYPES:
        if up.startswith(t):
            rest = s[len(t):].strip()
            break
    else:
        raise ValueError(f"unknown WKT type in {s[:40]!r}")
    if rest.upper().startswith("EMPTY"):
        if t == "POINT":
            return None
        if t == "GEOMETRYCOLLECTION":
            return {"type": "GeometryCollection", "geometries": []}
        return {"type": _gj_name(t), "coordinates": []}
    inner, _ = _coords_text(rest, 0)
    if t == "POINT":
        return {"type": "Point", "coordinates": _parse_point_list(inner)[0]}
    if t == "LINESTRING":
        return {"type": "LineString", "coordinates": _parse_point_list(inner)}
    if t == "MULTIPOINT":
        # both 'MULTIPOINT (1 2, 3 4)' and 'MULTIPOINT ((1 2), (3 4))'
        parts = _parse_nested(inner)
        return {"type": "MultiPoint",
                "coordinates": [_parse_point_list(p)[0] for p in parts]}
    if t == "POLYGON":
        return {"type": "Polygon",
                "coordinates": [_parse_point_list(r) for r in _parse_nested(inner)]}
    if t == "MULTILINESTRING":
        return {"type": "MultiLineString",
                "coordinates": [_parse_point_list(r) for r in _parse_nested(inner)]}
    if t == "MULTIPOLYGON":
        polys = []
        depth, cur, tops = 0, [], []
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                tops.append("".join(cur)); cur = []
            else:
                cur.append(ch)
        if cur:
            tops.append("".join(cur))
        for top in tops:
            top = top.strip()
            body, _ = _coords_text(top, top.index("("))
            polys.append([_parse_point_list(r) for r in _parse_nested(body)])
        return {"type": "MultiPolygon", "coordinates": polys}
    # GEOMETRYCOLLECTION: split top-level geometries by scanning types
    geoms = []
    i = 0
    while i < len(inner):
        seg = inner[i:].lstrip()
        off = len(inner) - len(inner[i:]) + (len(inner[i:]) - len(seg))
        if not seg:
            break
        upseg = seg.upper()
        for t2 in _TYPES:
            if upseg.startswith(t2):
                after = seg[len(t2):].lstrip()
                if after.upper().startswith("EMPTY"):
                    end = len(seg) - len(after) + 5  # past 'EMPTY'
                else:
                    p0 = seg.index("(")
                    _, end = _coords_text(seg, p0)
                geoms.append(parse_wkt(seg[:end]))
                i = off + end
                while i < len(inner) and inner[i] in ", ":
                    i += 1
                break
        else:
            raise ValueError(f"bad GEOMETRYCOLLECTION member at {seg[:30]!r}")
    return {"type": "GeometryCollection", "geometries": geoms}


def _gj_name(t: str) -> str:
    return {
        "POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
        "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
        "MULTIPOLYGON": "MultiPolygon", "GEOMETRYCOLLECTION": "GeometryCollection",
    }[t]


def _fmt_pts(pts) -> str:
    return ", ".join(f"{x:.10g} {y:.10g}" for x, y in pts)


def format_wkt(geom: dict | None) -> str:
    """GeoJSON geometry dict → WKT string (empty geometries emit the
    WKT 'EMPTY' keyword, keeping parse→format→parse a fixed point)."""
    if geom is None:
        return "POINT EMPTY"
    t = geom["type"]
    c = geom.get("coordinates", [])
    if t == "GeometryCollection" and not geom.get("geometries"):
        return "GEOMETRYCOLLECTION EMPTY"
    if t != "GeometryCollection" and not len(c):
        return f"{t.upper()} EMPTY"
    if t == "Point":
        return f"POINT ({_fmt_pts([c])})"
    if t == "LineString":
        return f"LINESTRING ({_fmt_pts(c)})"
    if t == "MultiPoint":
        return f"MULTIPOINT ({_fmt_pts(c)})"
    if t == "Polygon":
        return "POLYGON (" + ", ".join(f"({_fmt_pts(r)})" for r in c) + ")"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(f"({_fmt_pts(r)})" for r in c) + ")"
    if t == "MultiPolygon":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(f"({_fmt_pts(r)})" for r in poly) + ")" for poly in c
        ) + ")"
    if t == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ", ".join(
            format_wkt(g) for g in geom["geometries"]
        ) + ")"
    raise ValueError(f"unsupported geometry type {t!r}")
