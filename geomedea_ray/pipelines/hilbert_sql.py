"""SQL mirror of the Hilbert key derivation — flips the stored-order
scan (R1) into a hash-verified gate query.

Reproduces, term by term in DuckDB BIGINT math, the engine's exact
integer pipeline (all values stay in [0, 2^32) so BIGINT ``>>`` is the
logical shift the uint32 code performs):

    quantize:       trunc(deg · 1e7)                    (functions/geo.py)
    extent:         min/max of the quantized coords      (spatial_write.compute_extent)
    axis scaling:   (p - min) · 65535 // width           (functions/hilbert.scaled_hilbert)
    d-index:        the branchless public-domain
                    rawrunprotected/hilbert_curves algorithm
                    (functions/hilbert.hilbert_u32) as a chained CTE —
                    one CTE per round of the numpy code
"""

from __future__ import annotations

M = 65535


def _x(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def hilbert_ctes(src: str) -> str:
    """CTE chain computing ``hilbert`` for every row of ``src``
    (a CTE/table with integer columns x, y in [0, 65535] and any
    passenger columns — final CTE ``hfin`` carries src.* plus
    ``hilbert``)."""
    s0 = (
        f"h0 AS (SELECT *, {_x('x', 'y')} AS a, {_x(str(M), _x('x', 'y'))} AS b,\n"
        f"       {_x(str(M), '(x | y)')} AS c, (x & {_x('y', str(M))}) AS d FROM {src})"
    )
    s1 = (
        "h1 AS (SELECT * REPLACE (\n"
        "  (a | (b >> 1)) AS a,\n"
        f"  {_x('(a >> 1)', 'a')} AS b,\n"
        f"  {_x(_x('(c >> 1)', '(b & (d >> 1))'), 'c')} AS c,\n"
        f"  {_x(_x('(a & (c >> 1))', '(d >> 1)'), 'd')} AS d) FROM h0)"
    )

    def round_s(name: str, prev: str, s: int) -> str:
        ab = _x("a", "b")
        return (
            f"{name} AS (SELECT * REPLACE (\n"
            f"  {_x(f'(a & (a >> {s}))', f'(b & (b >> {s}))')} AS a,\n"
            f"  {_x(f'(a & (b >> {s}))', f'(b & ({ab} >> {s}))')} AS b,\n"
            f"  {_x('c', _x(f'(a & (c >> {s}))', f'(b & (d >> {s}))'))} AS c,\n"
            f"  {_x('d', _x(f'(b & (c >> {s}))', f'({ab} & (d >> {s}))'))} AS d) FROM {prev})"
        )

    s2 = round_s("h2", "h1", 2)
    s3 = round_s("h3", "h2", 4)
    ab = _x("a", "b")
    s4 = (
        "h4 AS (SELECT *,\n"
        f"  {_x('c', _x('(a & (c >> 8))', '(b & (d >> 8))'))} AS c2,\n"
        f"  {_x('d', _x('(b & (c >> 8))', f'({ab} & (d >> 8))'))} AS d2 FROM h3)"
    )
    i0_expr = _x("x", "y")
    a_expr = _x("c2", "(c2 >> 1)")
    b_expr = _x("d2", "(d2 >> 1)")
    i1_expr = f"({b_expr} | {_x(str(M), f'({i0_expr} | {a_expr})')})"
    s5 = (
        "h5 AS (SELECT *,\n"
        f"  {i0_expr} AS i0_0,\n"
        f"  {i1_expr} AS i1_0 FROM h4)"
    )
    masks = [(0x00FF00FF, 8), (0x0F0F0F0F, 4), (0x33333333, 2), (0x55555555, 1)]
    inter = []
    prev = "h5"
    for r, (mask, sh) in enumerate(masks):
        name = f"h{6 + r}"
        inter.append(
            f"{name} AS (SELECT *, "
            f"(((i0_{r} | (i0_{r} << {sh})) & {mask})) AS i0_{r + 1}, "
            f"(((i1_{r} | (i1_{r} << {sh})) & {mask})) AS i1_{r + 1} FROM {prev})"
        )
        prev = name
    fin = f"hfin AS (SELECT *, ((i1_4 << 1) | i0_4) AS hilbert FROM {prev})"
    return ",\n".join([s0, s1, s2, s3, s4, s5] + inter + [fin])


def cell_compact_sql(res: int = 6) -> str:
    """Oracle for q_cell_compact: distinct res-``res`` Hilbert-quadtree
    cells of the linepoints set, compacted bottom-up — level r-1's
    fully-covered cells are parents with all 4 children covered
    (inputs are DISTINCT, so COUNT(*) = children present); the output
    keeps each covered cell whose parent is NOT fully covered. Mirrors
    stages/cells.compact_cell_array level by level."""
    from geomedea_ray.pipelines.geo_queries import LINEPOINTS_CTE
    from geomedea_ray.pipelines.spatial_write import WORLD_EXTENT

    # q_cell_compact hashes under the FIXED world extent
    # (spatial_write.WORLD_EXTENT), not the data extent
    mnx, mny, mxx, mxy = WORLD_EXTENT
    scale = (
        "q AS (SELECT pid, CAST(TRUNC(lng * 10000000.0) AS BIGINT) AS lng_i,\n"
        "             CAST(TRUNC(lat * 10000000.0) AS BIGINT) AS lat_i FROM pts),\n"
        "sc AS (SELECT pid,\n"
        f"       ((lng_i - ({mnx})) * 65535) // {mxx - mnx} AS x,\n"
        f"       ((lat_i - ({mny})) * 65535) // {mxy - mny} AS y\n"
        "       FROM q)"
    )
    shift = 32 - 2 * res
    ctes = [f"c{res} AS (SELECT DISTINCT (hilbert >> {shift}) AS cell FROM hfin)"]
    prev = f"c{res}"
    for r in range(res - 1, -1, -1):
        ctes.append(
            f"c{r} AS (SELECT cell >> 2 AS cell FROM {prev} "
            f"GROUP BY 1 HAVING COUNT(*) = 4)"
        )
        prev = f"c{r}"
    outs = []
    for r in range(res, 0, -1):
        outs.append(
            f"SELECT cell AS cell_id, {r} AS cell_res FROM c{r} "
            f"WHERE (cell >> 2) NOT IN (SELECT cell FROM c{r - 1})"
        )
    outs.append("SELECT cell AS cell_id, 0 AS cell_res FROM c0")
    return (
        LINEPOINTS_CTE.rstrip() + ",\n" + scale + ",\n" + hilbert_ctes("sc")
        + ",\n" + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(outs)
    )


def linepoints_hilbert_sql(limit: int = 1000) -> str:
    """Top-``limit`` linepoints rows in descending-Hilbert stored
    order (tiebreak pid asc) — the q_hilbert_scan oracle."""
    from geomedea_ray.pipelines.geo_queries import LINEPOINTS_CTE

    scale = (
        "q AS (SELECT pid, CAST(TRUNC(lng * 10000000.0) AS BIGINT) AS lng_i,\n"
        "             CAST(TRUNC(lat * 10000000.0) AS BIGINT) AS lat_i FROM pts),\n"
        "ext AS (SELECT MIN(lng_i) AS minx, MIN(lat_i) AS miny,\n"
        "               MAX(lng_i) AS maxx, MAX(lat_i) AS maxy FROM q),\n"
        "sc AS (SELECT pid,\n"
        "       ((lng_i - minx) * 65535) // GREATEST(maxx - minx, 1) AS x,\n"
        "       ((lat_i - miny) * 65535) // GREATEST(maxy - miny, 1) AS y\n"
        "       FROM q CROSS JOIN ext)"
    )
    return (
        LINEPOINTS_CTE.rstrip()
        + ",\n" + scale + ",\n" + hilbert_ctes("sc")
        + f"\nSELECT pid, hilbert FROM hfin ORDER BY hilbert DESC, pid LIMIT {limit}"
    )
