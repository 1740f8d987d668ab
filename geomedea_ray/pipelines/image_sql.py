"""DuckDB oracle SQL for the image/flagship queries (round-1 VERDICT
top item: flip the headline surface from rows-only to hash-verified).

Every statement opens with the ``img`` CTE reading the single-process
oracle fixture (sources/oracle_fixture.py — same deterministic row
formula as the distributed table, decoded/derived WITHOUT Ray). The
tile / dedup / raycast / token math on top is expressed independently
in SQL, mirroring the engine's float expression order term by term so
IEEE doubles round identically (same approach as
pipelines/geo_queries.py, which hash-passes with it).

The fixture's n (rows per sf) must match the distributed table:
``sql_for_sf`` resolves it via flagship.n_images_for. The driver gate
always runs at sf0.01; tools/check_correctness.py sets
``GEOMEDEA_SF_DIR`` so local runs at other sf stay comparable.
"""

from __future__ import annotations

from geomedea_ray.pipelines.flagship import (
    IMAGE_SIMILAR_IDS,
    THUMB_MAX_ID,
    n_images_for,
)
from geomedea_ray.sources.polygons import POLYGONS, raycast_sql

TILE_ZOOM = 6
MIN_TOKENS, MAX_TOKENS = 3, 64  # pipelines/prep.py bounds


def img_cte(n: int) -> str:
    from geomedea_ray.sources.oracle_fixture import oracle_images_path

    path = oracle_images_path(n)
    return f"WITH img AS (SELECT * FROM read_parquet('{path}'))\n"


def _tile_exprs() -> tuple[str, str]:
    n = float(1 << TILE_ZOOM)
    tx = f"CAST(FLOOR((lng + 180.0) / 360.0 * {n!r}) AS INT)"
    ty = f"CAST(FLOOR((90.0 - lat) / 180.0 * {n!r}) AS INT)"
    return tx, ty


def decode_stats_sql(n: int) -> str:
    return img_cte(n) + (
        "SELECT image_id, fmt, mean_px, std_px, phash_rt, phash_ok FROM img"
    )


def phash_dedup_sql(n: int) -> str:
    return img_cte(n) + (
        "SELECT MIN(image_id) AS image_id, phash FROM img GROUP BY phash"
    )


def phash_neardup_sql(n: int) -> str:
    from geomedea_ray.pipelines.flagship import PHASH_NEARDUP_MAX_HAMMING as TH

    return img_cte(n) + (
        ", d AS (SELECT MIN(image_id) AS image_id, phash FROM img GROUP BY phash)\n"
        "SELECT a.image_id AS id_a, b.image_id AS id_b,\n"
        "       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming\n"
        "FROM d a JOIN d b ON a.image_id < b.image_id\n"
        f"WHERE bit_count(xor(a.phash, b.phash)) <= {TH}"
    )


def brightness_quantiles_sql(n: int) -> str:
    from geomedea_ray.stages.sketch import quantiles_sql

    # quantiles_sql opens with its own WITH — wrap the fixture read as
    # a subquery source instead of the shared img CTE
    from geomedea_ray.sources.oracle_fixture import oracle_images_path

    src = f"(SELECT fmt, CAST(FLOOR(mean_px) AS BIGINT) AS px FROM read_parquet('{oracle_images_path(n)}'))"
    return quantiles_sql(src, by="fmt", val_expr="px", n_name="n_images")


def tile_counts_sql(n: int) -> str:
    tx, ty = _tile_exprs()
    return img_cte(n) + (
        f"SELECT {tx} AS tile_x, {ty} AS tile_y, COUNT(*) AS n\n"
        "FROM img GROUP BY 1, 2"
    )


def _pip_union(select_cols: str, from_clause: str, with_name: bool = True) -> str:
    """One SELECT per polygon, unioned — flat multi-match join
    semantics, identical to q_pip_join_sql's shape."""
    parts = []
    for pid, name, verts in POLYGONS:
        name_col = f", '{name}' AS poly_name" if with_name else ""
        parts.append(
            f"SELECT {select_cols}, {pid} AS poly_id{name_col} "
            f"{from_clause} WHERE {raycast_sql('lng', 'lat', verts)}"
        )
    return "\nUNION ALL\n".join(parts)


def spatial_join_tiles_sql(n: int) -> str:
    tx, ty = _tile_exprs()
    return (
        img_cte(n)
        + f", t AS (SELECT image_id, caption, lng, lat, {tx} AS tile_x, {ty} AS tile_y FROM img)\n"
        + _pip_union("image_id, caption, tile_x, tile_y", "FROM t")
    )


def thumbnails_sql(n: int) -> str:
    return img_cte(n) + (
        "SELECT image_id, CAST(p.pos AS BIGINT) AS block_idx,\n"
        "       thumb_q[CAST(p.pos AS INT) + 1] AS tq\n"
        "FROM img, (SELECT UNNEST(RANGE(0, 64)) AS pos) p\n"
        f"WHERE image_id < '{THUMB_MAX_ID}'"
    )


def tile_mosaic_sql(n: int) -> str:
    tx, ty = _tile_exprs()
    # CAST: DuckDB SUM(BIGINT) yields HUGEINT, which lands as float in
    # the compare frame and hash-mismatches the engine's int64
    sums = ",\n       ".join(
        f"CAST(SUM(thumb_q[{e + 1}]) AS BIGINT) AS ts{e:02d}" for e in range(64)
    )
    return img_cte(n) + (
        f"SELECT {tx} AS tile_x, {ty} AS tile_y, COUNT(*) AS n,\n"
        f"       {sums}\n"
        "FROM img GROUP BY 1, 2"
    )


def reencode_sql(n: int) -> str:
    return img_cte(n) + "SELECT image_id, fmt AS fmt_in, psnr_ok FROM img"


def training_prep_sql(n: int) -> str:
    tx, ty = _tile_exprs()
    tok = "len(list_filter(string_split(caption, ' '), x -> x <> ''))"
    return (
        img_cte(n)
        + f""", ok AS (SELECT * FROM img WHERE phash_ok),
d AS (SELECT MIN(image_id) AS kid FROM ok GROUP BY phash),
kept AS (SELECT i.* FROM ok i JOIN d ON i.image_id = d.kid),
q AS (SELECT *, {tok} AS n_tokens FROM kept
      WHERE {tok} BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}),
t AS (SELECT image_id, n_tokens, lng, lat, {tx} AS tile_x, {ty} AS tile_y FROM q)
"""
        + _pip_union("image_id, n_tokens, tile_x, tile_y", "FROM t", with_name=False)
    )


def image_similar_sql(n: int, k: int = 5) -> str:
    qsel = "\nUNION ALL\n".join(
        f"SELECT {qid} AS qid, thumb::DOUBLE[] AS qe FROM img "
        f"WHERE image_id = 'img-{qid:012d}'"
        for qid in IMAGE_SIMILAR_IDS
    )
    return (
        img_cte(n)
        + f""", q AS ({qsel}),
s AS (SELECT q.qid, i.image_id AS vec_id,
             ROUND(list_cosine_similarity(i.thumb::DOUBLE[], q.qe), 6) AS simr
      FROM img i CROSS JOIN q),
r AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY simr DESC, vec_id) AS "rank"
      FROM s)
SELECT qid, vec_id, "rank" FROM r WHERE "rank" <= {k}"""
    )


def dctphash_dedup_sql(n: int) -> str:
    # the fixture's dct_phash column is the single-process recompute of
    # the same decode → DCT → median-threshold kernel (differential)
    return img_cte(n) + (
        "SELECT MIN(image_id) AS image_id, dct_phash AS phash "
        "FROM img GROUP BY dct_phash"
    )


def pack_multimodal_sql(n: int) -> str:
    from geomedea_ray.pipelines.flagship import PACK_MM_BUDGET, PACK_MM_PATCH

    p = PACK_MM_PATCH
    return img_cte(n) + f""", t AS (
  SELECT image_id,
         CAST((w // {p}) * (h // {p})
              + len(list_filter(string_split(caption, ' '), x -> x <> ''))
              AS BIGINT) AS cost
  FROM img),
c AS (
  SELECT image_id, cost,
         CAST(COALESCE(SUM(cost) OVER (ORDER BY image_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum0
  FROM t)
SELECT image_id, cost,
       cum0 // {PACK_MM_BUDGET} AS seq_id,
       cum0 % {PACK_MM_BUDGET} AS seq_offset
FROM c"""


def image_oracle_sqls(sf_dir: str) -> dict[str, str]:
    """All image-surface oracle statements for one scale tag. Building
    them materializes the fixture parquet (cached, single-process)."""
    n = n_images_for(sf_dir)
    return {
        "image_decode_stats": decode_stats_sql(n),
        "image_phash_dedup": phash_dedup_sql(n),
        "image_phash_neardup": phash_neardup_sql(n),
        "image_brightness_quantiles": brightness_quantiles_sql(n),
        "image_tile_counts": tile_counts_sql(n),
        "image_tile_mosaic": tile_mosaic_sql(n),
        "image_spatial_join_tiles": spatial_join_tiles_sql(n),
        "image_thumbnails": thumbnails_sql(n),
        "image_augment": img_cte(n)
        + "SELECT image_id, aug_w, aug_h, aug_sum, c00, c11 FROM img",
        "image_reencode": reencode_sql(n),
        "training_prep": training_prep_sql(n),
        "image_similar": image_similar_sql(n),
        "image_pack_multimodal": pack_multimodal_sql(n),
        "image_dctphash_dedup": dctphash_dedup_sql(n),
    }
