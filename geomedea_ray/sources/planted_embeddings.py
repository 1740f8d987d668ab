"""Embeddings-with-planted-near-duplicates fixture (round-1 VERDICT
item 2: the sf0.01 embeddings table has NO pair above cosine 0.52, so
the near-dup gate query verified an empty result).

Derives a table from the testdata embeddings (read-only input) by
appending, for every PLANT_EVERY-th vector, a noisy copy
(relative noise 1e-2 → cosine ≈ 0.99995 to its source, far above the
0.95 gate threshold, while all non-planted pairs stay ≤ ~0.52 — no
threshold-boundary float ambiguity between numpy and DuckDB).
Deterministic: noise is seeded per source vec_id. The parquet is
written once (atomic rename) with a fixed-size-list embedding column
so operators can read the dim from the schema.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/geomedea_ray_cache"
PLANT_EVERY = 5
PLANT_ID_OFFSET = 1_000_000
NOISE_REL = 1e-2


def planted_embeddings_path(sf_dir: str, cache_root: str = CACHE_ROOT) -> str:
    """Materialize (or reuse) the planted table for this sf; returns
    the parquet path. Single-process (safe from oracle_sql())."""
    from geomedea_ray.sources.cache import cached_file

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, f"embeddings_planted_{tag}.parquet")

    # expected size from the id column alone (cheap cache-hit validation)
    src_ids = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"]
    )["vec_id"].to_numpy()
    expected = len(src_ids) + int((src_ids % PLANT_EVERY == 0).sum())

    def _build(tmp: str) -> None:
        src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
        ids = src["vec_id"].to_numpy()
        # zero-copy-ish flat view (uniform-length list column), no per-row
        # Python objects — same layout trick as stages/ann._emb_matrix
        emb = src["embedding"].combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float32)
        m = flat.reshape(len(emb), -1)
        dim = m.shape[1]

        sel = np.flatnonzero(ids % PLANT_EVERY == 0)
        copies = np.empty((len(sel), dim), np.float32)
        for j, i in enumerate(sel):
            rng = np.random.default_rng((20260817, int(ids[i])))
            v = m[i].astype(np.float64)
            scale = NOISE_REL * np.linalg.norm(v) / np.sqrt(dim)
            copies[j] = (v + scale * rng.standard_normal(dim)).astype(np.float32)

        all_ids = np.concatenate([ids, ids[sel] + PLANT_ID_OFFSET])
        all_m = np.concatenate([m, copies])
        table = pa.table(
            {
                "vec_id": pa.array(all_ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(all_m.reshape(-1), pa.float32()), dim
                ),
            }
        )
        pq.write_table(table, tmp, compression="zstd")

    return cached_file(out, _build, expected_rows=expected)


def neardup_sql(sf_dir: str, min_cosine: float = 0.95) -> str:
    """Exact all-pairs cosine oracle over the planted table."""
    path = planted_embeddings_path(sf_dir)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM read_parquet('{path}'))
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {min_cosine!r}
"""
