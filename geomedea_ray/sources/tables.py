"""Testdata table loaders + the SQL-mirrorable geo-point derivation.

The driver's correctness gate compares Ray pipelines against DuckDB SQL
over the same parquet views, so every derived column here is defined by
an expression that BOTH numpy and SQL evaluate bit-identically
(integer modular arithmetic + one exact double division/subtraction).

``doc_points``: deterministic world-wide point per ``documents`` row —
the engine's stand-in for a geocoded feature table at oracle time (the
image+caption table itself is not a registered DuckDB view, so
hash-compared spatial queries run over this instead; the image table
gets rows-only + pytest-oracle checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# lng = (doc_id * 7919 % 36000) / 100.0 - 180.0   in [-180, 179.99]
# lat = (doc_id * 104729 % 17000) / 100.0 - 85.0  in [-85, 84.99]
# 7919 ⊥ 36000 and 104729 ⊥ 17000 → long cycles, full coverage.
LNG_SQL = "(doc_id * 7919 % 36000) / 100.0 - 180.0"
LAT_SQL = "(doc_id * 104729 % 17000) / 100.0 - 85.0"


def doc_lnglat(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """numpy mirror of LNG_SQL/LAT_SQL (bit-identical doubles)."""
    d = np.asarray(doc_id, dtype=np.int64)
    lng = (d * 7919 % 36000) / 100.0 - 180.0
    lat = (d * 104729 % 17000) / 100.0 - 85.0
    return lng, lat


def path(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Column-pruned ray.data read of one testdata table."""
    import ray.data

    return ray.data.read_parquet(path(sf_dir, table), columns=columns)


def add_doc_points(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents batch → + lng/lat (float64)."""
    lng, lat = doc_lnglat(batch["doc_id"].to_numpy())
    return batch.append_column("lng", pa.array(lng, pa.float64())).append_column(
        "lat", pa.array(lat, pa.float64())
    )
