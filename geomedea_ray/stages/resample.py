"""Time-series densification (gap-filled resampling): per-key counts
for EVERY fixed-width bucket in the global time range, zeros included —
the "resample + fill" step every activity/retention pipeline needs
before windowed models see the data (missing hours must be explicit
zeros, not absent rows).

Shape: one cheap min/max pass pins the global bucket range (two int64s
to the driver); the event stream then co-shuffles ONCE on the key hash,
and each shard densifies its keys vectorized (MultiIndex reindex —
keys_in_shard × buckets rows, never a Python loop). The bucket range
rides into the shard fn by closure (it is two integers, not data).

Scale: output is |keys| × |buckets| BY DEFINITION — the operator's
contract is the same as SQL's ``keys CROSS JOIN buckets``; callers
bound the bucket width accordingly (hourly over a month = 720).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geomedea_ray.stages.joins import _resolve_shards, _shard_of

US_PER_HOUR = 3_600_000_000


def densify_counts(
    ds,
    key_col: str,
    ts_col: str,
    bucket_us: int = US_PER_HOUR,
    num_shards: int | None = None,
):
    """(key, bucket, n) for every key with ≥1 event × every bucket in
    the global [min, max] bucket range; ``bucket`` = epoch-µs // width
    (matching SQL ``epoch_us(ts) // width`` exactly)."""
    num_shards = _resolve_shards(ds, num_shards)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = (df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
             // np.int64(bucket_us))
        return pd.DataFrame({"k": df[key_col].to_numpy(), "b": b})

    def _minmax(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [df["b"].min()], "hi": [df["b"].max()]})

    bk = ds.map_batches(_bucket, batch_format="pandas")
    lims = bk.map_batches(_minmax, batch_format="pandas").to_pandas()
    lo, hi = int(lims["lo"].min()), int(lims["hi"].max())
    buckets = np.arange(lo, hi + 1, dtype=np.int64)

    def _shardit(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_shard=_shard_of(df["k"], num_shards))

    def _densify(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby(["k", "b"]).size()
        keys = df["k"].unique()
        dense = counts.reindex(
            pd.MultiIndex.from_product([keys, buckets], names=["k", "b"]),
            fill_value=0,
        ).reset_index(name="n")
        dense["n"] = dense["n"].astype(np.int64)
        return dense

    return (
        bk.map_batches(_shardit, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_densify, batch_format="pandas")
    )


def densify_counts_sql(source: str, key_col: str, ts_col: str,
                       bucket_us: int = US_PER_HOUR) -> str:
    return f"""
WITH e AS (SELECT {key_col} AS k, epoch_us({ts_col}) // {bucket_us} AS b FROM {source}),
lims AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM e),
buckets AS (SELECT UNNEST(range((SELECT lo FROM lims), (SELECT hi FROM lims) + 1)) AS b),
u AS (SELECT DISTINCT k FROM e),
c AS (SELECT k, b, COUNT(*) AS n FROM e GROUP BY k, b)
SELECT u.k, buckets.b, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM u CROSS JOIN buckets
LEFT JOIN c ON c.k = u.k AND c.b = buckets.b
"""
