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


US_PER_WEEK = 604_800_000_000


def cohort_retention(
    ds,
    key_col: str,
    ts_col: str,
    bucket_us: int = US_PER_WEEK,
    num_shards: int | None = None,
):
    """Cohort retention triangle: users grouped by their FIRST active
    bucket (the cohort), counted once per (cohort, offset) they were
    active in — the activation/retention matrix every growth dashboard
    draws. ONE key co-shuffle; each shard resolves its users fully
    vectorized (groupby-min for the cohort, drop_duplicates for the
    active set); the (cohort × offset) count domain is weeks², so the
    final combine is a TREE over kilobyte partials."""
    num_shards = _resolve_shards(ds, num_shards)

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = (df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
             // np.int64(bucket_us))
        return pd.DataFrame({"k": df[key_col].to_numpy(), "b": b,
                             "_shard": _shard_of(df[key_col], num_shards)})

    def _per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["k", "b"])
        first = df.groupby("k")["b"].transform("min")
        out = pd.DataFrame({"cohort": first, "off": df["b"] - first})
        return (out.groupby(["cohort", "off"], as_index=False).size()
                .rename(columns={"size": "n_users"}))

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cohort", "off"], as_index=False)["n_users"].sum()

    part = (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_per_user, batch_format="pandas")
    )
    out = (
        part.repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
    )

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        df["n_users"] = df["n_users"].astype(np.int64)
        return df

    return out.map_batches(_fin, batch_format="pandas")


def cohort_retention_sql(source: str, key_col: str, ts_col: str,
                         bucket_us: int = US_PER_WEEK) -> str:
    return f"""
WITH e AS (SELECT {key_col} AS k, epoch_us({ts_col}) // {bucket_us} AS b FROM {source}),
f AS (SELECT k, MIN(b) AS fw FROM e GROUP BY k),
a AS (SELECT DISTINCT e.k, f.fw AS cohort, e.b - f.fw AS off
      FROM e JOIN f ON e.k = f.k)
SELECT cohort, off, CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, off
"""
