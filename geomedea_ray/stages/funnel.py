"""Ordered-sequence (funnel) matching over event logs — the product-
analytics class (Sessionize/Funnel in every events warehouse): for
each user, how far through an ordered step list did they get, using
EARLIEST-GREEDY semantics (step i+1 must be the first occurrence
strictly after the matched step i). Greedy-earliest is deliberately
chosen over maximal matching because it is deterministic AND
SQL-expressible as nested per-step MIN joins — the oracle reproduces
it exactly.

Scale shape: the event stream is projected to (user, ts, step) at the
read, co-sharded ONCE on the user hash, and each shard resolves all
its users vectorized (one boolean mask + groupby-min per step — steps
is a short constant list, never a per-user loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geomedea_ray.stages.joins import _resolve_shards, _shard_of

#: sentinel for "stage not reached" timestamps (oracle COALESCEs -1)
NOT_REACHED = -1


def funnel_match(
    ds,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_shards: int | None = None,
):
    """Per user that reached step 0: ``(user, stage, t_<step>…)`` with
    ``stage`` = number of steps matched and epoch-µs timestamps
    (NOT_REACHED where unmatched)."""
    assert len(steps) >= 2
    num_shards = _resolve_shards(ds, num_shards)
    tcols = [f"t_{s}" for s in steps]

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[type_col].isin(steps)]
        return pd.DataFrame({
            "u": df[user_col].to_numpy(),
            "ts": df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64),
            "st": df[type_col].to_numpy(),
            "_shard": _shard_of(df[user_col], num_shards),
        })

    def _funnel(df: pd.DataFrame) -> pd.DataFrame:
        cur = None  # Series user -> matched time of previous step
        reached = []
        for i, s in enumerate(steps):
            sub = df[df["st"] == s]
            if i > 0:
                prev = sub["u"].map(cur)
                sub = sub[sub["ts"] > prev]  # NaN prev compares False
            cur = sub.groupby("u")["ts"].min()
            reached.append(cur)
        users = reached[0].index
        out = pd.DataFrame({"u": users.to_numpy()})
        stage = np.ones(len(users), np.int64)
        for i, r in enumerate(reached):
            t = users.map(r)
            out[tcols[i]] = t.fillna(NOT_REACHED).to_numpy(np.int64)
            if i > 0:
                stage += np.asarray(t.notna(), dtype=np.int64)
        out.insert(1, "stage", stage)
        return out

    return (
        ds.map_batches(_prep, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_funnel, batch_format="pandas")
    )


def funnel_match_sql(
    source: str, user_col: str, ts_col: str, type_col: str, steps: list[str]
) -> str:
    """Nested-MIN mirror: s0 = first step-0 event per user; s{i} =
    first step-i event strictly after s{i-1}'s match."""
    ctes = [
        f"s0 AS (SELECT {user_col} AS u, MIN({ts_col}) AS t FROM {source} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS t "
            f"FROM {source} e JOIN s{i - 1} ON e.{user_col} = s{i - 1}.u "
            f"WHERE e.{type_col} = '{steps[i]}' AND e.{ts_col} > s{i - 1}.t "
            f"GROUP BY e.{user_col})"
        )
    stage = " + ".join(
        f"(CASE WHEN s{i}.u IS NULL THEN 0 ELSE 1 END)"
        for i in range(1, len(steps))
    )
    tsel = ",\n       ".join(
        [f"epoch_us(s0.t) AS t_{steps[0]}"]
        + [
            f"COALESCE(epoch_us(s{i}.t), {NOT_REACHED}) AS t_{steps[i]}"
            for i in range(1, len(steps))
        ]
    )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s{i}.u = s0.u" for i in range(1, len(steps))
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s0.u, CAST(1 + {stage} AS BIGINT) AS stage,\n       {tsel}"
        + f"\nFROM s0 {joins}"
    )
