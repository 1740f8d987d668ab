"""Distributed PIVOT (long → wide): one output row per index key, one
column per distinct pivot value, cells aggregated (count / sum).

No reference counterpart (SURVEY §2.5 — the reference has no
relational surface); the Ray-Data-first shape is the same partial-
combine discipline as every aggregate here: each block folds its rows
into an already-WIDE partial frame (≤ |index| rows × |pivot| columns),
so the exchange moves kilobyte partials and the result never round-
trips through a row-per-(index,pivot) shuffle. Pivot values are either
supplied (SQL-oracle-stable column set) or discovered with a
distinct-keys pass (stages/joins.distinct_keys — per-block partial
uniques, tiny driver union).

Scale: |index| × |pivot| must fit one combine task — the wide-schema
contract every PIVOT engine shares (Spark caps pivot columns at 10k
for the same reason). Row count is unbounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pivot_counts(
    ds,
    index_col: str,
    pivot_col: str,
    values: list[str] | None = None,
    sum_col: str | None = None,
    prefix: str = "n_",
):
    """Wide per-``index_col`` row: ``{prefix}{v}`` count columns for
    each pivot value ``v`` (plus ``sum_{sum_col}_{v}`` when
    ``sum_col`` is given). Unlisted pivot values are dropped (matching
    SQL PIVOT ... IN (...) semantics); missing cells are 0."""
    if values is None:
        from geomedea_ray.stages.joins import distinct_keys

        values = sorted(str(v) for v in distinct_keys(ds, pivot_col))
    vals = list(values)
    cols = [f"{prefix}{v}" for v in vals]
    sums = [f"sum_{sum_col}_{v}" for v in vals] if sum_col else []

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {index_col: pd.Series([], dtype=df[index_col].dtype),
                 **{c: pd.Series([], dtype=np.int64) for c in cols + sums}}
            )
        # NOT pre-filtered to `vals`: a group whose rows all carry
        # unlisted pivot values still yields its zero row, matching
        # the CASE-WHEN SQL mirror (GROUP BY sees every row)
        ct = pd.crosstab(df[index_col], df[pivot_col]).reindex(
            columns=vals, fill_value=0
        )
        ct.columns = cols
        if sum_col:
            sm = df.pivot_table(index=index_col, columns=pivot_col,
                                values=sum_col, aggfunc="sum", fill_value=0)
            sm = sm.reindex(columns=vals, fill_value=0)
            sm.columns = sums
            ct = ct.join(sm, how="outer").fillna(0)
        out = ct.reset_index()
        for c in cols + sums:
            out[c] = out[c].astype(np.int64)
        return out

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(index_col, as_index=False)[cols + sums].sum()

    # wide partials are |index|-bounded kilobytes: TREE combine, no
    # sort-exchange (CLAUDE.md groupby-machinery rule)
    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
    )


def pivot_counts_sql(
    source: str,
    index_col: str,
    pivot_col: str,
    values: list[str],
    sum_col: str | None = None,
    prefix: str = "n_",
) -> str:
    """CASE-WHEN mirror of pivot_counts (portable ANSI shape rather
    than DuckDB's PIVOT extension, so column names match exactly)."""
    parts = [
        f"CAST(SUM(CASE WHEN {pivot_col} = '{v}' THEN 1 ELSE 0 END) AS BIGINT) AS {prefix}{v}"
        for v in values
    ]
    if sum_col:
        parts += [
            f"CAST(SUM(CASE WHEN {pivot_col} = '{v}' THEN {sum_col} ELSE 0 END) AS BIGINT) AS sum_{sum_col}_{v}"
            for v in values
        ]
    cols = ",\n       ".join(parts)
    return f"SELECT {index_col}, {cols} FROM {source} GROUP BY {index_col}"


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Wide → long (UNPIVOT): each row explodes into one row per
    value column. Stateless per-block ``pd.melt`` — embarrassingly
    parallel, no exchange at all; output is |value_cols|× the rows.
    Value columns must share a common (numeric) dtype, same contract
    as SQL UNPIVOT."""
    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_name, value_name=value_name)
        return out

    return ds.map_batches(_melt, batch_format="pandas")


def unpivot_sql(source: str, id_cols: list[str], value_cols: list[str],
                var_name: str = "variable", value_name: str = "value") -> str:
    ids = ", ".join(id_cols)
    selects = [
        f"SELECT {ids}, '{c}' AS {var_name}, {c} AS {value_name} FROM {source}"
        for c in value_cols
    ]
    return "\nUNION ALL\n".join(selects)
