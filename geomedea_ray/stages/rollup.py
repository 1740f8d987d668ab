"""Single-pass ROLLUP aggregation (hierarchical grouping sets).

Computing per-(k1,k2), per-(k1) and grand-total aggregates as three
separate jobs scans the corpus three times; the classic engine move
(Spark `rollup`, SQL `GROUP BY ROLLUP`) folds them into ONE pass:
every block emits its partial aggregate once per grouping LEVEL (key
suffix replaced by an ALL token), and one small grouped sum finishes.
The exchange moves (levels × block-local distinct keys) partial rows —
never the corpus. No reference counterpart (the reference has no
aggregation ops at all — SURVEY §2.5 gap family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: level marker — chosen printable so the SQL oracle can mirror it
#: with COALESCE/CASE instead of NULL group keys (NULL ordering and
#: hash behavior differ across engines)
ALL_TOKEN = "∑ALL"


def rollup_aggregate(ds, keys: list[str], sums: dict[str, str],
                     count_col: str = "n", all_token: str = ALL_TOKEN):
    """ROLLUP over ``keys`` (hierarchical prefixes: (k1..kn), (k1..
    kn-1), …, ()): per-block partials emitted once per level, ONE
    grouped sum. ``sums`` maps input column -> output column (int64
    sums); ``count_col`` is the per-group row count. Key columns must
    be strings (the ALL token replaces suppressed levels)."""
    sets = [tuple(keys[:lvl]) for lvl in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, sums, count_col, all_token)


def cube_aggregate(ds, keys: list[str], sums: dict[str, str],
                   count_col: str = "n", all_token: str = ALL_TOKEN):
    """CUBE over ``keys``: every key subset is a grouping set (2^n
    sets — n is 2-3 in practice). Same single-pass partial discipline
    as ROLLUP."""
    from itertools import combinations

    sets = [
        c for r in range(len(keys), -1, -1) for c in combinations(keys, r)
    ]
    return grouping_sets_aggregate(ds, keys, sets, sums, count_col, all_token)


def grouping_sets_aggregate(ds, keys: list[str], sets: list[tuple],
                            sums: dict[str, str], count_col: str = "n",
                            all_token: str = ALL_TOKEN):
    """GROUPING SETS over ``keys``: per-block partials emitted once per
    set (suppressed keys carry the ALL token), ONE grouped sum over the
    union stream — the corpus is scanned once however many sets are
    asked for."""
    from ray.data.aggregate import Sum

    scols = list(sums)
    sets = [tuple(s) for s in sets]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        g = df.groupby(keys, sort=False, dropna=False)
        base = g[scols].sum().reset_index() if scols else g.size().reset_index()[keys]
        base[count_col] = g.size().to_numpy()
        for s in sets:
            p = base.copy()
            for k in keys:
                if k not in s:
                    p[k] = all_token
            # re-collapse: suppressed keys merge block-local groups
            gg = p.groupby(keys, sort=False, as_index=False)[scols + [count_col]].sum()
            out.append(gg)
        return pd.concat(out, ignore_index=True)

    agg = [Sum(count_col, alias_name=count_col)] + [
        Sum(c, alias_name=c) for c in scols
    ]
    from geomedea_ray.stages.dedup import _coalesce_width

    partials = ds.map_batches(_partial, batch_format="pandas", batch_size=None)
    # kilobyte partial stream: coalesce before the sort-exchange
    # (per-block machinery cost — CLAUDE.md round-3 rule)
    out = partials.repartition(_coalesce_width()).groupby(keys).aggregate(*agg)

    def _rename(df: pd.DataFrame) -> pd.DataFrame:
        cols = {c: sums.get(c, c) for c in df.columns}
        return df.rename(columns=cols)

    return out.map_batches(_rename, batch_format="pandas", batch_size=None)
