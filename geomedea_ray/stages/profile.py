"""One-pass table profiling / data-quality validation — the
expectations layer every production ingest runs before training
(null fractions, ranges, domain cardinalities; Great-Expectations-
style checks, public pattern).

Shape: each block folds into ONE tiny partial row set (per-column
counters + min/max + the block's distinct value set for the declared
LOW-CARDINALITY categorical columns), a TREE combine finishes. The
distinct sets ride the combine as sorted value lists, so the operator
is exact — callers must only declare ``cat_cols`` whose cardinality
is domain-bounded (status codes, priorities, langs…); unbounded
columns belong in the HLL sketch (stages/sketch.hll_distinct)
instead.

Output is LONG form ``(column, metric, value: double)`` —
metrics: ``count, nulls, min, max`` (numeric) and
``count, nulls, distinct`` (categorical). Every value is exact in a
double (counts < 2^53; min/max are single untouched values), so the
UNION-ALL SQL mirror hash-matches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def profile_table(ds, num_cols: list[str], cat_cols: list[str]):
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in num_cols:
            s = df[c]
            nn = s.notna()
            rows.append((c, "count", float(len(s)), ""))
            rows.append((c, "nulls", float((~nn).sum()), ""))
            if nn.any():
                rows.append((c, "min", float(s[nn].min()), ""))
                rows.append((c, "max", float(s[nn].max()), ""))
        for c in cat_cols:
            s = df[c]
            nn = s.notna()
            rows.append((c, "count", float(len(s)), ""))
            rows.append((c, "nulls", float((~nn).sum()), ""))
            vals = sorted(set(s[nn].astype(str)))
            rows.append((c, "_set", 0.0, "\x1f".join(vals)))
        return pd.DataFrame(rows, columns=["column", "metric", "value", "vset"])

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (c, m), g in df.groupby(["column", "metric"], sort=True):
            if m in ("count", "nulls"):
                out.append((c, m, float(g["value"].sum()), ""))
            elif m == "min":
                out.append((c, m, float(g["value"].min()), ""))
            elif m == "max":
                out.append((c, m, float(g["value"].max()), ""))
            else:  # _set: union of block value sets
                vals = set()
                for v in g["vset"]:
                    if v:
                        vals.update(v.split("\x1f"))
                out.append((c, m, 0.0, "\x1f".join(sorted(vals))))
        return pd.DataFrame(out, columns=["column", "metric", "value", "vset"])

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = _combine(df)
        rows = []
        for _, r in df.iterrows():
            if r["metric"] == "_set":
                n = len(r["vset"].split("\x1f")) if r["vset"] else 0
                rows.append((r["column"], "distinct", float(n)))
            else:
                rows.append((r["column"], r["metric"], r["value"]))
        return pd.DataFrame(rows, columns=["column", "metric", "value"])

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_final, batch_format="pandas", batch_size=None)
    )


def profile_table_sql(source: str, num_cols: list[str], cat_cols: list[str]) -> str:
    parts = []
    for c in num_cols:
        parts += [
            f"SELECT '{c}' AS \"column\", 'count' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM {source}",
            f"SELECT '{c}', 'nulls', CAST(COUNT(*) - COUNT({c}) AS DOUBLE) FROM {source}",
            f"SELECT '{c}', 'min', CAST(MIN({c}) AS DOUBLE) FROM {source}",
            f"SELECT '{c}', 'max', CAST(MAX({c}) AS DOUBLE) FROM {source}",
        ]
    for c in cat_cols:
        parts += [
            f"SELECT '{c}', 'count', CAST(COUNT(*) AS DOUBLE) FROM {source}",
            f"SELECT '{c}', 'nulls', CAST(COUNT(*) - COUNT({c}) AS DOUBLE) FROM {source}",
            f"SELECT '{c}', 'distinct', CAST(COUNT(DISTINCT {c}) AS DOUBLE) FROM {source}",
        ]
    return "\nUNION ALL\n".join(parts)
