"""Sketch / summary operators for training-data pipelines: EXACT
distributed quantiles (histogram method) and HyperLogLog distinct
sketches (task brief "a novel sketch"; no reference counterpart —
SURVEY §2.5).

Both follow the partial-combine discipline: per-block partials are
bounded by GROUP/domain cardinality (never row count), coalesce into a
few blocks, and one tiny combine finishes — the only thing crossing
the wire is the summary, exactly the shape that survives 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_LEVELS = (0.25, 0.5, 0.75, 0.99)


def _level_col(q: float) -> str:
    return f"p{int(q * 100)}"


def exact_quantiles(ds, by: str, val_col: str, levels=DEFAULT_LEVELS,
                    n_name: str = "n"):
    """EXACT discrete quantiles of an integer-valued column, per
    group: the distributed histogram method. Per-block partial
    (by, val)→count frames, TREE combine, then one cumulative-count
    scan per group. Definition (mirrored term-for-term by
    ``quantiles_sql``): the quantile at level q is the smallest v with
    ``cum_count(v) >= ceil(q * n)``.

    Scale contract: the HISTOGRAM (groups × distinct values) must be
    driver-sized — true for any bounded discrete domain (token counts,
    quantized scores, byte sizes in buckets). Quantize unbounded
    floats first (e.g. ``floor``)."""

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([by, val_col], as_index=False).size().rename(columns={"size": "c"})
        )

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([by, val_col], as_index=False)["c"].sum()

    def _quantiles(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, grp in _combine(df).groupby(by):
            grp = grp.sort_values(val_col)
            v = grp[val_col].to_numpy(np.int64)
            cum = grp["c"].to_numpy(np.int64).cumsum()
            tot = int(cum[-1])
            row = {by: g, n_name: tot}
            for q in levels:
                rank = int(np.ceil(q * tot))
                row[_level_col(q)] = int(v[np.searchsorted(cum, rank)])
            rows.append(row)
        return pd.DataFrame(rows)

    return (
        ds.map_batches(_hist, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_quantiles, batch_format="pandas", batch_size=None)
    )


def quantiles_sql(source: str, by: str, val_expr: str, levels=DEFAULT_LEVELS,
                  n_name: str = "n") -> str:
    """DuckDB mirror of ``exact_quantiles``: cumulative-count window
    over the same histogram, same smallest-v-with-cum≥ceil(q·n)
    definition. ``source`` is a table name or a parenthesized
    subquery/CTE reference."""
    level_cols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum >= CEIL({q!r} * tot) THEN v END) AS BIGINT) AS {_level_col(q)}"
        for q in levels
    )
    return f"""
WITH src AS (SELECT {by} AS g, {val_expr} AS v FROM {source}),
h AS (SELECT g, v, COUNT(*) AS c FROM src GROUP BY 1, 2),
c AS (SELECT g, v,
             SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY g) AS tot
      FROM h)
SELECT g AS {by},
       CAST(MAX(tot) AS BIGINT) AS {n_name},
       {level_cols}
FROM c GROUP BY g
"""


# ------------------------------------------------------------------ HLL

#: 2^12 = 4096 registers/group → ~1.6% relative standard error
HLL_P = 12


def _hash64(series: pd.Series) -> np.ndarray:
    """Deterministic 64-bit value hash (siphash, fixed key) — same
    hasher family as functions/text.stable_hash64, applied to the
    native dtype (no str round-trip for integer keys)."""
    return pd.util.hash_pandas_object(
        series, index=False, hash_key="geomedea_ray_01!"
    ).to_numpy(np.uint64)


def _hll_registers(vals: pd.Series, p: int) -> np.ndarray:
    """Dense HLL register array (uint8[2^p]) for one group's values."""
    m = 1 << p
    bits = 64 - p
    h = _hash64(vals)
    idx = (h >> np.uint64(bits)).astype(np.int64)
    w = h & np.uint64((1 << bits) - 1)
    # bit length via frexp: exact for w < 2^53 (bits=52 at p=12)
    bl = np.frexp(w.astype(np.float64))[1]
    rank = np.where(w == 0, bits + 1, bits - bl + 1).astype(np.uint8)
    reg = np.zeros(m, np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Standard bias-corrected HLL estimate with the small-range
    linear-counting correction (Flajolet et al. 2007)."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct(ds, by: str, val_col: str, p: int = HLL_P):
    """Approximate ``COUNT(DISTINCT val_col)`` per group via
    HyperLogLog: per-block partial registers (one 2^p-byte row per
    group per block — independent of row count), element-wise-max
    combine per group, one estimate per group. Deterministic (siphash
    registers); the ±~1.6% error bound at p=12 is pytest-asserted.
    At 100 TB this ships kilobytes per block where COUNT(DISTINCT)
    ships every key through a shuffle."""
    m = 1 << p

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, grp in df.groupby(by):
            rows.append({by: g, "reg": _hll_registers(grp[val_col], p).tobytes()})
        return pd.DataFrame(rows)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        reg = np.zeros(m, np.uint8)
        for b in df["reg"]:
            np.maximum(reg, np.frombuffer(b, np.uint8), out=reg)
        return pd.DataFrame({by: [df[by].iloc[0]],
                             "n_distinct_hll": [hll_estimate(reg)]})

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(by)
        .map_groups(_merge, batch_format="pandas")
    )


def heavy_hitters(ds, col: str, num: int = 1, den: int = 100):
    """EXACT frequent items: every value of ``col`` whose count is
    >= (num/den) of the total row count — the Misra-Gries family done
    in two streaming passes so the answer is exact, not a sketch.

    Pass 1 (candidates): per-block value counts keep only values with
    ``m * local_count >= local_rows`` for m = 2*den/num.  If a value
    is kept in NO block then its global count < N/m < num*N/den, so
    the kept union is a GUARANTEED superset of the answer (the
    space-saving/MG frequency bound, vectorized per block) and is
    bounded by m values per block — the only thing collected.

    Pass 2 (recount): per-block exact counts of the broadcast
    candidates (plus a sentinel '' row carrying the block row count),
    one tiny grouped sum, then the exact integer threshold filter
    ``den * count >= num * N``.  The input streams twice; nothing
    row-sized ever shuffles.  Returns a pandas DataFrame (result is
    candidate-bounded by construction).
    """
    import ray
    from ray.data.aggregate import Sum

    from geomedea_ray.util import get_once

    m = max(2 * den // max(num, 1), den // max(num, 1) + 1)

    def _candidates(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts()
        keep = vc[m * vc >= len(df)]
        return pd.DataFrame({col: keep.index})

    cand = ds.map_batches(_candidates, batch_format="pandas")
    cand_set = frozenset(cand.to_pandas()[col])
    ref = ray.put(cand_set)

    def _recount(df: pd.DataFrame) -> pd.DataFrame:
        cs = get_once(ref)
        vc = df[col][df[col].isin(cs)].value_counts()
        return pd.DataFrame(
            {col: list(vc.index) + [""], "n": list(vc.to_numpy()) + [len(df)]}
        )

    combined = (
        ds.map_batches(_recount, batch_format="pandas")
        .groupby(col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(combined.loc[combined[col] == "", "n"].iloc[0])
    out = combined[(combined[col] != "") & (den * combined["n"] >= num * total)]
    out = out.sort_values(col).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out
