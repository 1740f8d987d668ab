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
                  n_name: str = "n", cast_type: str = "BIGINT") -> str:
    """DuckDB mirror of ``exact_quantiles`` / ``quantile_select``:
    cumulative-count window over the same histogram, same
    smallest-v-with-cum≥ceil(q·n) definition. ``source`` is a table
    name or a parenthesized subquery/CTE reference; ``cast_type`` is
    BIGINT for integer domains, DOUBLE for continuous ones."""
    level_cols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum >= CEIL({q!r} * tot) THEN v END) AS {cast_type}) AS {_level_col(q)}"
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
    candidates (plus a None-keyed row carrying the block row count),
    combined by a two-level TREE (repartition + pandas grouped sum —
    each partial block holds <= |candidates|+1 rows, so the final
    single-task input is fan x candidates rows regardless of dataset
    size; a groupby sort-exchange on these kilobyte partials measured
    ~4 s of pure machinery at sf0.01), then the exact integer
    threshold filter ``den * count >= num * N``.  The input streams
    twice; nothing row-sized ever shuffles.  Returns a pandas
    DataFrame (result is candidate-bounded by construction).
    """
    import ray

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
        # block row count rides as a None-keyed row (groupby with
        # dropna=False keeps it); a genuine '' value in col is a legal
        # candidate and must NOT merge with the count sentinel
        cs = get_once(ref)
        vc = df[col][df[col].isin(cs)].value_counts()
        return pd.DataFrame(
            {col: list(vc.index) + [None], "n": list(vc.to_numpy()) + [len(df)]}
        )

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(col, as_index=False, dropna=False)["n"].sum()

    combined = (
        ds.map_batches(_recount, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    total = int(combined.loc[combined[col].isna(), "n"].iloc[0])
    out = combined[combined[col].notna()
                   & (den * combined["n"] >= num * total)]
    out = out.sort_values(col).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


# ------------------------------------------------- radix selection

def _ordered_u64(x: np.ndarray) -> np.ndarray:
    """IEEE-754 monotone bijection float64 -> uint64 (negative floats
    bit-flip, non-negatives set the sign bit) — total order preserved,
    so quantile selection can run on integer prefixes."""
    u = np.ascontiguousarray(x, np.float64).view(np.uint64)
    return np.where(u >> np.uint64(63) == 1, ~u, u | np.uint64(1 << 63))


def _unordered_f64(u: np.ndarray) -> np.ndarray:
    b = np.where(u >> np.uint64(63) == 1, u ^ np.uint64(1 << 63), ~u)
    return np.ascontiguousarray(b, np.uint64).view(np.float64)


def quantile_select(ds, by: str, val_col: str, levels=DEFAULT_LEVELS,
                    n_name: str = "n", bits: int = 16):
    """EXACT distributed quantiles for CONTINUOUS (float64) domains —
    where exact_quantiles' value histogram would be row-sized.

    Distributed radix selection: 64/bits counting rounds; each round
    every block emits counts of the next ``bits``-bit digit of the
    IEEE-ordered integer, restricted to the (group, prefix) windows
    still in play, and the driver narrows each quantile's prefix by
    rank.  After the last round the prefix IS the answer's bit
    pattern — no raw value is ever collected.  Every exchange is
    count-bounded (≤ active-windows × 2^bits nonzero rows per block,
    keys-not-rows); the input streams once per round with only
    (by, val) columns read.  Same smallest-v-with-cum≥ceil(q·n) rank
    definition as exact_quantiles, mirrored by ``quantiles_sql``
    (cast_type='DOUBLE').  Rows with NaN/null values are excluded.

    Digits ship as (parent-prefix, digit) pairs: the full prefix at
    the last round needs all 64 bits and would overflow the int64
    block column (sign-extended shifts then never match), while the
    parent stays < 2^(64-bits)."""
    import ray

    from geomedea_ray.util import get_once

    rounds = (64 + bits - 1) // bits
    dmask = np.uint64((1 << bits) - 1)

    def _clean(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        return pd.DataFrame({"g": df[by].to_numpy()[ok],
                             "u": _ordered_u64(v[ok])})

    cleaned = ds.map_batches(_clean, batch_format="pandas")
    empty = {
        "g": pd.Series([], dtype=object),
        "p": pd.Series([], dtype=np.int64),
        "dd": pd.Series([], dtype=np.int64),
        "c": pd.Series([], dtype=np.int64),
    }

    # state: group -> {"n": total, "targets": {prefix(py int): [(level, residual_rank)]}}
    state: dict = {}
    for r in range(rounds):
        shift = np.uint64(64 - bits * (r + 1))
        pshift = np.uint64(64 - bits * r)
        if r == 0:
            def _count(df: pd.DataFrame, _shift=shift) -> pd.DataFrame:
                dd = ((df["u"] >> _shift) & dmask).astype(np.int64)
                out = (
                    pd.DataFrame({"g": df["g"], "p": np.int64(0), "dd": dd})
                    .groupby(["g", "p", "dd"], sort=False).size().reset_index()
                )
                out.columns = ["g", "p", "dd", "c"]
                return out
        else:
            active = {(g, p) for g, st in state.items() for p in st["targets"]}
            ref = ray.put(frozenset(active))

            def _count(df: pd.DataFrame, _shift=shift, _pshift=pshift,
                       _ref=ref) -> pd.DataFrame:
                act = get_once(_ref)
                parent = (df["u"] >> _pshift).astype(np.int64)
                keys = pd.Series(list(zip(df["g"], parent)))
                m = keys.isin(act).to_numpy()
                if not m.any():
                    # dtyped empty — an untyped {} frame arrives float64
                    # and poisons the aggregate's schema union
                    return pd.DataFrame(empty)
                u = df["u"].to_numpy()[m]
                sub = pd.DataFrame(
                    {"g": df["g"].to_numpy()[m],
                     "p": parent.to_numpy()[m],
                     "dd": ((u >> _shift) & dmask).astype(np.int64)}
                )
                out = sub.groupby(["g", "p", "dd"], sort=False).size().reset_index()
                out.columns = ["g", "p", "dd", "c"]
                return out

        def _merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["g", "p", "dd"], as_index=False)["c"].sum()

        # digit-count partials are kilobytes: a groupby sort-exchange
        # per round costs seconds of pure machinery (CLAUDE.md rule);
        # TREE-combine in a couple of blocks and finish on the driver
        counts = (
            cleaned.map_batches(_count, batch_format="pandas")
            .repartition(2)
            .map_batches(_merge, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        counts = (
            counts.groupby(["g", "p", "dd"], as_index=False)["c"].sum()
            .sort_values(["g", "p", "dd"])
            .reset_index(drop=True)
        )
        new_state: dict = {}
        if r == 0:
            for g, grp in counts.groupby("g", sort=False):
                n = int(grp["c"].sum())
                if n == 0:
                    continue
                targets: dict[int, list] = {}
                cum = grp["c"].cumsum().to_numpy()
                digs = grp["dd"].to_numpy()
                for q in levels:
                    rank = max(int(np.ceil(q * n)), 1)
                    j = int(np.searchsorted(cum, rank))
                    before = int(cum[j - 1]) if j else 0
                    targets.setdefault(int(digs[j]), []).append((q, rank - before))
                new_state[g] = {"n": n, "targets": targets}
        else:
            for g, st in state.items():
                grp = counts[counts["g"] == g]
                targets = {}
                for p, lv in st["targets"].items():
                    sub = grp[grp["p"] == p]
                    cum = sub["c"].cumsum().to_numpy()
                    digs = sub["dd"].to_numpy()
                    for q, rank in lv:
                        j = int(np.searchsorted(cum, rank))
                        before = int(cum[j - 1]) if j else 0
                        pref = (p << bits) | int(digs[j])
                        targets.setdefault(pref, []).append((q, rank - before))
                new_state[g] = {"n": st["n"], "targets": targets}
        state = new_state

    rows = []
    for g, st in sorted(state.items()):
        row = {by: g, n_name: st["n"]}
        for p, lv in st["targets"].items():
            val = float(_unordered_f64(np.array([p], np.uint64))[0])
            for q, _ in lv:
                row[_level_col(q)] = val
        rows.append(row)
    cols = [by, n_name] + [_level_col(q) for q in levels]
    return pd.DataFrame(rows)[cols]


# ------------------------------------------------- count-min sketch

def cms_build(ds, col: str, width: int = 2048, depth: int = 4):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over ``col`` —
    the mergeable point-frequency sketch for when exact heavy_hitters'
    candidate pass is too wide (e.g. per-key counts consumed by a
    downstream scorer rather than a threshold filter).

    Per block: one (depth, width) int64 counter matrix (vectorized
    np.add.at over double-hashed rows); matrices SUM-combine (TREE),
    so the exchange carries depth×width×8 bytes per block regardless
    of row count. Estimate = min over rows; guaranteed to
    OVERESTIMATE by at most ceil(e/width · N) with prob 1-exp(-depth)
    and never underestimate."""
    import pandas as pd

    from geomedea_ray.stages.bloom import _key_hash, _splitmix64

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.zeros((depth, width), np.int64)
        if len(df):
            h1 = _key_hash(df[col])
            h2 = _splitmix64(h1) | np.uint64(1)
            for d in range(depth):
                idx = ((h1 + np.uint64(d) * h2) % np.uint64(width)).astype(np.int64)
                np.add.at(m[d], idx, 1)
        return pd.DataFrame({"m": [m.tobytes()]})

    def _comb(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(depth * width, np.int64)
        for b in df["m"]:
            acc += np.frombuffer(b, np.int64)
        return pd.DataFrame({"m": [acc.tobytes()]})

    rows = (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_comb, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_comb, batch_format="pandas", batch_size=None)
        .take(1)
    )
    return CountMinSketch(
        np.frombuffer(rows[0]["m"], np.int64).reshape(depth, width).copy())


class CountMinSketch:
    __slots__ = ("m",)

    def __init__(self, m: np.ndarray):
        self.m = m

    def estimate(self, values) -> np.ndarray:
        """Vectorized point estimates (int64[n])."""
        import pandas as pd

        from geomedea_ray.stages.bloom import _key_hash, _splitmix64

        depth, width = self.m.shape
        h1 = _key_hash(pd.Series(values))
        h2 = _splitmix64(h1) | np.uint64(1)
        est = np.full(len(h1), np.iinfo(np.int64).max)
        for d in range(depth):
            idx = ((h1 + np.uint64(d) * h2) % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, self.m[d, idx])
        return est


# ------------------------------------------------- KLL quantile sketch

#: compactor width — rank error is O(1/k); k=200 measures < 1% in tests
KLL_K = 200


class KLLSketch:
    """Mergeable quantile sketch (the KLL/MRL compactor scheme —
    Karnin-Lang-Liberty 2016, public algorithm), DETERMINISTIC: the
    compaction offset alternates with a per-level compaction counter
    instead of a coin flip, so identical input yields identical bytes
    and the rerun gate can hash it. Level i items carry weight 2^i;
    a full level sorts and keeps alternating elements, pushing them
    one level up. ~k·log(n/k) floats of state regardless of n — the
    scale path for quantiles over UNBOUNDED domains (the exact
    histogram/radix operators need bounded or re-scannable ones)."""

    def __init__(self, k: int = KLL_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.flips: list[int] = [0]

    def _cap(self, h: int) -> int:
        # geometrically shrinking capacities, floor of 8
        depth = len(self.levels)
        return max(int(self.k * (2.0 / 3.0) ** (depth - 1 - h)), 8)

    def add(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._cap(h) * 2:
                buf = np.sort(self.levels[h], kind="mergesort")
                off = self.flips[h] & 1
                self.flips[h] += 1
                kept = buf[off::2]
                self.levels[h] = np.empty(0, np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                    self.flips.append(0)
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], kept])
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.flips.append(0)
        for h, lv in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], lv])
            self.flips[h] += other.flips[h]
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        vals, ws = [], []
        for h, lv in enumerate(self.levels):
            vals.append(lv)
            ws.append(np.full(len(lv), 1 << h, np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1] if len(cw) else 0
        out = np.empty(len(qs), np.float64)
        for i, q in enumerate(qs):
            target = q * total
            out[i] = v[min(np.searchsorted(cw, target, side="left"),
                           len(v) - 1)] if len(v) else np.nan
        return out

    # ---- byte serialization (partials travel as one cell per block)
    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<i", len(self.levels))
        parts = [head]
        for lv, fl in zip(self.levels, self.flips):
            parts.append(struct.pack("<ii", len(lv), fl))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes, k: int = KLL_K) -> "KLLSketch":
        import struct

        s = cls(k)
        (n_levels,) = struct.unpack_from("<i", b, 0)
        off = 4
        s.levels, s.flips = [], []
        for _ in range(n_levels):
            n, fl = struct.unpack_from("<ii", b, off)
            off += 8
            s.levels.append(np.frombuffer(b, np.float64, n, off).copy())
            s.flips.append(fl)
            off += 8 * n
        return s


def kll_quantiles(ds, col: str, qs, k: int = KLL_K):
    """Distributed quantiles via the KLL sketch: one sketch per block
    (kilobytes, independent of rows), partials merged in ONE final
    task in a DETERMINISTIC order (sorted by each partial's content
    key — KLL merge is not commutative, so arrival order must not
    leak into the result). Returns a one-row Dataset with one column
    per requested quantile. Approximate by design: rank error O(1/k),
    pytest-measured; exact quantiles stay the job of the histogram /
    radix-selection operators on bounded domains."""
    import hashlib

    import pandas as pd

    qs = list(qs)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k).add(df[col].to_numpy(np.float64))
        b = sk.to_bytes()
        key = hashlib.sha256(b).hexdigest()
        return pd.DataFrame({"_key": [key], "sk": [b]})

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_key", kind="mergesort")
        acc = KLLSketch(k)
        for b in df["sk"]:
            acc.merge(KLLSketch.from_bytes(b, k))
        vals = acc.quantiles(qs)
        return pd.DataFrame({f"q{int(q * 100):02d}": [float(v)]
                             for q, v in zip(qs, vals)})

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(_final, batch_format="pandas", batch_size=None)
    )
