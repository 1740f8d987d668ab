"""Deduplication operators for training-data pipelines (task brief;
no reference counterpart — SURVEY §2.5).

- ``dedup_exact``: hash-partitioned exact dedup — add a stable
  content key in ``map_batches``, then keep the row with the minimum
  order column per key. One hash shuffle on the key.
- ``minhash_lsh_pairs``: MinHash + banded LSH near-dup candidates —
  shingle→signature per batch, explode to (band, band_hash) rows,
  bucket groupby, emit verified pairs (exact Jaccard ≥ threshold).
- ``simhash_pairs``: 64-bit SimHash grouped by 16-bit bands; pairs
  within Hamming radius.
- ``embedding_neardup_pairs``: cosine near-dup via LSH buckets +
  exact verification inside each bucket.
- ``phash_dedup``: exact image dedup on the perceptual-hash column
  (the image+caption table's built-in content key).

Scale pattern — SHARDED group processing: Ray's
``groupby(key).map_groups(fn)`` invokes a Python callback per
DISTINCT KEY; for LSH buckets that's ~rows×bands tiny groups (measured
45 s of pure callback overhead on 80k buckets at sf0.1). Instead we
shuffle on ``_shard = stable_hash(key) % num_shards`` (hundreds of
groups, sized for worker heaps) and resolve the real keys INSIDE the
shard with vectorized numpy run-detection over a sorted frame. Shard
count is the scale knob: at 10^12 rows pick
``total_rows × bands / target_rows_per_shard``.

All emit deterministic results: pair output is canonicalized
(id_a < id_b) and derived solely from stable hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.functions import text as T
from geomedea_ray.functions.codecs import hamming64
from geomedea_ray.util import auto_pool, auto_shards, size_hint


def _resolve_shards(ds, num_shards: int | None) -> int:
    """Explicit count wins; otherwise derive from cluster CPUs and the
    (metadata-inferred) input size — see util.auto_shards."""
    return num_shards if num_shards else auto_shards(size_hint(ds))


def _runs(*keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of equal-key runs in already-sorted parallel
    key arrays (vectorized group detection)."""
    n = len(keys[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        change |= k[1:] != k[:-1]
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [n]])
    return starts, ends


#: pair generation inside an LSH bucket is O(|bucket|²); one degenerate
#: bucket (e.g. thousands of identical/empty docs sharing every band)
#: would make its shard quadratic. Buckets above this cap are SKIPPED
#: with an explicit log — a bucket this saturated means the band carries
#: no discriminating information (run exact dedup first for mass-dup
#: corpora). The cap is a parameter on every pair operator.
DEFAULT_MAX_BUCKET = 4096


def _bucket_pairs_df(df: pd.DataFrame, key_cols: list[str], id_col: str,
                     extra: dict | None = None,
                     max_bucket: int | None = DEFAULT_MAX_BUCKET) -> pd.DataFrame:
    """All canonical (id_a < id_b) pairs within each distinct key of a
    shard. Sort once; only buckets with ≥2 members do any work."""
    df = df.sort_values(key_cols + [id_col], kind="mergesort")
    starts, ends = _runs(*(df[c].to_numpy() for c in key_cols))
    ids = df[id_col].to_numpy()
    lens = ends - starts
    hot = np.flatnonzero(lens >= 2)
    if max_bucket is not None:
        over = hot[lens[hot] > max_bucket]
        if len(over):
            print(
                f"[dedup] skipped {len(over)} oversized LSH bucket(s) "
                f"(sizes {lens[over].tolist()[:5]}{'…' if len(over) > 5 else ''} "
                f"> cap {max_bucket}); rows dropped from pairing: {int(lens[over].sum())}"
            )
        hot = hot[lens[hot] <= max_bucket]
    out_a, out_b, out_extra = [], [], {k: [] for k in (extra or {})}
    for j in hot:
        s, e = starts[j], ends[j]
        ia, ib = np.triu_indices(e - s, k=1)
        out_a.append(ids[s:e][ia])
        out_b.append(ids[s:e][ib])
        for name, col in (extra or {}).items():
            vals = df[col].to_numpy()[s:e]
            out_extra[name].append((vals[ia], vals[ib]))
    if not out_a:
        cols = {"id_a": pd.Series([], dtype=ids.dtype), "id_b": pd.Series([], dtype=ids.dtype)}
        return pd.DataFrame(cols)
    res = {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
    for name in out_extra:
        res[f"{name}_a"] = np.concatenate([x[0] for x in out_extra[name]])
        res[f"{name}_b"] = np.concatenate([x[1] for x in out_extra[name]])
    return pd.DataFrame(res)


def _coalesce_width() -> int:
    """Block count for coalescing a small exploded/partial stream
    ahead of a hash-shard groupby: the sort-exchange cost is per-BLOCK
    (CLAUDE.md round-3 rule), so a candidate stream spread over the
    input's read parallelism pays 2-4× the shuffle machinery it needs.
    CPU-derived so bigger clusters keep enough blocks for their reduce
    width; these streams are pair/band-bounded — orders of magnitude
    smaller than the corpus — so ~8-block granularity stays well under
    worker heaps (a 64 MB exploded stream → 8 MB blocks). Measured on
    simhash bands at sf0.1: 2.4 s → 1.1 s."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, cpus // 4)


def _pair_shard(id_a, id_b, num_shards: int) -> np.ndarray:
    return (
        T.stable_hash64([f"{a}|{b}" for a, b in zip(id_a, id_b)]) % np.uint64(num_shards)
    ).astype(np.int64)


def _dedup_pairs(pairs, num_shards: int):
    """Global pair dedup: per-block partial drop_duplicates, coalesce
    the (small) partial stream, then shard on hash(id_a,id_b) so
    duplicates of a pair co-locate and one vectorized drop_duplicates
    per shard finishes — the same partial+coalesce shape as
    dedup_exact (the sort-exchange machinery cost is per-block)."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["id_a", "id_b"])
        if len(df) == 0:
            return df.assign(_shard=pd.Series([], dtype=np.int64))
        return df.assign(_shard=_pair_shard(df["id_a"], df["id_b"], num_shards))

    def _drop(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"]).drop(columns="_shard")

    return (
        pairs.map_batches(_partial, batch_format="pandas", batch_size=None)
        .repartition(_coalesce_width())
        .groupby("_shard")
        .map_groups(_drop, batch_format="pandas")
    )


# ---------------------------------------------------------------- exact

def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fp = T.fingerprint64(batch[text_col].to_pylist())
    return batch.append_column("fp64", pa.array(fp, pa.int64()))


def dedup_exact(ds, key_col: str, order_col: str, num_shards: int | None = None):
    """Keep, per distinct ``key_col`` value, the row with the smallest
    ``order_col``.

    Map-side PARTIAL first ("keep min per key" is associative): each
    block collapses to one candidate row per block-local distinct key
    BEFORE the exchange, so the shuffle moves ~keys×blocks rows, not
    every input row — the same tree-combine insight as
    pipelines/tiles.tile_aggregate (round-2 VERDICT item 4: the
    full-row sort-exchange made phash dedup the slowest non-deliberate
    bench entry). The partial stream is then COALESCED into a few
    large blocks (the sort-exchange pays a per-block machinery cost —
    measured 2.7 s → 1.4 s at sf0.1 just from 16 kilobyte-sized blocks
    → 8), and ONE hash shuffle on ``_shard`` (not the raw key — see
    module docstring) resolves survivors vectorized per shard. Unlike
    a tree-to-one combine this stays correct at ANY key cardinality:
    the reduce side is ``num_shards`` wide, never a single task."""
    import ray

    num_shards = _resolve_shards(ds, num_shards)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    hint = size_hint(ds)
    # blocks for the coalesced partial stream: few enough that the
    # sort machinery is cheap, many enough that ~256 MB-of-input-sized
    # chunks of partials never concentrate in one block
    coalesce = max(8, cpus // 4, (hint or 0) // (256 << 20))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = (
            df.sort_values([key_col, order_col], kind="mergesort")
            .drop_duplicates(key_col)
        )
        key = df[key_col]
        if np.issubdtype(key.dtype, np.integer):
            shard = (key.to_numpy().astype(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        else:
            shard = (T.stable_hash64(key.astype(str)) % np.uint64(num_shards)).astype(np.int64)
        return df.assign(_shard=shard)

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([key_col, order_col], kind="mergesort")
            .drop_duplicates(key_col)
            .drop(columns="_shard")
        )

    return (
        ds.map_batches(_partial, batch_format="pandas", batch_size=None)
        .repartition(coalesce)
        .groupby("_shard")
        .map_groups(_first, batch_format="pandas")
    )


def phash_dedup(ds, order_col: str = "image_id"):
    """Exact image dedup on the phash column (SURVEY §7.2 step 8)."""
    return dedup_exact(ds, "phash", order_col)


# ------------------------------------------------------------- minhash

class MinHashStage:
    """Actor: computes MinHash signatures + band hashes per batch.
    Permutation tables built once per actor in __init__."""

    def __init__(self, num_perm: int, num_bands: int, shingle_k: int, text_col: str,
                 id_col: str, num_shards: int):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.num_shards = num_shards
        # warm the permutation cache once per actor
        T.minhash_signature([""], num_perm=num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sig = T.minhash_signature(texts, num_perm=self.num_perm, shingle_k=self.shingle_k)
        bands = T.minhash_bands(sig, self.num_bands)
        n = len(texts)
        ids = np.repeat(batch[self.id_col].to_numpy(zero_copy_only=False), self.num_bands)
        band_idx = np.tile(np.arange(self.num_bands, dtype=np.int64), n)
        band_hash = bands.reshape(-1).astype(np.int64)
        with np.errstate(over="ignore"):
            shard = (
                (band_hash.astype(np.uint64) ^ (band_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
                % np.uint64(self.num_shards)
            ).astype(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "band": pa.array(band_idx, pa.int64()),
                "band_hash": pa.array(band_hash, pa.int64()),
                "_shard": pa.array(shard, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float | None = None,
    texts_by_id: dict | None = None,
    num_shards: int | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
):
    """Candidate near-dup pairs via banded MinHash-LSH.

    Stage 1 (map): signature + explode to (band, band_hash, id) — the
    stream is num_bands× the input row count but only 4 small columns.
    Stage 2 (shuffle): groupby shard of (band, band_hash); buckets are
    resolved vectorized inside each shard. Pairs are globally deduped
    by a sharded second pass. ``verify_threshold`` (needs
    ``texts_by_id`` broadcast via ``ray.put``) filters candidates by
    exact shingle Jaccard.
    """
    from geomedea_ray.util import cached_instance

    num_shards = _resolve_shards(ds, num_shards)
    params = (num_perm, num_bands, shingle_k, text_col, id_col, num_shards)

    def _minhash(batch):
        # task fn + per-process cached stage instance: fuses with the
        # read (no plasma round-trip, no pool spawn); the permutation
        # cache still builds once per worker process
        inst = cached_instance(
            ("dedup.MinHashStage",) + params,
            lambda: MinHashStage(num_perm, num_bands, shingle_k, text_col,
                                 id_col, num_shards),
        )
        return inst(batch)

    exploded = ds.map_batches(
        _minhash, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )

    def _shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return _bucket_pairs_df(df, ["band", "band_hash"], id_col, max_bucket=max_bucket)

    pairs = (exploded.repartition(_coalesce_width())
             .groupby("_shard").map_groups(_shard_pairs, batch_format="pandas"))
    uniq = _dedup_pairs(pairs, num_shards)

    if verify_threshold is not None and texts_by_id is not None:
        import ray

        from geomedea_ray.util import get_once

        ref = ray.put(texts_by_id)
        thr = float(verify_threshold)
        kk = shingle_k

        def _verify(batch: pd.DataFrame) -> pd.DataFrame:
            # task fn + per-process memoized broadcast fetch (get_once)
            # instead of an actor pool: the candidate stream is tiny
            # and pool spawn latency dwarfs the verification work; the
            # broadcast still ships once per worker process
            if len(batch) == 0:
                return batch
            texts = get_once(ref)
            keep = [
                T.jaccard_words(texts[a], texts[b], kk) >= thr
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            return batch[np.array(keep, bool)]

        uniq = uniq.map_batches(_verify, batch_format="pandas", batch_size=4096)
    return uniq


# ------------------------------------------------------------- simhash

def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = T.simhash64(batch[text_col].to_pylist())
    return batch.append_column("simhash", pa.array(h, pa.int64()))


def hamming_band_pairs(ds, hash_col: str, id_col: str,
                       max_hamming: int | None = None,
                       num_tables: int = 4, num_shards: int | None = None,
                       max_bucket: int | None = DEFAULT_MAX_BUCKET):
    """Near-dup pairs over ANY 64-bit hash column (SimHash, perceptual
    image hash, …): band the hash into ``num_tables`` keys of
    64/num_tables bits each; any pair with Hamming < num_tables shares
    at least one band EXACTLY (pigeonhole) — so ``max_hamming <=
    num_tables - 1`` makes the candidate set complete and the output
    the exact ≤-max_hamming pair set. Wider bands (fewer tables) trade
    that completeness for fewer exploded rows. Exact Hamming is always
    verified per candidate. ``max_hamming`` defaults to
    ``num_tables - 1`` (the completeness bound); passing a larger
    value is allowed but makes the pair set explicitly probabilistic
    (a warning is emitted). Output: (id_a, id_b, hamming)."""
    assert 64 % num_tables == 0, "num_tables must divide 64"
    if max_hamming is None:
        max_hamming = num_tables - 1
    elif max_hamming > num_tables - 1:
        import warnings

        warnings.warn(
            f"hamming_band_pairs: max_hamming={max_hamming} exceeds the "
            f"pigeonhole completeness bound num_tables-1={num_tables - 1}; "
            "the pair set is probabilistic (banding may miss pairs)",
            stacklevel=2,
        )
    band_bits = 64 // num_tables
    band_mask = np.uint64((1 << band_bits) - 1)
    num_shards = _resolve_shards(ds, num_shards)

    def _explode(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_band, out_key, out_h = [], [], [], []
        u = h.astype(np.uint64)
        for b in range(num_tables):
            key = ((u >> np.uint64(band_bits * b)) & band_mask).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, np.int64))
            out_key.append(key)
            out_h.append(h)
        band = np.concatenate(out_band)
        key = np.concatenate(out_key)
        shard = ((key.astype(np.uint64) * np.uint64(num_tables) + band.astype(np.uint64))
                 % np.uint64(num_shards)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(band, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "_h": pa.array(np.concatenate(out_h), pa.int64()),
                "_shard": pa.array(shard, pa.int64()),
            }
        )

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = _bucket_pairs_df(df, ["band", "key"], id_col, extra={"h": "_h"},
                               max_bucket=max_bucket)
        if len(out) == 0:
            return pd.DataFrame({"id_a": out["id_a"], "id_b": out["id_b"],
                                 "hamming": pd.Series([], dtype=np.int64)})
        hd = hamming64(out["h_a"].to_numpy(), out["h_b"].to_numpy())
        out = out.drop(columns=["h_a", "h_b"]).assign(hamming=hd)
        return out[out["hamming"] <= max_hamming]

    pairs = (exploded.repartition(_coalesce_width())
             .groupby("_shard").map_groups(_shard_pairs, batch_format="pandas"))
    return _dedup_pairs(pairs, num_shards)


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int | None = None,
                  num_tables: int = 4, num_shards: int | None = None,
                  max_bucket: int | None = DEFAULT_MAX_BUCKET):
    """Near-dup pairs by SimHash over a text column: compute the
    64-bit SimHash per batch, then ``hamming_band_pairs`` (see there
    for the banding/completeness contract)."""
    ds = ds.map_batches(add_simhash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow")
    return hamming_band_pairs(ds, "simhash", id_col, max_hamming=max_hamming,
                              num_tables=num_tables, num_shards=num_shards,
                              max_bucket=max_bucket)


# ---------------------------------------------------- embedding cosine

def embedding_dim(ds, emb_col: str = "embedding") -> int | None:
    """Embedding dim from the dataset schema when the column is a
    fixed-size list (zero rows touched); falls back to peeking one row
    for variable-length list columns. None for an empty dataset."""
    typ = ds.schema().base_schema.field(emb_col).type
    if pa.types.is_fixed_size_list(typ):
        return typ.list_size
    first = ds.take(1)
    return len(first[0][emb_col]) if first else None


def embedding_neardup_pairs(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                            min_cosine: float = 0.95, nbits: int = 10,
                            num_tables: int = 8,
                            num_shards: int | None = None,
                            max_bucket: int | None = DEFAULT_MAX_BUCKET):
    """Embedding near-dup: banded hyperplane LSH → per-bucket exact
    cosine — O(n·bucket) instead of O(n²).

    ``num_tables`` independent nbits-bit hyperplane tables; a pair is a
    candidate if it collides in ANY table (miss probability for a pair
    at angle θ is ((1-(1-θ/π)^nbits))^num_tables — ≈1e-7 for planted
    near-dups at cosine ≥0.999 with the 8×10-bit default, vs ~13% for
    the single-table layout this replaces). Candidates are verified
    with exact cosine inside the bucket, and the multi-table duplicates
    are removed by a sharded pair-dedup pass. The embedding column is
    shipped ``num_tables``× through the shuffle — the standard LSH
    trade (at 10^12-row scale, drop num_tables and raise nbits, or
    pre-materialize an id→embedding store and ship ids only)."""
    from geomedea_ray.stages.ann import lsh_planes

    num_shards = _resolve_shards(ds, num_shards)
    dim = embedding_dim(ds, emb_col)
    if dim is None:
        import ray.data

        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.string()),
                      "id_b": pa.array([], pa.string()),
                      "cosine": pa.array([], pa.float64())})
        )
    # one (dim, nbits) plane block per table, all from one seeded draw
    planes = np.stack(
        [lsh_planes(dim, nbits, seed=20260817 + 7 * t) for t in range(num_tables)]
    )  # (T, dim, nbits)
    weights = (1 << np.arange(nbits, dtype=np.int64))

    def _explode(batch: pa.Table) -> pa.Table:
        from geomedea_ray.stages.ann import _emb_matrix

        n = batch.num_rows
        if n == 0:
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                emb_col: batch[emb_col].slice(0, 0),
                "_table": pa.array([], pa.int64()),
                "_bucket": pa.array([], pa.int64()),
                "_shard": pa.array([], pa.int64()),
            })
        m = _emb_matrix(batch, emb_col)
        bits = np.einsum("nd,tdb->tnb", m, planes) > 0          # (T, n, b)
        buckets = (bits.astype(np.int64) * weights[None, None, :]).sum(axis=2)  # (T, n)
        t_idx = np.repeat(np.arange(num_tables, dtype=np.int64), n)
        bkt = buckets.reshape(-1)
        with np.errstate(over="ignore"):
            shard = (
                (bkt.astype(np.uint64)
                 ^ (t_idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
                % np.uint64(num_shards)
            ).astype(np.int64)
        rep = pa.array(np.tile(np.arange(n), num_tables))
        return pa.table({
            id_col: batch[id_col].take(rep),
            emb_col: batch[emb_col].take(rep),
            "_table": pa.array(t_idx),
            "_bucket": pa.array(bkt),
            "_shard": pa.array(shard),
        })

    exploded = ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)

    def _shard_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_table", "_bucket", id_col], kind="mergesort")
        starts, ends = _runs(df["_table"].to_numpy(), df["_bucket"].to_numpy())
        ids = df[id_col].to_numpy()
        m = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        m = m / norms
        lens = ends - starts
        hot = np.flatnonzero(lens >= 2)
        if max_bucket is not None:
            over = hot[lens[hot] > max_bucket]
            if len(over):
                print(f"[dedup] skipped {len(over)} oversized embedding-LSH "
                      f"bucket(s) > cap {max_bucket}")
            hot = hot[lens[hot] <= max_bucket]
        out_a, out_b, out_c = [], [], []
        for j in hot:
            s, e = starts[j], ends[j]
            sims = m[s:e] @ m[s:e].T
            ia, ib = np.triu_indices(e - s, k=1)
            keep = sims[ia, ib] >= min_cosine
            out_a.append(ids[s:e][ia[keep]])
            out_b.append(ids[s:e][ib[keep]])
            out_c.append(sims[ia, ib][keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                                 "id_b": pd.Series([], dtype=ids.dtype),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    pairs = (exploded.repartition(_coalesce_width())
             .groupby("_shard").map_groups(_shard_pairs, batch_format="pandas"))
    return _dedup_pairs(pairs, num_shards)


# ------------------------------------------- exact set-similarity join

def _shingle_explode(batch: pa.Table, id_col: str, text_col: str,
                     shingle_k: int) -> pa.Table:
    """(id, text) batch → one row per DISTINCT k-word shingle:
    (id, shingle, size) where size = |shingle set| of the doc. The
    per-text loop is inherent (shingling is a per-document operation,
    like a codec decode); array assembly is vectorized."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    sets = [sorted(set(T.word_shingles(t, shingle_k))) for t in texts]
    counts = np.fromiter((len(s) for s in sets), np.int64, len(sets))
    return pa.table({
        id_col: pa.array(np.repeat(ids, counts)),
        "shingle": pa.array([x for s in sets for x in s], pa.string()),
        "size": pa.array(np.repeat(counts, counts), pa.int64()),
    })


def jaccard_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (2, 5),
    shingle_k: int = 3,
    num_shards: int | None = None,
    empty_cap: int = 2048,
):
    """EXACT set-similarity self-join: ALL pairs with k-word-shingle
    Jaccard ≥ num/den — the prefix-filtered AllPairs/PPJoin design
    (Bayardo et al., WWW'07; Xiao et al., WWW'08 — published
    algorithms), not LSH. Unlike ``minhash_lsh_pairs`` (probabilistic
    candidate recall, verified), completeness here is a THEOREM:
    under any global shingle order, two sets with Jaccard ≥ τ share
    their globally-smallest common shingle inside both prefixes of
    length |S| - ⌈τ|S|⌉ + 1, so indexing only prefixes misses nothing.

    ``threshold`` is an exact rational (num, den): the final filter is
    integer cross-multiplication (den·inter ≥ num·(|A|+|B|-inter)),
    never float.

    Plan (all exchanges key-partitioned; no broadcast of the corpus,
    no driver materialization):
      1. shingle-explode (map; materialized — reused by stages 2/3/5)
      2. global shingle frequencies: per-block partial counts,
         coalesce, one aggregate (ascending-frequency order maximizes
         prefix pruning)
      3. freq ⋈ exploded (hash co-shuffle on shingle), then re-shard
         by doc and keep each doc's p rarest shingles (its PREFIX)
      4. candidate pairs: shard prefixes on hash(shingle), expand
         postings to (id_a < id_b) pairs with the size filter
         den·min ≥ num·max; global pair dedup (sharded)
      4b. POSITIONAL filter (PPJoin): a prefix match at positions
         (pa, pb) caps the achievable overlap at min(|A|-pa, |B|-pb);
         pairs that cannot reach ceil(num·(|A|+|B|)/(num+den)) are cut
         before verification (measured 444k → ~206k candidates at
         sf0.1). Exact — it only removes pairs the threshold already
         excludes.
      5. exact verification, ADAPTIVE on the measured shingle-stream
         size: small corpora broadcast a doc→shingle-set dict
         (ray.put once, fetched once per worker) and intersect
         candidates vectorized — candidate volume does not multiply by
         set size; large corpora use the key-partitioned join plan
         (candidates join the exploded stream on id_a and id_b, shared
         shingles counted per pair — no broadcast of the corpus).

    Pair volume caveat: prefix postings are NOT capped (capping would
    break exactness). A shingle that lands in M prefixes contributes
    O(M²) candidate pairs — with frequency ordering that requires M
    docs whose OTHER shingles are all even hotter, i.e. a
    mass-duplicated corpus; run ``dedup_exact`` first in that regime.
    Docs with an EMPTY shingle set (no tokens) pair mutually (Jaccard
    0/0 := 1, matching functions/text.jaccard_words); they are handled
    on the driver under ``empty_cap`` (M empties = M²/2 output pairs —
    inherently quadratic, exact dedup territory beyond the cap).

    Returns (id_a, id_b, inter, size_a, size_b) — all int64.
    """
    import ray.data

    from geomedea_ray.stages.joins import hash_join

    num, den = threshold
    num_shards = _resolve_shards(ds, num_shards)

    exploded = ds.map_batches(
        _shingle_explode,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "shingle_k": shingle_k},
        batch_format="pyarrow", batch_size=1024, zero_copy_batch=True,
    ).materialize()

    if exploded.count() == 0:
        # all docs have empty shingle sets: only the mutual empty-pair
        # branch can produce output
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("id_a", "id_b", "inter",
                                    "size_a", "size_b")})
        return _jaccard_append_empties(ds, ray.data.from_arrow(empty),
                                       id_col, text_col, empty_cap)

    # ---- global shingle frequency: per-block partial counts, then a
    # SHARDED int-key reduce (hash(shingle) % width) — a string-key
    # groupby().aggregate() over the same partial stream measured 33 s
    # at sf0.1 (the sort exchange samples/sorts every string); the
    # sharded reduce is the repo-standard pattern and runs in ~1 s.
    def _freq_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["shingle"].value_counts()
        sh = (T.stable_hash64(list(c.index)) % np.uint64(num_shards)
              ).astype(np.int64)
        return pd.DataFrame({"shingle": c.index, "cnt": c.to_numpy(),
                             "_shard": sh})

    def _freq_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("shingle", sort=False)["cnt"].sum()
        return pd.DataFrame({"shingle": g.index,
                             "freq": g.to_numpy().astype(np.int64)})

    freq = (
        exploded.map_batches(_freq_partial, batch_format="pandas",
                             batch_size=None)
        .repartition(_coalesce_width())
        .groupby("_shard").map_groups(_freq_reduce, batch_format="pandas")
    )

    # ---- prefix selection: p = |S| - ceil(tau*|S|) + 1 rarest shingles
    joined = hash_join(exploded, freq, left_on="shingle",
                       right_on="shingle", right_cols=["freq"],
                       num_shards=num_shards)

    def _tag_doc_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_shard=pd.Series([], dtype=np.int64))
        sh = (T.stable_hash64(df[id_col].astype(str).tolist())
              % np.uint64(num_shards)).astype(np.int64)
        return df.assign(_shard=sh)

    def _prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "freq", "shingle"], kind="mergesort")
        rank = df.groupby(id_col, sort=False).cumcount().to_numpy()
        size = df["size"].to_numpy().astype(np.int64)
        p = size + (-(num * size) // den) + 1  # exact integer ceil
        keep = rank < p
        out = df.loc[keep, [id_col, "shingle", "size"]]
        return out.assign(pos=rank[keep].astype(np.int64))

    prefixes = (
        joined.map_batches(_tag_doc_shard, batch_format="pandas",
                           batch_size=None)
        .repartition(_coalesce_width())
        .groupby("_shard").map_groups(_prefix, batch_format="pandas")
    )

    # ---- candidate pairs from prefix postings (size-filtered, deduped)
    def _tag_shingle_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(_shard=pd.Series([], dtype=np.int64))
        sh = (T.stable_hash64(df["shingle"].tolist())
              % np.uint64(num_shards)).astype(np.int64)
        return df.assign(_shard=sh)

    def _posting_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = _bucket_pairs_df(df, ["shingle"], id_col,
                               extra={"size": "size", "pos": "pos"},
                               max_bucket=None)
        if len(out) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "size_a": pd.Series([], dtype=np.int64),
                                 "size_b": pd.Series([], dtype=np.int64)})
        sa = out["size_a"].to_numpy().astype(np.int64)
        sb = out["size_b"].to_numpy().astype(np.int64)
        keep = den * np.minimum(sa, sb) >= num * np.maximum(sa, sb)
        # POSITIONAL filter (PPJoin, exact): matching at 0-based
        # frequency-order positions (pa, pb) bounds the achievable
        # overlap by min(sa-pa, sb-pb); the required overlap for
        # J >= num/den is ceil(num*(sa+sb)/(num+den)).
        pa_ = out["pos_a"].to_numpy().astype(np.int64)
        pb_ = out["pos_b"].to_numpy().astype(np.int64)
        minov = -(-(num * (sa + sb)) // (num + den))
        keep &= np.minimum(sa - pa_, sb - pb_) >= minov
        return out.loc[keep, ["id_a", "id_b", "size_a", "size_b"]]

    cand = _dedup_pairs(
        prefixes.map_batches(_tag_shingle_shard, batch_format="pandas",
                             batch_size=None)
        .repartition(_coalesce_width())
        .groupby("_shard").map_groups(_posting_pairs, batch_format="pandas"),
        num_shards,
    )

    # ---- exact verify, ADAPTIVE on the measured shingle-stream size
    # (exploded is materialized, so size_bytes() is metadata):
    #   small corpus: broadcast a doc -> shingle-set dict once per worker
    #   (ray.put + get_once) and intersect candidate pairs vectorized in
    #   a task stage — candidate volume no longer multiplies by set size
    #   (measured at sf0.1: the join plan shipped ~90M shingle rows for
    #   444k candidates whose true output was 256 pairs).
    #   large corpus: key-partitioned join plan (no broadcast anywhere).
    exp_bytes = exploded.size_bytes() or 0
    if exp_bytes <= VERIFY_BROADCAST_BYTES:
        import ray

        from geomedea_ray.util import get_once

        sets_df = exploded.to_pandas()
        sets_ref = ray.put(
            sets_df.groupby(id_col, sort=False)["shingle"].agg(set).to_dict())

        def _verify_bcast(df: pd.DataFrame) -> pd.DataFrame:
            sets = get_once(sets_ref)
            if len(df) == 0:
                return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                     "id_b": pd.Series([], dtype=np.int64),
                                     "inter": pd.Series([], dtype=np.int64),
                                     "size_a": pd.Series([], dtype=np.int64),
                                     "size_b": pd.Series([], dtype=np.int64)})
            ia, ib = df["id_a"].tolist(), df["id_b"].tolist()
            it = np.fromiter((len(sets[a] & sets[b]) for a, b in zip(ia, ib)),
                             np.int64, len(ia))
            sa = df["size_a"].to_numpy().astype(np.int64)
            sb = df["size_b"].to_numpy().astype(np.int64)
            keep = den * it >= num * (sa + sb - it)
            return pd.DataFrame({
                "id_a": np.asarray(ia, np.int64)[keep],
                "id_b": np.asarray(ib, np.int64)[keep],
                "inter": it[keep],
                "size_a": sa[keep], "size_b": sb[keep],
            })

        verified = cand.map_batches(_verify_bcast, batch_format="pandas",
                                    batch_size=65536)
        return _jaccard_append_empties(ds, verified, id_col, text_col,
                                       empty_cap)

    side_a = hash_join(exploded, cand, left_on=id_col, right_on="id_a",
                       right_cols=["id_b", "size_a", "size_b"],
                       num_shards=num_shards)
    side_b = hash_join(exploded, cand, left_on=id_col, right_on="id_b",
                       right_cols=["id_a", "size_a", "size_b"],
                       num_shards=num_shards)

    def _mark(df: pd.DataFrame, key_as: str) -> pd.DataFrame:
        # the join key keeps the LEFT name; relabel it to its pair slot,
        # then shard on the pair so both sides' rows co-locate
        if id_col != key_as:
            df = df.rename(columns={id_col: key_as})
        cols = ["id_a", "id_b", "shingle", "size_a", "size_b"]
        df = df[cols]
        if len(df) == 0:
            return df.assign(_shard=pd.Series([], dtype=np.int64))
        return df.assign(_shard=_pair_shard(df["id_a"], df["id_b"], num_shards))

    both = (side_a.map_batches(_mark, fn_kwargs={"key_as": "id_a"},
                               batch_format="pandas", batch_size=None)
            .union(side_b.map_batches(_mark, fn_kwargs={"key_as": "id_b"},
                                      batch_format="pandas",
                                      batch_size=None)))

    def _count_inter(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "inter": pd.Series([], dtype=np.int64),
                                 "size_a": pd.Series([], dtype=np.int64),
                                 "size_b": pd.Series([], dtype=np.int64)})
        g = (df.groupby(["id_a", "id_b", "shingle"], sort=False)
               .agg(n=("size_a", "size"),
                    size_a=("size_a", "first"), size_b=("size_b", "first"))
               .reset_index())
        shared = g[g["n"] == 2]
        out = (shared.groupby(["id_a", "id_b"], sort=False)
               .agg(inter=("n", "size"),
                    size_a=("size_a", "first"), size_b=("size_b", "first"))
               .reset_index())
        sa = out["size_a"].to_numpy().astype(np.int64)
        sb = out["size_b"].to_numpy().astype(np.int64)
        it = out["inter"].to_numpy().astype(np.int64)
        keep = den * it >= num * (sa + sb - it)
        out = out.loc[keep]
        return pd.DataFrame({
            "id_a": out["id_a"].to_numpy().astype(np.int64),
            "id_b": out["id_b"].to_numpy().astype(np.int64),
            "inter": out["inter"].to_numpy().astype(np.int64),
            "size_a": out["size_a"].to_numpy().astype(np.int64),
            "size_b": out["size_b"].to_numpy().astype(np.int64),
        })

    verified = (both.repartition(_coalesce_width())
                .groupby("_shard").map_groups(_count_inter,
                                              batch_format="pandas"))

    return _jaccard_append_empties(ds, verified, id_col, text_col, empty_cap)


#: verify-plan switch: below this measured shingle-stream size the
#: doc->set dict broadcasts (ray.put once, get_once per worker); above
#: it the key-partitioned join plan runs (no broadcast of the corpus)
VERIFY_BROADCAST_BYTES = 256 << 20


def _jaccard_append_empties(ds, verified, id_col: str, text_col: str,
                            empty_cap: int):
    """Empty-shingle-set docs pair mutually (Jaccard 0/0 := 1, matching
    functions/text.jaccard_words); handled on the driver under
    ``empty_cap`` (M empties = M²/2 output pairs — inherently
    quadratic, exact-dedup territory beyond the cap)."""
    import ray.data

    def _empty_ids(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.fromiter(((t or "").split() == [] for t in texts),
                           bool, len(texts))
        return pa.table({id_col: pa.array(ids[mask])})

    empties = ds.map_batches(_empty_ids, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    if len(empties) > empty_cap:
        raise ValueError(
            f"{len(empties)} empty-token docs > empty_cap={empty_cap}: "
            "their pair set is quadratic; run dedup_exact first")
    if len(empties) >= 2:
        eids = sorted(r[id_col] for r in empties)
        ia, ib = np.triu_indices(len(eids), k=1)
        arr = np.asarray(eids, np.int64)
        extra = pa.table({
            "id_a": pa.array(arr[ia]), "id_b": pa.array(arr[ib]),
            "inter": pa.array(np.zeros(len(ia), np.int64)),
            "size_a": pa.array(np.zeros(len(ia), np.int64)),
            "size_b": pa.array(np.zeros(len(ia), np.int64)),
        })
        verified = verified.union(ray.data.from_arrow(extra))
    return verified


# ------------------------------------------------- paragraph dedup

#: hot-chunk set broadcast ceiling — above this the anti-filter runs as
#: a key-partitioned shuffle instead of a driver round-trip
PARAGRAPH_BROADCAST_BYTES = 64 << 20


def _chunk_explode(batch: pa.Table, id_col: str, text_col: str,
                   words: int) -> pa.Table:
    """(id, text) → one row per consecutive ``words``-word chunk:
    (id, chunk_idx, chunk, _h). The per-text split is inherent (same
    class as shingling); chunk hashing and array assembly are
    vectorized. The trailing partial chunk is kept (SQL mirror: list
    slicing past the end truncates identically)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    chunks: list[str] = []
    counts = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        w = t.split(" ")
        cs = [" ".join(w[j:j + words]) for j in range(0, len(w), words)]
        chunks.extend(cs)
        counts[i] = len(cs)
    idx = np.repeat(np.arange(len(texts)), counts)
    chunk_idx = (np.arange(len(chunks), dtype=np.int64)
                 - np.repeat(np.cumsum(counts) - counts, counts))
    return pa.table({
        id_col: pa.array(ids[idx]),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "chunk": pa.array(chunks, pa.string()),
        "_h": pa.array(T.stable_hash64(np.asarray(chunks, dtype=object))
                       .astype(np.int64), pa.int64()),
    })


def paragraph_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    words_per_chunk: int = 4, min_docs: int = 2,
                    num_shards: int | None = None,
                    broadcast_cap_bytes: int = PARAGRAPH_BROADCAST_BYTES):
    """CCNet-style corpus-level duplicate-paragraph removal: split
    every document into consecutive ``words_per_chunk``-word chunks
    (the fixture corpus has no newlines — fixed-width chunks stand in
    for paragraphs; the machinery is delimiter-agnostic), drop every
    chunk whose exact text occurs in >= ``min_docs`` DISTINCT
    documents, and reassemble each document from its surviving chunks
    in order. Documents that lose every chunk disappear (GROUP BY
    semantics, matching the SQL mirror).

    Distributed shape (no all-pairs, no string-key exchanges):

    1. explode once (id, chunk_idx, chunk, _h) with _h = stable 64-bit
       chunk hash; the stream is materialized because both the count
       and the filter pass consume it (recompute would double the
       split work);
    2. per-block (_h, id) drop_duplicates partial → coalesce → ONE
       int-key hash shuffle counts DISTINCT DOCS per chunk hash
       (a doc's chunks live in one exploded block, so the per-block
       partial already makes (_h, id) globally unique);
    3. the hot set (chunks in >= min_docs docs) is ADAPTIVE like
       jaccard_join's verify: broadcast once per worker
       (ray.put + get_once) under PARAGRAPH_BROADCAST_BYTES, else a
       key-partitioned anti-join shuffle — no unbounded driver set;
    4. survivors co-shuffle ONCE on hash(id) and each document is
       rebuilt vectorized in-shard (sort by chunk_idx + groupby-join).

    Exactness: decisions group by the 64-bit chunk hash while the SQL
    oracle groups by chunk TEXT — identical up to hash collisions
    (~n²/2^64, the same documented trust level as dedup_text's
    fingerprint64 key). Output: (id, text_clean, n_kept).
    """
    import ray

    from geomedea_ray.util import get_once

    num_shards = _resolve_shards(ds, num_shards)
    exploded = ds.map_batches(
        lambda b: _chunk_explode(b, id_col, text_col, words_per_chunk),
        batch_format="pyarrow", batch_size=None,
    ).materialize()

    def _pairs_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["_h", id_col]].drop_duplicates()
        out = out.assign(_shard=(out["_h"].to_numpy().astype(np.uint64)
                                 % np.uint64(num_shards)).astype(np.int64))
        return out

    def _hot_keys(df: pd.DataFrame) -> pd.DataFrame:
        # re-dedup (_h, id) before counting: the per-block partial
        # already deduped, but Ray's dynamic block SPLITTING can break
        # "one doc = one block" at scale, leaving the same (_h, id)
        # pair in two partial blocks — all such duplicates land in this
        # shard (sharded by _h), so one in-shard pass restores global
        # uniqueness and group sizes ARE distinct-doc counts
        counts = df.drop_duplicates(["_h", id_col]).groupby(
            "_h", sort=False).size()
        hot = counts.index[counts.to_numpy() >= min_docs]
        return pd.DataFrame({"_h": hot.to_numpy(np.int64)})

    hot = (
        exploded.map_batches(_pairs_partial, batch_format="pandas",
                             batch_size=None)
        .repartition(_coalesce_width())
        .groupby("_shard").map_groups(_hot_keys, batch_format="pandas")
    ).materialize()

    hot_bytes = hot.size_bytes() or 0
    if hot_bytes <= broadcast_cap_bytes:
        hot_ref = ray.put(np.sort(hot.to_pandas()["_h"].to_numpy(np.int64)))

        def _anti_bcast(df: pd.DataFrame) -> pd.DataFrame:
            hs = get_once(hot_ref)
            keep = ~np.isin(df["_h"].to_numpy(np.int64), hs,
                            assume_unique=False)
            return df.loc[keep, [id_col, "chunk_idx", "chunk"]]

        kept = exploded.map_batches(_anti_bcast, batch_format="pandas",
                                    batch_size=None)
    else:
        def _tag(side: int):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                out = df.assign(
                    _side=np.int8(side),
                    _shard=(df["_h"].to_numpy().astype(np.uint64)
                            % np.uint64(num_shards)).astype(np.int64))
                return out

            return fn

        def _anti_shard(df: pd.DataFrame) -> pd.DataFrame:
            if "_side" not in df.columns or id_col not in df.columns:
                return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                     "chunk_idx": pd.Series([], dtype=np.int64),
                                     "chunk": pd.Series([], dtype=object)})
            hot_h = df.loc[df["_side"] == 1, "_h"].to_numpy(np.int64)
            rows = df[df["_side"] == 0]
            keep = ~np.isin(rows["_h"].to_numpy(np.int64), hot_h)
            return rows.loc[keep, [id_col, "chunk_idx", "chunk"]]

        kept = (
            exploded.map_batches(_tag(0), batch_format="pandas",
                                 batch_size=None)
            .union(hot.map_batches(_tag(1), batch_format="pandas",
                                   batch_size=None))
            .groupby("_shard").map_groups(_anti_shard,
                                          batch_format="pandas")
        )

    def _tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _shard=(df[id_col].to_numpy().astype(np.uint64)
                    % np.uint64(num_shards)).astype(np.int64))

    def _rebuild(df: pd.DataFrame) -> pd.DataFrame:
        if id_col not in df.columns or len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "text_clean": pd.Series([], dtype=object),
                                 "n_kept": pd.Series([], dtype=np.int64)})
        df = df.sort_values([id_col, "chunk_idx"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        return pd.DataFrame({
            id_col: g.size().index.to_numpy(np.int64),
            "text_clean": g["chunk"].agg(" ".join).to_numpy(object),
            "n_kept": g.size().to_numpy(np.int64),
        })

    return (
        kept.map_batches(_tag_doc, batch_format="pandas", batch_size=None)
        .groupby("_shard").map_groups(_rebuild, batch_format="pandas")
    )
