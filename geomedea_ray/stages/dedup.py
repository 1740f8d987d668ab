"""Deduplication operators for training-data pipelines (task brief;
no reference counterpart — SURVEY §2.5).

- ``dedup_exact``: hash-partitioned exact dedup — add a stable
  content key in ``map_batches``, then ``groupby(key)`` keep the row
  with the minimum order column. One hash shuffle on the key.
- ``minhash_lsh_pairs``: MinHash + banded LSH near-dup candidates —
  shingle→signature per batch, explode to (band, band_hash) rows,
  ``groupby`` buckets, emit verified pairs (exact Jaccard ≥ threshold).
- ``simhash_pairs``: 64-bit SimHash grouped by rotated prefix bands;
  pairs within Hamming radius.
- ``embedding_neardup_pairs``: cosine near-dup via LSH buckets +
  exact verification inside each bucket.
- ``phash_dedup``: exact image dedup on the perceptual-hash column
  (the image+caption table's built-in content key).

All emit deterministic results: pair output is canonicalized
(id_a < id_b) and derived solely from stable hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomedea_ray.functions import text as T
from geomedea_ray.functions.codecs import hamming64


# ---------------------------------------------------------------- exact

def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fp = T.fingerprint64(batch[text_col].to_pylist())
    return batch.append_column("fp64", pa.array(fp, pa.int64()))


def dedup_exact(ds, key_col: str, order_col: str):
    """Keep, per distinct ``key_col`` value, the row with the smallest
    ``order_col``. groupby = ONE hash shuffle on the key; each group is
    reduced to a single row (map-side pre-reduction happens per sort
    block inside Ray's aggregate machinery)."""

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key_col).map_groups(_first, batch_format="pandas")


def phash_dedup(ds, order_col: str = "image_id"):
    """Exact image dedup on the phash column (SURVEY §7.2 step 8)."""
    return dedup_exact(ds, "phash", order_col)


# ------------------------------------------------------------- minhash

class MinHashStage:
    """Actor: computes MinHash signatures + band hashes per batch.
    Permutation tables built once per actor in __init__."""

    def __init__(self, num_perm: int, num_bands: int, shingle_k: int, text_col: str, id_col: str):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
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
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "band": pa.array(band_idx, pa.int64()),
                "band_hash": pa.array(band_hash, pa.int64()),
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
):
    """Candidate near-dup pairs via banded MinHash-LSH.

    Stage 1 (map): signature + explode to (band, band_hash, id) — the
    stream is num_bands× the input row count but only 3 small columns.
    Stage 2 (shuffle): groupby (band, band_hash); every bucket with
    ≥2 ids emits its canonical pairs. Pairs are deduped by a final
    groupby. ``verify_threshold`` (needs ``texts_by_id`` broadcast)
    filters candidates by exact shingle Jaccard.
    """
    exploded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "num_bands": num_bands,
            "shingle_k": shingle_k,
            "text_col": text_col,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=4,
    )

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )

    def _dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    uniq = pairs.groupby(["id_a", "id_b"]).map_groups(_dedup_pair, batch_format="pandas")

    if verify_threshold is not None and texts_by_id is not None:
        import ray

        ref = ray.put(texts_by_id)
        thr = float(verify_threshold)
        kk = shingle_k

        class _Verify:
            def __init__(self):
                self.texts = ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if len(batch) == 0:
                    return batch
                keep = [
                    T.jaccard_words(self.texts[a], self.texts[b], kk) >= thr
                    for a, b in zip(batch["id_a"], batch["id_b"])
                ]
                return batch[np.array(keep, bool)]

        uniq = uniq.map_batches(_Verify, batch_format="pandas", batch_size=4096, concurrency=2)
    return uniq


# ------------------------------------------------------------- simhash

def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = T.simhash64(batch[text_col].to_pylist())
    return batch.append_column("simhash", pa.array(h, pa.int64()))


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 8,
                  num_tables: int = 4):
    """Near-dup pairs by SimHash: band the 64-bit hash into
    ``num_tables`` 16-bit keys (any pair within Hamming ≤ 3·16/4 shares
    at least one band with high probability); verify exact Hamming."""
    ds = ds.map_batches(add_simhash, fn_kwargs={"text_col": text_col}, batch_format="pyarrow")

    def _explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_band, out_key, out_h = [], [], [], []
        u = h.astype(np.uint64)
        for b in range(num_tables):
            key = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, np.int64))
            out_key.append(key)
            out_h.append(h)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band), pa.int64()),
                "key": pa.array(np.concatenate(out_key), pa.int64()),
                "simhash": pa.array(np.concatenate(out_h), pa.int64()),
            }
        )

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        hd = hamming64(hs[ia], hs[ib])
        keep = hd <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep], "hamming": hd[keep]})

    pairs = exploded.groupby(["band", "key"]).map_groups(_bucket_pairs, batch_format="pandas")

    def _dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(_dedup_pair, batch_format="pandas")


# ---------------------------------------------------- embedding cosine

def embedding_neardup_pairs(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                            min_cosine: float = 0.95, nbits: int = 10):
    """Embedding near-dup: LSH-bucket (random hyperplanes) →
    per-bucket exact cosine — O(n·bucket) instead of O(n²)."""
    from geomedea_ray.stages.ann import _emb_matrix, add_lsh_bucket, lsh_planes

    first = ds.take(1)
    dim = len(first[0][emb_col])
    planes = lsh_planes(dim, nbits)
    ds = ds.map_batches(
        add_lsh_bucket, fn_kwargs={"planes": planes, "emb_col": emb_col},
        batch_format="pyarrow",
    )

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        m = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sims = (m / norms) @ (m / norms).T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sims[ia, ib] >= min_cosine
        ids = g[id_col].to_numpy()
        return pd.DataFrame(
            {"id_a": ids[ia][keep], "id_b": ids[ib][keep], "cosine": sims[ia, ib][keep]}
        )

    return ds.groupby("lsh_bucket").map_groups(_bucket, batch_format="pandas")
