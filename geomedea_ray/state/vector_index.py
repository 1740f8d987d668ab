"""Vector index ON the versioned table — the other half of the Lance
story (BASELINE.json's input_hint names Lance, which is a table format
PLUS vector indices; reference repo has no ANN at all, so this is
north-rule §2.5 new work).

Semantics follow Lance's public model:

- ``create_vector_index(table, column, ...)`` builds an IVF-PQ store
  (stages/ann.build_ivfpq_store) from the table's rows AT A VERSION
  and publishes it under ``<root>/_indices/<column>-v<V>/`` with an
  ``index.json`` recording the build version. Indices are immutable
  sidecars — versions keep committing normally around them.
- ``vector_search(table, column, qm, qids, k, version=...)`` serves
  ANN at any later version WITHOUT rebuilding:
  1. the INDEXED portion (rows as of the build version) goes through
     the IVF-PQ probe — pruned lists × 16-byte codes, exact re-rank;
  2. the UNINDEXED TAIL (fragments appended after the build version,
     via ``read_incremental``) is exact-scanned flat — at 100 TB the
     tail is a day's appends, not the corpus;
  3. rows DELETED since the build version are dropped by a liveness
     filter on the merged candidates (gate-scale: an id-projected
     membership scan; the scale path is a per-fragment deletion-vector
     probe by row position, noted where it would go);
  4. one shared final top-k (round + id tiebreak) over the merged
     exact-sim candidates.

Staleness contract: an ``update()`` that rewrites the indexed column's
VALUES invalidates the index (ids stay valid under delete / compact /
append / merge_insert-as-delete+insert for untouched rows — those are
the operations the search handles); callers must rebuild after such an
update, as in Lance.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_INDEX_DIR = "_indices"


def _index_root(table, column: str, version: int) -> str:
    return os.path.join(table.root, _INDEX_DIR, f"{column}-v{version}")


def create_vector_index(table, column: str, id_col: str,
                        version: int | None = None,
                        n_lists: int = 64, m_sub: int = 16,
                        k_codes: int = 64, sample_rows: int = 20_000,
                        seed: int = 20260817) -> str:
    """Build + publish the IVF-PQ index for ``column`` at ``version``
    (default: latest). Build into a tmp dir, publish by atomic rename
    (the sources/cache pattern — a killed builder leaves no readable
    half-index). Returns the index directory."""
    from geomedea_ray.stages.ann import build_ivfpq_store

    v = table._resolve(version)
    out = _index_root(table, column, v)
    if os.path.exists(os.path.join(out, "index.json")):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    ds = table.read(version=v, columns=[id_col, column])
    build_ivfpq_store(ds, tmp, n_lists=n_lists, m_sub=m_sub,
                      k_codes=k_codes, sample_rows=sample_rows,
                      seed=seed, id_col=id_col, emb_col=column)
    with open(os.path.join(tmp, "index.json"), "w") as f:
        json.dump({"column": column, "id_col": id_col, "version": v,
                   "kind": "ivfpq"}, f)
    os.replace(tmp, out)
    return out


def find_vector_index(table, column: str,
                      version: int | None = None) -> dict | None:
    """The newest published index for ``column`` whose build version
    <= ``version`` (searches must never use an index built from a
    FUTURE version — time travel stays correct)."""
    v = table._resolve(version)
    base = os.path.join(table.root, _INDEX_DIR)
    if not os.path.isdir(base):
        return None
    best = None
    for name in os.listdir(base):
        meta_p = os.path.join(base, name, "index.json")
        if not (name.startswith(f"{column}-v") and os.path.exists(meta_p)):
            continue
        with open(meta_p) as f:
            meta = json.load(f)
        if meta["version"] <= v and (best is None
                                     or meta["version"] > best["version"]):
            best = dict(meta, dir=os.path.join(base, name))
    return best


def vector_search(table, column: str, query_matrix: np.ndarray,
                  qids: np.ndarray, k: int,
                  version: int | None = None,
                  nprobe: int = 8, refine: int = 16,
                  round_decimals: int = 6, batch_size: int = 4096):
    """ANN over the versioned table at ``version``: indexed portion via
    the IVF-PQ probe, post-index appends exact-scanned flat, deletions
    filtered, one shared final top-k. Falls back to a full exact scan
    when no usable index exists. Returns (qid, <id_col>, rank)."""
    import ray

    from geomedea_ray.stages.ann import (
        _CosineTopK,
        _final_topk,
        ann_topk,
        ivfpq_exact_candidates,
    )
    from geomedea_ray.util import cached_instance, get_once

    v = table._resolve(version)
    idx = find_vector_index(table, column, v)
    qm = np.asarray(query_matrix, np.float64)
    qids = np.asarray(qids)
    if idx is None:
        return ann_topk(table.read(version=v,
                                   columns=[_default_id(table, column),
                                            column]),
                        qm, qids, k, id_col=_default_id(table, column),
                        emb_col=column, round_decimals=round_decimals,
                        batch_size=batch_size)
    id_col = idx["id_col"]
    ncand = k * refine

    cand = ivfpq_exact_candidates(idx["dir"], qm, qids, ncand,
                                  nprobe=nprobe, batch_size=batch_size)

    if v > idx["version"]:
        # the unindexed tail: fragments appended after the index build
        # (as-at-introduction rows; deletions handled below)
        tail = table.read_incremental(idx["version"], v,
                                      columns=[id_col, column])
        ref = ray.put({"matrix": qm, "qids": qids})

        def _flat(batch: pa.Table) -> pa.Table:
            inst = cached_instance(
                ("vecidx.flat", ref.hex(), ncand),
                lambda: _CosineTopK(ref, ncand, id_col, column))
            return inst(batch)

        cand = cand.union(tail.map_batches(
            _flat, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True))

    if v != idx["version"]:
        # liveness filter: drop candidates whose row no longer exists
        # at v. Gate-scale realization: one id-projected scan of the
        # table (the id column only — kilobytes/row-group). 100 TB
        # path: probe the per-fragment deletion vectors by row
        # position instead of materializing ids.
        live = table.read(version=v,
                          columns=[id_col]).to_pandas()[id_col].to_numpy()
        live_ref = ray.put(np.sort(live))

        def _alive(df: pd.DataFrame) -> pd.DataFrame:
            keep = np.isin(df[id_col].to_numpy(), get_once(live_ref))
            return df[keep]

        cand = cand.map_batches(_alive, batch_format="pandas",
                                batch_size=None)

    return cand.groupby("qid").map_groups(
        _final_topk(k, id_col, round_decimals), batch_format="pandas")


def _default_id(table, column: str) -> str:
    """Flat-fallback id column: the table's first non-vector column."""
    cols = table.schema_columns()
    for c, t in cols.items():
        if c != column and not str(t).startswith("list"):
            return c
    raise ValueError("no scalar id column available for flat search")
