"""Round-5 verdict item 1: the keep-policy dedup family must be
scale-safe — q_dedup_neardup / q_dedup_keep_best route their drop sets
through the MEASURED adaptive broadcast/shuffle plan
(stages/joins.semi_anti_join) instead of an unconditional driver-side
resolve + broadcast. These tests force the key-partitioned path with a
zero broadcast budget and assert it matches the broadcast plan
row-for-row (same rows, same dtypes)."""

import numpy as np
import pandas as pd
import pytest


def _canon(df: pd.DataFrame, key: str = "doc_id") -> pd.DataFrame:
    return (df[sorted(df.columns)]
            .sort_values(key, kind="mergesort")
            .reset_index(drop=True))


def test_semi_anti_join_plans_agree(ray_session):
    """Direct unit check over synthetic data: both plans of
    semi_anti_join emit identical rows for SEMI and ANTI, including
    shards fed by only one union side (keys hashing to rows-free
    shards) and int dtype restoration."""
    import ray.data

    from geomedea_ray.stages.joins import semi_anti_join

    rows = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "val": np.arange(100, dtype=np.int64) * 7,
        "tag": [f"t{i % 3}" for i in range(100)],
    })
    # keys: half hitting, half missing entirely (exercise no-match shards)
    keys = pd.DataFrame({"doc_id": np.concatenate([
        np.arange(0, 100, 2, dtype=np.int64),
        np.arange(1000, 1040, dtype=np.int64),
    ])})
    for anti in (False, True):
        got = {}
        for cap in ((64 << 20), 0):
            out = semi_anti_join(
                ray.data.from_pandas(rows), "doc_id",
                ray.data.from_pandas(keys),
                row_cols=["doc_id", "val", "tag"], anti=anti,
                broadcast_cap_bytes=cap, num_shards=5,
                out_dtypes={"doc_id": np.int64, "val": np.int64},
            ).to_pandas()
            got[cap] = _canon(out)
        pd.testing.assert_frame_equal(got[64 << 20], got[0])
        expect = 50 if anti else 50
        assert len(got[0]) == expect
        assert got[0]["val"].dtype == np.int64


def test_semi_anti_join_empty_key_side(ray_session):
    """A zero-row key dataset: ANTI keeps everything, SEMI keeps
    nothing, on BOTH plans."""
    import ray.data

    from geomedea_ray.stages.joins import semi_anti_join

    rows = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                         "val": np.arange(10, dtype=np.int64)})
    keys = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
    for cap in ((64 << 20), 0):
        anti = semi_anti_join(ray.data.from_pandas(rows), "doc_id",
                              ray.data.from_pandas(keys),
                              row_cols=["doc_id", "val"], anti=True,
                              broadcast_cap_bytes=cap, num_shards=3,
                              out_dtypes={"doc_id": np.int64,
                                          "val": np.int64}).to_pandas()
        assert len(anti) == 10
        semi = semi_anti_join(ray.data.from_pandas(rows), "doc_id",
                              ray.data.from_pandas(keys),
                              row_cols=["doc_id", "val"], anti=False,
                              broadcast_cap_bytes=cap, num_shards=3,
                              out_dtypes={"doc_id": np.int64,
                                          "val": np.int64}).to_pandas()
        assert len(semi) == 0


@pytest.mark.parametrize("qname", ["q_dedup_neardup", "q_dedup_keep_best"])
def test_keep_policy_sharded_matches_broadcast(ray_session, sf_dir, qname):
    """The gate queries themselves, both plans, row-for-row — the
    verdict's done-criterion for item 1."""
    import pyarrow.parquet as pq

    from geomedea_ray.pipelines import text_queries as T

    q = getattr(T, qname)
    bcast = _canon(q(sf_dir).to_pandas())
    shard = _canon(q(sf_dir, broadcast_cap_bytes=0).to_pandas())
    pd.testing.assert_frame_equal(bcast, shard)
    assert bcast["doc_id"].dtype == np.int64
    assert bcast["n_chars"].dtype == np.int64
    total = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    # the anti join actually dropped near-dup members at this scale
    assert 0 < len(bcast) < total
