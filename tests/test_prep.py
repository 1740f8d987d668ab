"""Composite training-prep pipeline (pipelines/prep.py): stage
semantics verified against the row oracle."""

import json
import os

import numpy as np
import pytest

from geomedea_ray.functions import text as T
from geomedea_ray.pipelines.prep import MAX_TOKENS, MIN_TOKENS, training_prep


@pytest.fixture(scope="module")
def prepared(ray_session):
    return training_prep("/root/testdata/sf0.001").to_pandas()


def test_dedup_no_duplicate_sources(prepared):
    # after phash dedup each surviving image appears once per polygon
    # match at most; image_id+poly pairs are unique
    assert not prepared.duplicated(["image_id", "poly_id"]).any()


def test_quality_bounds_hold(prepared):
    assert ((prepared["n_tokens"] >= MIN_TOKENS) & (prepared["n_tokens"] <= MAX_TOKENS)).all()
    # recompute token counts from the carried captions
    again = T.token_count(prepared["caption"].tolist())
    assert (again == prepared["n_tokens"].to_numpy()).all()


def test_planted_duplicates_removed(prepared):
    """synth duplicates (img i copies i-7 when i%20==0) keep only the
    smaller image_id after dedup."""
    ids = set(prepared["image_id"])
    from geomedea_ray.sources.synth import DUP_BACK, DUP_RATE

    for i in range(DUP_RATE, 2000, DUP_RATE):
        dup = f"img-{i:012d}"
        assert dup not in ids  # the copy (larger id) never survives


def test_partitioned_write_with_lineage(ray_session, tmp_path):
    out = str(tmp_path / "prep_out")
    summary = training_prep("/root/testdata/sf0.001", out_dir=out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    recs = [json.loads(l) for l in open(os.path.join(out, "lineage.jsonl"))]
    assert len(recs) == len(summary) > 0
    assert sum(r["row_count"] for r in recs) == summary["rows"].sum()
    # files exist and row counts match
    import pyarrow.parquet as pq

    for r in summary.itertuples():
        assert pq.ParquetFile(r.path).metadata.num_rows == r.rows


class TestImagePackMultimodal:
    def test_packing_invariants(self, ray_session):
        """Distributed ViT patch+caption packing vs a single-process
        cumsum over the same costs: identical assignment, and the
        concat-and-chunk reconstruction holds (each row's cum0 =
        seq_id * budget + seq_offset, strictly increasing by cost)."""
        import numpy as np

        from geomedea_ray.pipelines.flagship import (
            PACK_MM_BUDGET, image_pack_multimodal_q)

        df = image_pack_multimodal_q("/root/testdata/sf0.001").to_pandas()
        df = df.sort_values("image_id").reset_index(drop=True)
        assert len(df) == 2000
        cum0 = df["seq_id"].to_numpy(np.int64) * PACK_MM_BUDGET + \
            df["seq_offset"].to_numpy(np.int64)
        cost = df["cost"].to_numpy(np.int64)
        # single-process oracle: exclusive cumsum in image_id order
        want = np.cumsum(cost) - cost
        assert np.array_equal(cum0, want)
        # seq ids are monotone and every sequence except the last is
        # filled to at least budget (an item may straddle the boundary)
        assert (np.diff(df["seq_id"].to_numpy(np.int64)) >= 0).all()
        # costs: 6-word caption + "#id" = 7 tokens, 16 or 64 patches
        assert set(np.unique(cost).tolist()) == {23, 71}
