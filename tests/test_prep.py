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
