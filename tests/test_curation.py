"""Curation operators (pipelines/curation.py): PII redaction,
repetition filter, benchmark decontamination — vs plain-Python
references at sf0.001, plus planted-fixture invariants."""

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geomedea_ray.pipelines import curation as C
from geomedea_ray.sources import curation_fixture as CF


@pytest.fixture(scope="module")
def curated(ray_session, sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(CF.curated_documents_path(sf_dir)).to_pandas()


class TestPII:
    def test_planted_pii_found_and_redacted(self, ray_session, sf_dir, curated):
        out = C.q_pii_redact(sf_dir).to_pandas().set_index("doc_id")
        n_pii = out[["n_email", "n_phone", "n_ip"]].sum(axis=1)
        planted = curated.set_index("doc_id")["planted_pii"]
        # every planted doc has exactly one PII hit; clean docs none
        assert (n_pii.loc[planted[planted].index] == 1).all()
        assert (n_pii.loc[planted[~planted].index] == 0).all()
        # nothing PII-shaped survives redaction
        joined = " ".join(out["redacted"])
        for pat in (C.EMAIL_RE, C.PHONE_RE, C.IP_RE):
            assert re.search(pat, joined) is None
        assert {"<EMAIL>", "<PHONE>", "<IP>"} <= set(joined.split())

    def test_redact_batch_kernel(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["mail a@b.io and a.c-d@ex.org now", "no pii here 555-12345x"]
                ),
            }
        )
        out = C.redact_pii(batch)
        assert out["n_email"].to_pylist() == [2, 0]
        # 555-12345x: \b555-\d{4}\b fails (5th digit breaks the boundary)
        assert out["n_phone"].to_pylist() == [0, 0]
        assert out["redacted"][0].as_py() == "mail <EMAIL> and <EMAIL> now"


class TestRepetition:
    def test_vs_python_reference(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        out = C.q_doc_repetition(sf_dir).to_pandas().set_index("doc_id")
        docs = pq.read_table(
            sf_dir + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        for _, row in docs.head(40).iterrows():
            toks = row["text"].split()
            if not toks:
                assert row["doc_id"] not in out.index
                continue
            vc = pd.Series(toks).value_counts()
            r = out.loc[row["doc_id"]]
            assert r["n_tokens"] == len(toks)
            assert r["n_distinct"] == len(vc)
            assert r["top_token_n"] == vc.max()
            bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            assert r["top_bigram_n"] == (max(pd.Series(bgs).value_counts()) if bgs else 0)
            assert bool(r["keep"]) == (
                C.DISTINCT_DEN * len(vc) >= C.DISTINCT_NUM * len(toks)
                and C.TOPTOK_DEN * vc.max() <= len(toks)
            )

    def test_keep_verdict_splits_corpus(self, ray_session, sf_dir):
        keep = C.q_doc_repetition(sf_dir).to_pandas()["keep"]
        assert 0.0 < keep.mean() < 1.0  # thresholds are non-vacuous

    def test_empty_batch(self):
        out = C.repetition_stats(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        )
        assert out.num_rows == 0


class TestDecontaminate:
    def test_planted_docs_flagged(self, ray_session, sf_dir, curated):
        out = C.q_decontaminate(sf_dir).to_pandas().set_index("doc_id")
        planted = curated.set_index("doc_id")["planted_gram"]
        hit = out["contaminated"]
        # every planted doc is caught; benchmark docs are excluded
        assert hit.loc[planted[planted].index].all()
        assert not (out.index % CF.BENCH_MOD == 0).any()
        # unplanted docs are (measured) gram-disjoint from the benchmark
        clean_ids = [i for i in out.index if not planted.get(i, False)]
        assert not hit.loc[clean_ids].any()

    def test_membership_kernel(self, ray_session):
        import ray.data

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c d x", "q w e r t", "a b c d a b c d"]
                ),
            }
        )
        ds = ray.data.from_arrow(docs)
        out = (
            C.decontaminate(ds, ["a b c d", "w e r t"], w=4)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "n_hits"] == 1
        assert out.loc[2, "n_hits"] == 1
        # duplicate occurrences of one gram count once (distinct grams)
        assert out.loc[3, "n_hits"] == 1
        assert out["contaminated"].all()


def test_fixture_deterministic(ray_session, sf_dir, curated):
    # cached rebuild returns identical bytes-level content
    import pyarrow.parquet as pq

    again = pq.read_table(CF.curated_documents_path(sf_dir)).to_pandas()
    pd.testing.assert_frame_equal(curated, again)
    # row count preserved; splices only ever ADD tokens
    assert len(curated) == len(again)


class TestJsonl:
    def test_roundtrip_exact(self, ray_session, sf_dir, tmp_path):
        import ray.data

        from geomedea_ray.sources.jsonl import (
            jsonl_is_valid,
            read_jsonl_sharded,
            write_jsonl_sharded,
        )

        src = ray.data.read_parquet(sf_dir + "/documents.parquet")
        out = str(tmp_path / "docs_jsonl")
        manifest = write_jsonl_sharded(src.repartition(3), out)
        assert manifest["total_rows"] == src.count()
        assert jsonl_is_valid(out)
        back = read_jsonl_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
        orig = src.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(back[orig.columns], orig)

    def test_validation_catches_truncation(self, ray_session, sf_dir, tmp_path):
        import ray.data

        from geomedea_ray.sources.jsonl import jsonl_is_valid, write_jsonl_sharded

        src = ray.data.read_parquet(sf_dir + "/documents.parquet")
        out = str(tmp_path / "docs_jsonl_bad")
        manifest = write_jsonl_sharded(src, out)
        victim = os.path.join(out, manifest["files"][0]["path"])
        lines = open(victim).readlines()
        open(victim, "w").writelines(lines[:-1])
        assert not jsonl_is_valid(out)
