"""LSH-bucketed ANN: recall vs the exact brute-force path."""

import numpy as np
import pyarrow as pa

from geomedea_ray.stages.ann import ann_topk, ann_topk_lsh


def test_lsh_recall_vs_exact(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    n, dim, k = 4000, 32, 10
    # clustered data so ANN has structure to exploit
    centers = rng.normal(size=(20, dim)) * 3
    vecs = centers[rng.integers(0, 20, n)] + rng.normal(size=(n, dim)) * 0.5
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32(), dim)),
        }
    )
    qm = vecs[:5]
    qids = np.arange(5)
    exact = ann_topk(ray.data.from_arrow(tbl), qm, qids, k).to_pandas()
    approx = ann_topk_lsh(
        ray.data.from_arrow(tbl), qm, qids, k, nbits=8, nprobe=16
    ).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact["qid"] == q]["vec_id"])
        a = set(approx[approx["qid"] == q]["vec_id"])
        recalls.append(len(e & a) / k)
    # self-match (rank 1) must always be found: the query IS a row here
    # only when qm rows are table rows — they are (vecs[:5])
    for q in qids:
        top = approx[(approx["qid"] == q) & (approx["rank"] == 1)]["vec_id"]
        assert list(top) == [q]
    assert np.mean(recalls) >= 0.6, f"mean recall {np.mean(recalls)} too low"


class TestBucketedStore:
    """LSH bucket as a STORAGE sort key (round-2 work): file/row-group
    pruning must be sub-linear and results must match the mask-based
    LSH path / brute force."""

    def _table(self):
        rng = np.random.default_rng(17)
        n, dim = 4000, 32
        centers = rng.normal(size=(20, dim)) * 3
        vecs = centers[rng.integers(0, 20, n)] + rng.normal(size=(n, dim)) * 0.5
        # plant near-dups of rows 0..9
        planted = vecs[:10] + rng.normal(size=(10, dim)) * 0.01
        allv = np.vstack([vecs, planted])
        ids = np.concatenate([np.arange(n), np.arange(10) + 1_000_000])
        tbl = pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(allv.astype(np.float32)),
                                  pa.list_(pa.float32(), dim)),
        })
        return tbl, allv, ids

    def test_store_topk_and_radius_and_pruning(self, ray_session, tmp_path):
        import ray.data

        from geomedea_ray.stages.ann import (
            _probe_buckets,
            ann_radius_bucketed,
            ann_topk_bucketed,
            ann_topk,
            bucket_scan_stats,
            build_bucketed_store,
            lsh_planes,
        )

        tbl, allv, ids = self._table()
        store = str(tmp_path / "store")
        # small row groups so pruning granularity exists at test scale
        meta = build_bucketed_store(ray.data.from_arrow(tbl), store, nbits=8,
                                    row_group_size=512)
        assert len(meta["files"]) >= 1

        qm = allv[:5].astype(np.float64)
        qids = np.arange(5)
        k = 10
        exact = ann_topk(ray.data.from_arrow(tbl), qm, qids, k).to_pandas()
        approx = ann_topk_bucketed(store, qm, qids, k, nprobe=16).to_pandas()
        recalls = [
            len(set(exact[exact["qid"] == q]["vec_id"])
                & set(approx[approx["qid"] == q]["vec_id"])) / k
            for q in qids
        ]
        assert np.mean(recalls) >= 0.6

        # radius search == brute force at a near-dup threshold
        got = ann_radius_bucketed(store, qm, qids, 0.95, nprobe=16).to_pandas()
        mn = allv / np.linalg.norm(allv, axis=1, keepdims=True)
        for q in qids:
            sims = mn @ mn[q]
            expect = set(ids[(sims >= 0.95) & (ids != q)].tolist())
            assert set(got[got["qid"] == q]["vec_id"]) == expect

        # pruning: a single query's probe set touches a strict subset
        planes = np.asarray(meta["planes"])
        probes = _probe_buckets(qm[0], planes, 8)
        st = bucket_scan_stats(store, probes)
        assert st["bytes_touched"] < st["bytes_total"]
        assert st["row_groups_touched"] < st["row_groups_total"]


class TestIVFStore:
    """IVF variant (spherical k-means coarse quantizer) of the
    bucket-sorted store — the task brief's 'IVF … as the scale path'."""

    def test_kmeans_deterministic_and_clustered(self):
        from geomedea_ray.stages.ann import kmeans_centroids

        rng = np.random.default_rng(3)
        centers = rng.normal(size=(8, 16)) * 4
        x = centers[rng.integers(0, 8, 2000)] + rng.normal(size=(2000, 16)) * 0.3
        c1 = kmeans_centroids(x, 8, seed=99)
        c2 = kmeans_centroids(x, 8, seed=99)
        assert np.array_equal(c1, c2)  # deterministic
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
        # every true center has a learned centroid at high cosine
        cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        assert ((cn @ c1.T).max(axis=1) > 0.95).all()

    def test_ivf_store_recall_and_pruning(self, ray_session, tmp_path):
        import ray.data

        from geomedea_ray.stages.ann import (
            _probe_sets_for,
            ann_topk,
            ann_topk_bucketed,
            bucket_scan_stats,
            build_ivf_store,
        )

        tbl, allv, ids = TestBucketedStore._table(TestBucketedStore)
        store = str(tmp_path / "ivf")
        meta = build_ivf_store(ray.data.from_arrow(tbl), store, n_lists=20,
                               sample_rows=2000, row_group_size=512)
        assert meta["kind"] == "ivf" and len(meta["centroids"]) == 20

        qm = allv[:5].astype(np.float64)
        qids = np.arange(5)
        k = 10
        exact = ann_topk(ray.data.from_arrow(tbl), qm, qids, k).to_pandas()
        approx = ann_topk_bucketed(store, qm, qids, k, nprobe=4).to_pandas()
        recalls = [
            len(set(exact[exact["qid"] == q]["vec_id"])
                & set(approx[approx["qid"] == q]["vec_id"])) / k
            for q in qids
        ]
        # clustered data + 4-of-20 lists probed: high recall expected
        assert np.mean(recalls) >= 0.8, recalls
        for q in qids:  # self-match always found (query is a table row)
            top = approx[(approx["qid"] == q) & (approx["rank"] == 1)]["vec_id"]
            assert list(top) == [q]

        # sub-linear scan: nprobe lists touch a strict subset
        probes = _probe_sets_for(meta, qm[:1], 4)[0]
        st = bucket_scan_stats(store, probes)
        assert st["bytes_touched"] < st["bytes_total"]
        assert st["row_groups_touched"] < st["row_groups_total"]


class TestAssignClusters:
    def test_matches_bruteforce_and_ties(self, ray_session):
        import ray.data

        from geomedea_ray.stages.ann import (assign_clusters,
                                             quantize_embeddings)

        rng = np.random.default_rng(11)
        m = rng.normal(size=(200, 16)).astype(np.float32) * 0.4
        cq = quantize_embeddings(rng.normal(size=(6, 16)) * 0.4)
        # duplicate centroid 0 as centroid 5: every vector nearest to 0
        # ties with 5 and must resolve to the SMALLER cluster_id
        cq[5] = cq[0]
        t = pa.table({"vec_id": pa.array(np.arange(200), pa.int64()),
                      "embedding": pa.array([list(map(float, r)) for r in m],
                                            pa.list_(pa.float32()))})
        out = (assign_clusters(ray.data.from_arrow(t), cq)
               .to_pandas().sort_values("vec_id").reset_index(drop=True))
        eq = quantize_embeddings(m.astype(np.float64))
        dots = eq @ cq.T
        expect = np.argmax(dots, axis=1)
        assert (out["cluster_id"].to_numpy() == expect).all()
        assert (out["score"].to_numpy()
                == dots[np.arange(200), expect]).all()
        assert not (out["cluster_id"] == 5).any()  # ties -> min id

    def test_fixture_determinism(self, ray_session, tmp_path):
        import geomedea_ray.pipelines.text_queries as T

        p = T.centroid_fixture_path("/root/testdata/sf0.001")
        a = T.q_embedding_clusters("/root/testdata/sf0.001").to_pandas()
        b = T.q_embedding_clusters("/root/testdata/sf0.001").to_pandas()
        sa = a.sort_values("vec_id").reset_index(drop=True)
        sb = b.sort_values("vec_id").reset_index(drop=True)
        assert sa.equals(sb)
        assert sa["cluster_id"].nunique() > 1  # real partitioning, not vacuous


class TestKMeansTrainExact:
    def test_converges_and_exact_update(self, ray_session):
        import ray.data

        from geomedea_ray.stages.ann import (kmeans_train_exact,
                                             quantize_embeddings)

        # two tight blobs; seeds (ids 0,1) start in the SAME blob, so
        # only a real multi-round update separates them
        rng = np.random.default_rng(5)
        a = rng.normal(0.0, 0.05, (10, 4)) + np.array([1.0, 0, 0, 0])
        b = rng.normal(0.0, 0.05, (10, 4)) + np.array([-1.0, 0, 0, 0])
        vecs = np.vstack([a, b])
        t = pa.table({
            "vec_id": pa.array(np.arange(20), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                  pa.list_(pa.float32())),
        })
        out, cents = kmeans_train_exact(
            ray.data.from_arrow(t).repartition(4), k=2, iters=3)
        df = out.to_pandas().sort_values("vec_id")
        blob_a = df["cluster_id"].to_numpy()[:10]
        blob_b = df["cluster_id"].to_numpy()[10:]
        assert len(set(blob_a)) == 1 and len(set(blob_b)) == 1
        assert set(blob_a) != set(blob_b)

        # final centroid = floor(sum/count) of the members it owns
        q = quantize_embeddings(vecs.astype(np.float64))
        for cid in (0, 1):
            members = q[df["cluster_id"].to_numpy() == cid]
            want = np.floor(members.sum(0) / len(members)).astype(np.int64)
            assert (cents[cid] == want).all()

    def test_rerun_identical(self, ray_session):
        import ray.data

        from geomedea_ray.stages.ann import kmeans_train_exact

        rng = np.random.default_rng(11)
        t = pa.table({
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in rng.normal(0, 1, (40, 8))],
                pa.list_(pa.float32())),
        })
        runs = [
            kmeans_train_exact(ray.data.from_arrow(t).repartition(n), 3, 2)[1]
            for n in (2, 5)
        ]
        # partition-count-invariant AND rerun-stable (exact int sums)
        assert (runs[0] == runs[1]).all()


class TestProductQuantizer:
    def test_train_encode_deterministic_and_compact(self):
        from geomedea_ray.stages.ann import pq_encode, pq_train

        rng = np.random.default_rng(5)
        x = rng.normal(size=(3000, 32))
        b1 = pq_train(x, m_sub=8, k_codes=16, seed=7)
        b2 = pq_train(x, m_sub=8, k_codes=16, seed=7)
        assert np.array_equal(b1, b2)
        assert b1.shape == (8, 16, 4)
        codes = pq_encode(x, b1)
        assert codes.shape == (3000, 8) and codes.dtype == np.uint8
        # the PQ scale story: 8 one-byte codes vs 32 float32 dims = 16x
        # (32x against float64); quantization must actually reconstruct
        recon = np.concatenate(
            [b1[m][codes[:, m]] for m in range(8)], axis=1)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        err = np.linalg.norm(recon - xn, axis=1).mean()
        # isotropic gaussian is the hardest case for 16 codes/subspace;
        # two UNRELATED unit vectors sit at ~sqrt(2)=1.41 apart
        assert err < 0.7

    def test_pq_topk_recall_vs_exact(self, ray_session):
        import ray.data

        from geomedea_ray.stages.ann import ann_topk, ann_topk_pq

        tbl, allv, ids = TestBucketedStore._table(TestBucketedStore)
        ds = ray.data.from_arrow(tbl).repartition(4)
        qm = allv[:3]
        qids = np.array([900001, 900002, 900003])
        k = 10
        exact = ann_topk(ds, qm, qids, k).to_pandas()
        got = ann_topk_pq(ds, qm, qids, k, m_sub=16, k_codes=64,
                          refine=16, sample_rows=4096).to_pandas()
        assert set(got.columns) >= {"qid", "vec_id", "rank"}
        recalls = []
        for q in qids:
            e = set(exact[exact["qid"] == q]["vec_id"])
            g = set(got[got["qid"] == q]["vec_id"])
            assert len(g) == k
            recalls.append(len(e & g) / k)
        assert np.mean(recalls) >= 0.8, recalls
        # re-ranked candidates are ordered by EXACT cosine: rank-1 of a
        # planted-dup query must be the true nearest if it survived
        g1 = got[(got["qid"] == qids[0]) & (got["rank"] == 1)]["vec_id"]
        e1 = exact[(exact["qid"] == qids[0]) & (exact["rank"] == 1)]["vec_id"]
        if int(e1.iloc[0]) in set(got[got["qid"] == qids[0]]["vec_id"]):
            assert int(g1.iloc[0]) == int(e1.iloc[0])

    def test_pq_rerun_deterministic(self, ray_session):
        import ray.data

        from geomedea_ray.stages.ann import ann_topk_pq

        tbl, allv, ids = TestBucketedStore._table(TestBucketedStore)
        ds = ray.data.from_arrow(tbl).repartition(3)
        qm = allv[5:7]
        qids = np.array([1, 2])
        a = ann_topk_pq(ds, qm, qids, 8).to_pandas().sort_values(
            ["qid", "rank"]).reset_index(drop=True)
        b = ann_topk_pq(ds, qm, qids, 8).to_pandas().sort_values(
            ["qid", "rank"]).reset_index(drop=True)
        assert a.equals(b)


class TestIVFPQStore:
    def test_recall_and_two_axis_pruning(self, ray_session, tmp_path):
        import os

        import pyarrow.parquet as pqt
        import ray.data

        from geomedea_ray.stages.ann import (
            _probe_sets_for,
            ann_topk,
            ann_topk_ivfpq,
            bucket_scan_stats,
            build_ivfpq_store,
        )

        tbl, allv, ids = TestBucketedStore._table(TestBucketedStore)
        store = str(tmp_path / "ivfpq")
        meta = build_ivfpq_store(ray.data.from_arrow(tbl), store, n_lists=20,
                                 m_sub=8, k_codes=64, sample_rows=2000,
                                 row_group_size=512)
        assert meta["kind"] == "ivfpq" and meta["m_sub"] == 8

        qm = allv[:5].astype(np.float64)
        qids = np.arange(5)
        k = 10
        exact = ann_topk(ray.data.from_arrow(tbl), qm, qids, k).to_pandas()
        approx = ann_topk_ivfpq(store, qm, qids, k, nprobe=4,
                                refine=16).to_pandas()
        recalls = [
            len(set(exact[exact["qid"] == q]["vec_id"])
                & set(approx[approx["qid"] == q]["vec_id"])) / k
            for q in qids
        ]
        assert np.mean(recalls) >= 0.8, recalls
        for q in qids:  # self-match always found (query is a table row)
            top = approx[(approx["qid"] == q) & (approx["rank"] == 1)]["vec_id"]
            assert list(top) == [q]

        # axis 1 — row pruning: nprobe lists touch a strict subset
        probes = _probe_sets_for(meta, qm[:1], 4)[0]
        st = bucket_scan_stats(store, probes)
        assert st["row_groups_touched"] < st["row_groups_total"]
        # axis 2 — column pruning: the code column is an order of
        # magnitude smaller on disk than the embedding column
        f0 = pqt.ParquetFile(os.path.join(store, meta["files"][0]["path"]))
        code_b = emb_b = 0
        for rg in range(f0.metadata.num_row_groups):
            for ci in range(f0.metadata.num_columns):
                col = f0.metadata.row_group(rg).column(ci)
                if col.path_in_schema == "pq_code":
                    code_b += col.total_compressed_size
                if col.path_in_schema.startswith("embedding"):
                    emb_b += col.total_compressed_size
        assert code_b * 4 < emb_b, (code_b, emb_b)

    def test_rejects_non_ivfpq_store(self, ray_session, tmp_path):
        import pytest
        import ray.data

        from geomedea_ray.stages.ann import ann_topk_ivfpq, build_ivf_store

        tbl, allv, ids = TestBucketedStore._table(TestBucketedStore)
        store = str(tmp_path / "plain_ivf")
        build_ivf_store(ray.data.from_arrow(tbl), store, n_lists=8,
                        sample_rows=1000)
        with pytest.raises(ValueError):
            ann_topk_ivfpq(store, allv[:1], np.array([0]), 5)


def test_store_writer_refuses_nonempty_dir(ray_session, tmp_path):
    """_write_sorted_store's orphan sweep deletes unmanifested parquet;
    that is only safe on a fresh dir, so a dir already holding ANY
    parquet must be refused outright (never swept), while non-parquet
    foreign files survive the build untouched (round-4 verdict item 5)."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from geomedea_ray.stages.ann import build_bucketed_store

    rng = np.random.default_rng(3)
    n, dim = 64, 8
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(rng.normal(size=(n, dim)).astype(np.float32)),
                              pa.list_(pa.float32(), dim)),
    })

    live = tmp_path / "live_store"
    live.mkdir()
    foreign = live / "someone-elses-data.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3]}), foreign)
    with pytest.raises(RuntimeError, match="empty target dir"):
        build_bucketed_store(ray.data.from_arrow(tbl), str(live), nbits=4)
    assert foreign.exists()  # refused, not swept
    assert pq.ParquetFile(foreign).metadata.num_rows == 3

    fresh = tmp_path / "fresh_store"
    fresh.mkdir()
    marker = fresh / "NOTES.txt"
    marker.write_text("not a parquet file")
    meta = build_bucketed_store(ray.data.from_arrow(tbl), str(fresh), nbits=4)
    assert marker.read_text() == "not a parquet file"  # non-parquet survives
    assert sum(f["rows"] for f in meta["files"]) == n
