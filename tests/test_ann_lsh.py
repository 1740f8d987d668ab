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
