"""Operator-level dedup tests with planted duplicates and brute-force
oracles (the sharded-group pattern in stages/dedup.py must find
exactly what an O(n²) scan finds)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geomedea_ray.functions import text as T
from geomedea_ray.stages.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)


def _pair_set(df: pd.DataFrame) -> set:
    return {(a, b) for a, b in zip(df["id_a"], df["id_b"])}


@pytest.fixture(scope="module")
def doc_table():
    """120 random docs + 12 planted near-identical pairs."""
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(400)]
    ids, texts = [], []
    for i in range(120):
        ids.append(f"d{i:04d}")
        texts.append(" ".join(rng.choice(words, 40)))
    planted = []
    for j in range(12):
        base = texts[j * 3]
        toks = base.split()
        toks[5] = "CHANGED"  # 1 of 40 tokens differs → jaccard ~0.85
        ids.append(f"dup{j:04d}")
        texts.append(" ".join(toks))
        planted.append((f"d{j * 3:04d}", f"dup{j:04d}"))
    return pa.table({"doc_id": ids, "text": texts}), planted


class TestMinhashPairs:
    def test_planted_neardups_found(self, ray_session, doc_table):
        import ray.data

        tbl, planted = doc_table
        ds = ray.data.from_arrow(tbl)
        pairs = _pair_set(minhash_lsh_pairs(ds).to_pandas())
        for a, b in planted:
            assert (a, b) in pairs, f"missing planted near-dup ({a},{b})"

    def test_pairs_unique_and_canonical(self, ray_session, doc_table):
        import ray.data

        tbl, _ = doc_table
        df = minhash_lsh_pairs(ray.data.from_arrow(tbl)).to_pandas()
        assert (df["id_a"] < df["id_b"]).all()
        assert not df.duplicated(["id_a", "id_b"]).any()

    def test_verify_threshold_filters(self, ray_session, doc_table):
        import ray.data

        tbl, planted = doc_table
        texts_by_id = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
        df = minhash_lsh_pairs(
            ray.data.from_arrow(tbl), verify_threshold=0.5, texts_by_id=texts_by_id
        ).to_pandas()
        got = _pair_set(df)
        # exactly the pairs whose true jaccard >= 0.5 among candidates:
        # planted pairs qualify, random ones don't
        for a, b in planted:
            assert (a, b) in got
        for a, b in got:
            assert T.jaccard_words(texts_by_id[a], texts_by_id[b]) >= 0.5


class TestSimhashPairs:
    def test_matches_bruteforce_within_radius(self, ray_session, doc_table):
        import ray.data

        tbl, planted = doc_table
        ds = ray.data.from_arrow(tbl)
        got = _pair_set(simhash_pairs(ds, max_hamming=6).to_pandas())
        # brute-force oracle: all pairs with hamming <= 6 AND sharing a
        # 16-bit band (the LSH guarantee is band-conditional)
        ids = tbl["doc_id"].to_pylist()
        h = T.simhash64(tbl["text"].to_pylist()).astype(np.uint64)
        expect = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x = int(h[i] ^ h[j])
                if bin(x).count("1") <= 6 and any(
                    (int(h[i]) >> (16 * b)) & 0xFFFF == (int(h[j]) >> (16 * b)) & 0xFFFF
                    for b in range(4)
                ):
                    expect.add(tuple(sorted((ids[i], ids[j]))))
        assert got == expect
        # planted docs differ in 1/40 tokens; most (not all) stay
        # within the radius — the exact-oracle equality above is the
        # real correctness claim, this guards against zero recall
        found = sum((a, b) in got for a, b in planted)
        assert found >= len(planted) // 2


class TestEmbeddingNeardup:
    def test_planted_matches_bruteforce(self, ray_session):
        import ray.data

        rng = np.random.default_rng(5)
        vecs = rng.normal(size=(200, 32))
        ids = [f"v{i:04d}" for i in range(200)]
        # plant 15 near-dups: tiny perturbations of existing vectors
        for j in range(15):
            vecs = np.vstack([vecs, vecs[j * 2] + rng.normal(scale=0.02, size=32)])
            ids.append(f"nd{j:04d}")
        tbl = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32(), 32)),
            }
        )
        got = _pair_set(
            embedding_neardup_pairs(ray.data.from_arrow(tbl), min_cosine=0.98).to_pandas()
        )
        m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = m @ m.T
        np.fill_diagonal(sims, -1)
        ii, jj = np.where(np.triu(sims, 1) >= 0.98)
        expect = {tuple(sorted((ids[i], ids[j]))) for i, j in zip(ii, jj)}
        assert len(expect) >= 15
        # banded multi-table LSH (8×10-bit): a pair at cosine ≥0.98
        # misses ALL tables with prob ≈ (1-(1-θ/π)^10)^8 ≈ 3e-3, and
        # the draw is seeded — with this fixture recall is exactly 1,
        # so the distributed result equals the brute-force oracle
        assert got == expect


class TestHotBucketCap:
    def test_degenerate_identical_docs_bounded(self, ray_session):
        """5k identical docs share every LSH band — without the
        hot-bucket cap each band bucket generates ~12.5M pairs × 16
        bands (minutes of quadratic work); with the cap the buckets
        are skipped with a log and the run is near-instant."""
        import time

        import ray.data

        n = 5000
        tbl = pa.table(
            {
                "doc_id": [f"d{i:05d}" for i in range(n)],
                "text": ["the same exact document text repeated verbatim"] * n,
            }
        )
        t0 = time.time()
        df = minhash_lsh_pairs(ray.data.from_arrow(tbl)).to_pandas()
        assert time.time() - t0 < 60
        # every bucket exceeds the cap → no pairs emitted (exact dedup
        # is the right operator for mass-identical corpora)
        assert len(df) == 0

    def test_cap_off_small_bucket_unaffected(self, ray_session, doc_table):
        import ray.data

        tbl, _ = doc_table
        with_cap = _pair_set(minhash_lsh_pairs(ray.data.from_arrow(tbl)).to_pandas())
        no_cap = _pair_set(
            minhash_lsh_pairs(ray.data.from_arrow(tbl), max_bucket=None).to_pandas()
        )
        assert with_cap == no_cap


class TestPlantedEmbeddings:
    def test_fixture_and_recall_vs_exact_oracle(self, ray_session, tmp_path):
        """The gate's embedding_neardup query: planted table, LSH
        pairs == exact all-pairs cosine ≥ 0.95 (full recall on planted
        near-dups, no false positives)."""
        import ray.data

        from geomedea_ray.sources.planted_embeddings import planted_embeddings_path

        p = planted_embeddings_path("/root/testdata/sf0.001", cache_root=str(tmp_path))
        import pyarrow.parquet as pq

        t = pq.read_table(p)
        assert pa.types.is_fixed_size_list(t.schema.field("embedding").type)
        ids = t["vec_id"].to_numpy()
        m = np.stack([np.asarray(v) for v in t["embedding"].to_pylist()]).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ii, jj = np.where(np.triu(sims, 1) >= 0.95)
        expect = {tuple(sorted((int(ids[i]), int(ids[j])))) for i, j in zip(ii, jj)}
        assert len(expect) > 0

        got = _pair_set(
            embedding_neardup_pairs(
                ray.data.read_parquet(p), min_cosine=0.95
            ).to_pandas()
        )
        got = {(int(a), int(b)) for a, b in got}
        assert got == expect


class TestDedupExact:
    def test_min_order_kept_string_key(self, ray_session):
        import ray.data

        tbl = pa.table(
            {
                "k": ["a", "b", "a", "c", "b", "a"],
                "ord": ["z5", "z2", "z1", "z9", "z0", "z3"],
                "val": [1, 2, 3, 4, 5, 6],
            }
        )
        df = dedup_exact(ray.data.from_arrow(tbl), "k", "ord").to_pandas()
        got = dict(zip(df["k"], df["val"]))
        assert got == {"a": 3, "b": 5, "c": 4}
        assert "_shard" not in df.columns


class TestSimhashExactBands:
    def test_eight_band_candidates_complete(self, ray_session, doc_table):
        """8 bands × 8 bits + max_hamming=7: pigeonhole makes the
        banded candidate set complete, so the output must equal the
        UNCONDITIONAL brute-force ≤7-Hamming pair set."""
        import ray.data

        tbl, _ = doc_table
        ds = ray.data.from_arrow(tbl)
        got = _pair_set(
            simhash_pairs(ds, max_hamming=7, num_tables=8, max_bucket=None).to_pandas()
        )
        ids = tbl["doc_id"].to_pylist()
        h = T.simhash64(tbl["text"].to_pylist()).astype(np.uint64)
        expect = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if bin(int(h[i] ^ h[j])).count("1") <= 7:
                    expect.add(tuple(sorted((ids[i], ids[j]))))
        assert got == expect

    def test_scalar_fixture_simhash_matches_vectorized(self):
        """The independent per-token scalar implementation behind the
        simhash_verified SQL oracle must agree bit-for-bit with
        functions/text.simhash64."""
        import pandas as pd

        texts = ["the quick brown fox", "", "a", "the the the unique",
                 "словарь тест", "x y z " * 30]
        vec = T.simhash64(texts)
        for text, expect in zip(texts, vec):
            toks = (text or "").split()
            if not toks:
                assert expect == 0
                continue
            hs = pd.util.hash_pandas_object(
                pd.Series(toks, dtype="object"), index=False,
                hash_key="geomedea_ray_01!",
            ).to_numpy(np.uint64)
            acc = [0] * 64
            for hv in hs:
                hv = int(hv)
                for b in range(64):
                    acc[b] += 1 if (hv >> b) & 1 else -1
            packed = sum(1 << b for b in range(64) if acc[b] > 0)
            signed = packed - (1 << 64) if packed >= (1 << 63) else packed
            assert signed == int(expect), text


class TestJaccardJoin:
    """Exact prefix-filtered set-similarity join (stages/dedup.
    jaccard_join) vs brute force, on BOTH verify plans."""

    DOCS = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g x"),      # J=5/7 with 0
        (2, "p q r s t u v w"),
        (3, "p q r s t u v w"),      # exact dup of 2
        (4, "z z z"),                # single shingle
        (5, "z z z"),                # dup of 4
        (6, "totally different words over here friend"),
        (7, ""),                     # empty shingle set
        (8, "   "),                  # empty shingle set
    ]

    def _truth(self, threshold):
        import itertools

        from geomedea_ray.functions.text import word_shingles

        num, den = threshold
        want = []
        for (a, ta), (b, tb) in itertools.combinations(self.DOCS, 2):
            sa, sb = set(word_shingles(ta)), set(word_shingles(tb))
            inter, union = len(sa & sb), len(sa | sb)
            if den * inter >= num * union:
                want.append((a, b, inter, len(sa), len(sb)))
        return sorted(want)

    def _run(self, threshold, broadcast_bytes):
        import ray.data

        import geomedea_ray.stages.dedup as D

        old = D.VERIFY_BROADCAST_BYTES
        D.VERIFY_BROADCAST_BYTES = broadcast_bytes
        try:
            ds = ray.data.from_items(
                [{"doc_id": i, "text": t} for i, t in self.DOCS])
            rows = D.jaccard_join(ds, threshold=threshold,
                                  num_shards=4).take_all()
        finally:
            D.VERIFY_BROADCAST_BYTES = old
        return sorted((r["id_a"], r["id_b"], r["inter"],
                       r["size_a"], r["size_b"]) for r in rows)

    def test_broadcast_plan_matches_brute_force(self, ray_session):
        assert self._run((2, 5), 256 << 20) == self._truth((2, 5))

    def test_join_plan_matches_brute_force(self, ray_session):
        assert self._run((2, 5), 0) == self._truth((2, 5))

    def test_higher_threshold(self, ray_session):
        assert self._run((4, 5), 256 << 20) == self._truth((4, 5))

    def test_empty_docs_pair_mutually(self, ray_session):
        out = self._run((1, 2), 256 << 20)
        assert (7, 8, 0, 0, 0) in out

    def test_empty_cap_raises(self, ray_session):
        import pytest
        import ray.data

        import geomedea_ray.stages.dedup as D

        ds = ray.data.from_items(
            [{"doc_id": i, "text": ""} for i in range(5)])
        with pytest.raises(ValueError, match="empty_cap"):
            D.jaccard_join(ds, num_shards=2, empty_cap=3).take_all()

    def test_prefix_filter_is_complete_random(self, ray_session):
        """Randomized completeness check: prefix+positional filters
        must lose nothing vs brute force (seeded, both plans)."""
        import numpy as np

        rng = np.random.default_rng(42)
        vocab = [f"w{i}" for i in range(12)]  # small vocab -> high overlap
        docs = [(i, " ".join(rng.choice(vocab, size=rng.integers(3, 15))))
                for i in range(40)]
        old_docs = self.DOCS
        try:
            type(self).DOCS = docs
            assert self._run((2, 5), 256 << 20) == self._truth((2, 5))
            assert self._run((3, 5), 0) == self._truth((3, 5))
        finally:
            type(self).DOCS = old_docs


class TestParagraphDedup:
    def _corpus(self):
        # docs 0 & 1 share chunk "a b c d"; docs 1 & 2 share "x y z w";
        # doc 3 is entirely made of the shared chunk (drops out);
        # doc 4 repeats a chunk INSIDE itself only (must survive —
        # min_docs counts DISTINCT docs, not occurrences)
        return pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b c d k1 k2 k3 k4",
                "a b c d x y z w m1 m2 m3 m4",
                "x y z w n1 n2 n3 n4 tail",
                "a b c d",
                "p q r s p q r s",
            ],
        })

    def _expect(self):
        return {
            0: ("k1 k2 k3 k4", 1),
            1: ("m1 m2 m3 m4", 1),
            2: ("n1 n2 n3 n4 tail", 2),
            4: ("p q r s p q r s", 2),
        }

    def _check(self, out):
        got = {int(r.doc_id): (r.text_clean, int(r.n_kept))
               for r in out.itertuples()}
        assert got == self._expect()

    def test_planted_broadcast_plan(self, ray_session):
        import ray.data

        from geomedea_ray.stages.dedup import paragraph_dedup

        out = paragraph_dedup(
            ray.data.from_pandas(self._corpus()).repartition(3),
            words_per_chunk=4, min_docs=2, num_shards=4,
        ).to_pandas()
        self._check(out)

    def test_planted_sharded_anti_plan(self, ray_session):
        import ray.data

        from geomedea_ray.stages.dedup import paragraph_dedup

        out = paragraph_dedup(
            ray.data.from_pandas(self._corpus()).repartition(3),
            words_per_chunk=4, min_docs=2, num_shards=4,
            broadcast_cap_bytes=0,  # force the key-partitioned anti path
        ).to_pandas()
        self._check(out)

    def test_min_docs_three_keeps_pairwise_dups(self, ray_session):
        import ray.data

        from geomedea_ray.stages.dedup import paragraph_dedup

        out = paragraph_dedup(
            ray.data.from_pandas(self._corpus()).repartition(2),
            words_per_chunk=4, min_docs=3, num_shards=4,
        ).to_pandas()
        # "a b c d" is in docs 0/1/3 (3 distinct) -> still dropped;
        # "x y z w" (2 docs) now survives; doc 3 disappears entirely
        got = {int(r.doc_id): int(r.n_kept) for r in out.itertuples()}
        assert got == {0: 1, 1: 2, 2: 3, 4: 2}
