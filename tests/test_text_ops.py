"""Vocabulary / quantile operators (pipelines/text_queries.py): exact
semantics vs plain-pandas references at sf0.001, plus edge cases the
sf-scale SQL oracle can't isolate."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from geomedea_ray.pipelines.text_queries import (
    NGRAM_TOP_K,
    QUANTILE_LEVELS,
    q_lang_token_quantiles,
    q_top_ngrams,
)
from geomedea_ray.sources import tables


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(tables.path(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"]).to_pandas()


def _bigram_counts(texts) -> pd.Series:
    rows = []
    for t in texts:
        toks = (t or "").split()
        rows.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    return pd.Series(rows).value_counts()


class TestTopNgrams:
    def test_matches_reference(self, ray_session, sf_dir, docs):
        got = q_top_ngrams(sf_dir).to_pandas()
        ref = _bigram_counts(docs["text"]).rename_axis("ngram").reset_index(name="n")
        ref = ref.sort_values(["n", "ngram"], ascending=[False, True]).head(NGRAM_TOP_K)
        got = got.sort_values(["n", "ngram"], ascending=[False, True]).reset_index(drop=True)
        assert got["ngram"].tolist() == ref["ngram"].tolist()
        assert got["n"].tolist() == ref["n"].tolist()


class TestDocTfidf:
    def test_matches_pandas_reference(self, ray_session, sf_dir, docs):
        from geomedea_ray.pipelines.text_queries import TFIDF_TOP_K, q_doc_tfidf

        got = (q_doc_tfidf(sf_dir).to_pandas()
               .sort_values(["doc_id", "rank"]).reset_index(drop=True))
        # reference: plain-pandas TF-IDF with the identical integer score
        n = len(docs)
        rows = []
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            toks = [t for t in (text or "").split(" ") if t != ""]
            for term, tf in pd.Series(toks).value_counts().items():
                rows.append((doc_id, term, int(tf)))
        tfd = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
        df_counts = tfd.groupby("term").size()
        tfd["score"] = tfd["tf"] * (
            (1_000_000 * n) // df_counts.reindex(tfd["term"]).to_numpy(np.int64)
        )
        tfd = tfd.sort_values(["doc_id", "score", "term"],
                              ascending=[True, False, True], kind="mergesort")
        tfd["rank"] = tfd.groupby("doc_id").cumcount() + 1
        ref = tfd[tfd["rank"] <= TFIDF_TOP_K].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["doc_id", "term", "tf", "score", "rank"]],
            ref[["doc_id", "term", "tf", "score", "rank"]],
            check_dtype=False,
        )


class TestLangTokenQuantiles:
    def test_matches_reference(self, ray_session, sf_dir, docs):
        got = q_lang_token_quantiles(sf_dir).to_pandas().set_index("lang").sort_index()
        nt = docs["text"].fillna("").str.split().str.len()
        for lang, g in pd.DataFrame({"lang": docs["lang"], "nt": nt}).groupby("lang"):
            v = np.sort(g["nt"].to_numpy())
            assert got.loc[lang, "n_docs"] == len(v)
            for q in QUANTILE_LEVELS:
                rank = int(np.ceil(q * len(v)))
                assert got.loc[lang, f"p{int(q*100)}"] == v[rank - 1], (lang, q)

    def test_partition_invariant(self, ray_session, sf_dir):
        a = q_lang_token_quantiles(sf_dir).to_pandas().sort_values("lang").reset_index(drop=True)
        b = q_lang_token_quantiles(sf_dir).to_pandas().sort_values("lang").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestWinnowFingerprints:
    def test_shared_run_guarantee(self):
        """Winnowing guarantee: token runs of length >= w + k - 1 = 6
        shared between two documents share at least one fingerprint."""
        from geomedea_ray.functions.text import winnow_fingerprints

        run = "alpha beta gamma delta epsilon zeta eta"
        a = winnow_fingerprints("x1 y2 " + run + " z3")
        b = winnow_fingerprints(run + " q9 r8 s7")
        assert len(np.intersect1d(a, b)) >= 1

    def test_disjoint_docs_disjoint_fps(self):
        from geomedea_ray.functions.text import winnow_fingerprints

        a = winnow_fingerprints("aa bb cc dd ee ff gg")
        b = winnow_fingerprints("hh ii jj kk ll mm nn")
        assert len(np.intersect1d(a, b)) == 0

    def test_short_and_empty(self):
        from geomedea_ray.functions.text import winnow_fingerprints

        assert winnow_fingerprints("").tolist() == []
        assert len(winnow_fingerprints("one")) == 1
        assert len(winnow_fingerprints("one two")) == 1

    def test_fold_matches_duckdb(self):
        """The token fold is DuckDB's list_reduce bit-for-bit."""
        import duckdb

        from geomedea_ray.functions.text import _fp_fold

        con = duckdb.connect()
        for tok in ("hello", "x", "Zürich", "a1b2c3"):
            got = _fp_fold([ord(c) for c in tok])
            want = con.execute(
                "SELECT list_reduce(list_transform(string_split_regex(?, ''),"
                " c -> CAST(unicode(c) AS BIGINT)),"
                " (a, x) -> (a*131 + x) % 1000000007)", [tok]).fetchone()[0]
            assert got == want, tok
