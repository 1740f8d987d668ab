"""Corpus-curation operators: PII redaction, repetition-quality
filtering (Gopher-style), and benchmark decontamination.

These are the scrub/filter stages of an LLM training-data pipeline
(brief: "the operations a large-scale training-data pipeline would
need").  All three are single-pass streaming ``map_batches`` stages —
no shuffle anywhere except the decontamination hit-count, which is
computed per batch against a broadcast benchmark-gram set (the
benchmark side is dimension-sized by definition, same broadcast
contract as nn_join / semi_join).

Oracles: pyarrow and DuckDB both use RE2 regexes, so redaction and
match counts are mirrored term-for-term; repetition metrics are pure
integer token statistics; decontamination joins on the literal 8-gram
string in SQL vs a broadcast set membership here — identical results,
hash-compared.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geomedea_ray.sources import tables

# RE2-compatible in BOTH engines (pyarrow and DuckDB embed RE2).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_RED = (("<EMAIL>", EMAIL_RE), ("<PHONE>", PHONE_RE), ("<IP>", IP_RE))


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized RE2 scrub: count then replace emails / 555-phones /
    10.x IPv4s.  Zero-copy Arrow in, Arrow out; no Python per row."""
    txt = batch[text_col]
    n_email = pc.count_substring_regex(txt, EMAIL_RE).cast(pa.int64())
    n_phone = pc.count_substring_regex(txt, PHONE_RE).cast(pa.int64())
    n_ip = pc.count_substring_regex(txt, IP_RE).cast(pa.int64())
    red = txt
    for token, pat in _RED:
        red = pc.replace_substring_regex(red, pat, token)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_email": n_email,
            "n_phone": n_phone,
            "n_ip": n_ip,
            "redacted": red,
        }
    )


def q_pii_redact(sf_dir: str):
    """PII redaction over the planted corpus: emails, phone numbers
    and internal IPs replaced with typed placeholders, per-doc match
    counts kept for the curation report.  Pure streaming map — the
    100 TB shape is exactly this shape."""
    import ray.data

    from geomedea_ray.sources.curation_fixture import curated_documents_path

    ds = ray.data.read_parquet(
        curated_documents_path(sf_dir), columns=["doc_id", "text"]
    )
    return ds.map_batches(redact_pii, batch_format="pyarrow", zero_copy_batch=True)


def pii_redact_sql(sf_dir: str) -> str:
    from geomedea_ray.sources.curation_fixture import curated_documents_path

    path = curated_documents_path(sf_dir)
    red = "text"
    for token, pat in _RED:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phone,
       len(regexp_extract_all(text, '{IP_RE}')) AS n_ip,
       {red} AS redacted
FROM '{path}'
"""


# ---------------------------------------------------------------------------
# repetition-quality filter (Gopher-style integer token statistics)
# ---------------------------------------------------------------------------

#: keep iff distinct-token ratio >= 2/5 AND top-token share <= 1/8
#: (exact integer cross-multiplication on both sides — no float ratio
#: ever crosses an engine boundary; thresholds sit mid-distribution,
#: measured p10/p50/p90 of the ratio = 0.32/0.46/0.75)
DISTINCT_NUM, DISTINCT_DEN = 2, 5
TOPTOK_DEN = 8


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Per-doc repetition metrics, vectorized: one explode + two
    grouped counts per batch (every doc lives wholly inside its row,
    so the metrics never cross batch boundaries — embarrassingly
    parallel at any scale)."""
    ids = batch["doc_id"].to_numpy()
    s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
    toks = s.str.split()
    ex = toks.explode().dropna()
    if len(ex) == 0:
        empty = pa.array([], pa.int64())
        return pa.table(
            {
                "doc_id": empty,
                "n_tokens": empty,
                "n_distinct": empty,
                "top_token_n": empty,
                "top_bigram_n": empty,
                "keep": pa.array([], pa.bool_()),
            }
        )
    idx = ex.index.to_numpy(np.int64)
    vals = ex.to_numpy()
    tc = pd.DataFrame({"i": idx, "t": vals}).groupby(["i", "t"], sort=False).size()
    g = tc.groupby(level=0)
    agg = pd.DataFrame(
        {"n_tokens": g.sum(), "n_distinct": g.size(), "top_token_n": g.max()}
    )
    # top bigram count per doc (0 for single-token docs)
    same_doc = idx[1:] == idx[:-1]
    top_bg = pd.Series(0, index=agg.index, dtype=np.int64)
    if same_doc.any():
        bi = idx[:-1][same_doc]
        bg = pd.Series(vals[:-1][same_doc]) + " " + pd.Series(vals[1:][same_doc])
        bc = pd.DataFrame({"i": bi, "g": bg.to_numpy()}).groupby(
            ["i", "g"], sort=False
        ).size()
        top_bg.update(bc.groupby(level=0).max())
    n_tok = agg["n_tokens"].to_numpy(np.int64)
    n_dis = agg["n_distinct"].to_numpy(np.int64)
    top_tok = agg["top_token_n"].to_numpy(np.int64)
    keep = (DISTINCT_DEN * n_dis >= DISTINCT_NUM * n_tok) & (
        TOPTOK_DEN * top_tok <= n_tok
    )
    return pa.table(
        {
            "doc_id": pa.array(ids[agg.index.to_numpy(np.int64)], pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "top_token_n": pa.array(top_tok, pa.int64()),
            "top_bigram_n": pa.array(top_bg.to_numpy(np.int64), pa.int64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition filter: per-doc token/distinct/top-token
    /top-bigram counts + an integer-exact keep verdict."""
    ds = tables.read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        repetition_stats, batch_format="pyarrow", zero_copy_batch=True
    )


DOC_REPETITION_SQL = f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
ex AS (SELECT doc_id, UNNEST(toks) AS tk FROM tok),
tc AS (SELECT doc_id, tk, COUNT(*) AS c FROM ex GROUP BY doc_id, tk),
agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct, MAX(c) AS top_token_n
        FROM tc GROUP BY doc_id),
bg AS (SELECT doc_id,
              UNNEST(list_transform(range(1, len(toks)),
                                    i -> array_to_string(toks[i:i+1], ' '))) AS g
       FROM tok),
bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
bm AS (SELECT doc_id, MAX(c) AS top_bigram_n FROM bc GROUP BY doc_id)
SELECT agg.doc_id, n_tokens, n_distinct, top_token_n,
       COALESCE(bm.top_bigram_n, 0) AS top_bigram_n,
       ({DISTINCT_DEN} * n_distinct >= {DISTINCT_NUM} * n_tokens
        AND {TOPTOK_DEN} * top_token_n <= n_tokens) AS keep
FROM agg LEFT JOIN bm ON agg.doc_id = bm.doc_id
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (8-gram overlap vs a broadcast eval set)
# ---------------------------------------------------------------------------


def decontaminate(ds, grams: list[str], w: int = 8):
    """Flag corpus docs sharing any ``w``-gram with the benchmark set.

    The benchmark grams are broadcast ONCE (`ray.put`) and probed as a
    set inside every batch; the corpus side streams — no shuffle, no
    materialization.  Returns (doc_id, n_hits, contaminated) for every
    input doc."""
    import ray

    from geomedea_ray.util import get_once

    ref = ray.put(frozenset(grams))

    def _scan(batch: pa.Table) -> pa.Table:
        bench = get_once(ref)
        ids = batch["doc_id"].to_numpy()
        s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
        ex = s.str.split().explode().dropna()
        n_hits = np.zeros(len(ids), np.int64)
        if len(ex):
            idx = ex.index.to_numpy(np.int64)
            vals = ex.to_numpy()
            ok = np.ones(max(len(vals) - (w - 1), 0), bool)
            if len(ok):
                for j in range(1, w):
                    ok &= idx[j : j + len(ok)] == idx[:len(ok)]
                gi = idx[: len(ok)][ok]
                parts = pd.Series(vals[: len(ok)][ok])
                for j in range(1, w):
                    parts = parts + " " + pd.Series(vals[j : j + len(ok)][ok])
                hit = parts.isin(bench).to_numpy()
                if hit.any():
                    hits = (
                        pd.DataFrame({"i": gi[hit], "g": parts.to_numpy()[hit]})
                        .drop_duplicates()
                        .groupby("i")
                        .size()
                    )
                    n_hits[hits.index.to_numpy(np.int64)] = hits.to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )

    return ds.map_batches(_scan, batch_format="pyarrow", zero_copy_batch=True)


def q_decontaminate(sf_dir: str):
    """Test-set decontamination over the planted corpus: distinct
    benchmark 8-grams hit per doc + the contamination verdict, for
    every non-benchmark doc."""
    import ray.data

    from geomedea_ray.sources.curation_fixture import (
        BENCH_MOD,
        GRAM_W,
        bench_grams,
        curated_documents_path,
    )

    def _non_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return batch.filter(pa.array(ids % BENCH_MOD != 0))

    ds = ray.data.read_parquet(
        curated_documents_path(sf_dir), columns=["doc_id", "text"]
    ).map_batches(_non_bench, batch_format="pyarrow", zero_copy_batch=True)
    return decontaminate(ds, bench_grams(sf_dir), w=GRAM_W)


def decontaminate_sql(sf_dir: str) -> str:
    from geomedea_ray.sources.curation_fixture import (
        BENCH_MOD,
        GRAM_AT,
        GRAM_W,
        curated_documents_path,
    )

    path = curated_documents_path(sf_dir)
    # 1-indexed inclusive slice: python toks[3:11] == SQL toks[4:11]
    lo, hi = GRAM_AT + 1, GRAM_AT + GRAM_W
    return f"""
WITH corpus AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM '{path}' WHERE doc_id % {BENCH_MOD} <> 0),
bench AS (
  SELECT DISTINCT array_to_string(toks[{lo}:{hi}], ' ') AS g
  FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id % {BENCH_MOD} = 0)
  WHERE len(toks) >= {hi}),
grams AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(range(1, len(toks) - {GRAM_W - 2}),
                               i -> array_to_string(toks[i:i+{GRAM_W - 1}], ' '))) AS g
  FROM corpus),
hits AS (SELECT doc_id, COUNT(*) AS n_hits
         FROM grams JOIN bench USING (g) GROUP BY doc_id)
SELECT corpus.doc_id, COALESCE(hits.n_hits, 0) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
"""


# ---------------------------------------------------------------------------
# concat-and-chunk sequence packing (token-budget binning)
# ---------------------------------------------------------------------------

#: tokens per packed training sequence (shared with the SQL mirror)
PACK_BUDGET = 2048


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing — the LLM-pretraining step
    that concatenates the tokenized corpus in a canonical order and
    slices it into fixed-budget training sequences.  Each doc gets the
    bin (sequence id) and offset where it STARTS: bin = exclusive
    prefix sum of token counts // budget, via the exact banded
    prefix scan (stages/joins.banded_prefix_sum — per-band partials +
    driver carry, ONE band-grouped pass; nothing row-sized crosses the
    wire except the band co-shuffle)."""
    import pyarrow.compute as _pc

    from geomedea_ray.stages.joins import banded_prefix_sum
    from geomedea_ray.stages.text_stages import add_token_count

    ds = tables.read(sf_dir, "documents", columns=["doc_id", "text"])
    toks = ds.map_batches(add_token_count, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )
    packed = banded_prefix_sum(toks, order_col="doc_id", val_col="n_tokens")

    def _bins(df: pd.DataFrame) -> pd.DataFrame:
        cum0 = df["cum0"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": df["n_tokens"].to_numpy(np.int64),
                "bin_id": cum0 // PACK_BUDGET,
                "bin_offset": cum0 % PACK_BUDGET,
            }
        )

    return packed.map_batches(_bins, batch_format="pandas")


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
  FROM t)
SELECT doc_id, n_tokens,
       cum0 // {PACK_BUDGET} AS bin_id,
       cum0 % {PACK_BUDGET} AS bin_offset
FROM c
"""
