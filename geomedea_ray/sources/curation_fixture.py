"""Planted-PII + planted-contamination corpus fixture.

The synthetic documents table is a clean word salad — no emails, no
phone numbers, and (measured) no 8-gram shared between any two docs —
so a PII-redaction or benchmark-decontamination query over the raw
table would verify an empty result (the round-1 vacuousness lesson,
see planted_embeddings.py).  This fixture derives a corpus from the
documents table (read-only input) with deterministic splices:

* PII tokens by ``doc_id % 5``: an email (``%5==0``), a 555-line phone
  number (``%5==1``) or a 10.x.y.z IPv4 (``%5==2``), inserted at a
  doc_id-derived token position;
* benchmark contamination: every ``doc_id % 101 == 0`` document's
  tokens[3:11] window is the "benchmark item" set (these play the role
  of scraped eval questions), and every ``doc_id % 7 == 3``
  non-benchmark document gets one of those 8-gram windows spliced in.

Everything is a pure function of doc_id + the source text, so the
DuckDB oracles recompute detection from the SAME fixture parquet and
hash-compare exactly.  Published through sources/cache.cached_file
(counted marker, atomic rename, footer re-validation on every load).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/geomedea_ray_cache"

#: benchmark membership + gram window (mirrored in SQL: toks[4:11])
BENCH_MOD = 101
GRAM_W = 8
GRAM_AT = 3
#: contamination splice target: doc_id % 7 == 3, non-benchmark docs
CONTAM_MOD, CONTAM_RES = 7, 3


def _pii_token(doc_id: int) -> str | None:
    r = doc_id % 5
    if r == 0:
        return f"user{doc_id}@example.com"
    if r == 1:
        return f"555-{doc_id % 10000:04d}"
    if r == 2:
        return f"10.{(doc_id * 7) % 256}.{(doc_id * 13) % 256}.{doc_id % 256}"
    return None


def bench_grams(sf_dir: str) -> list[str]:
    """The benchmark 8-gram strings, from the ORIGINAL documents table
    (doc_id % 101 == 0, tokens[3:11]).  Dimension-sized by definition
    (one short string per benchmark item) — the broadcast side of the
    decontamination scan."""
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if doc_id % BENCH_MOD != 0:
            continue
        toks = (text or "").split()
        if len(toks) >= GRAM_AT + GRAM_W:
            out.append(" ".join(toks[GRAM_AT : GRAM_AT + GRAM_W]))
    return sorted(set(out))


def curated_documents_path(sf_dir: str, cache_root: str = CACHE_ROOT) -> str:
    """Materialize (or reuse) the planted corpus for this sf; returns
    the parquet file path.  Single-process (safe from oracle_sql())."""
    from geomedea_ray.sources.cache import cached_file

    tag = os.path.basename(os.path.normpath(sf_dir))
    # v2: PII-before-gram splice order (content change, same row count
    # — the counted marker can't distinguish, so the NAME carries the
    # format version)
    out = os.path.join(cache_root, f"documents_curated_v2_{tag}.parquet")
    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    def _build(tmp: str) -> None:
        grams = bench_grams(sf_dir)
        src = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        ids = src["doc_id"].to_pylist()
        texts = src["text"].to_pylist()
        out_text, planted_pii, planted_gram = [], [], []
        for doc_id, text in zip(ids, texts):
            toks = (text or "").split()
            contaminated = (
                bool(grams)
                and doc_id % CONTAM_MOD == CONTAM_RES
                and doc_id % BENCH_MOD != 0
            )
            # PII first, gram second: the gram splice inserts one
            # contiguous block, so planted docs ALWAYS contain the
            # 8-gram intact (a PII token inserted afterwards could
            # land inside the gram window and split it)
            pii = _pii_token(doc_id)
            if pii is not None:
                toks.insert(doc_id % (len(toks) + 1), pii)
            if contaminated:
                g = grams[(doc_id // CONTAM_MOD) % len(grams)]
                p = min(doc_id % 13, len(toks))
                toks[p:p] = g.split()
            out_text.append(" ".join(toks))
            planted_pii.append(pii is not None)
            planted_gram.append(contaminated)
        pq.write_table(
            pa.table(
                {
                    "doc_id": src["doc_id"],
                    "text": pa.array(out_text, pa.string()),
                    "lang": src["lang"],
                    "planted_pii": pa.array(planted_pii, pa.bool_()),
                    "planted_gram": pa.array(planted_gram, pa.bool_()),
                }
            ),
            tmp,
            compression="zstd",
        )

    return cached_file(out, _build, expected_rows=n)
