"""Text-analysis stages: token counts, quality scores, language ID,
fingerprints — thin vectorized map_batches wrappers over
functions/text.py (task brief; no reference counterpart)."""

from __future__ import annotations

import pyarrow as pa

from geomedea_ray.functions import text as T


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    n = T.token_count(batch[text_col].to_pylist())
    return batch.append_column("n_tokens", pa.array(n, pa.int64()))


def add_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    qs = T.quality_stats(batch[text_col].to_pylist())
    out = batch
    for name in ("n_tokens", "alpha_ratio", "punct_ratio", "upper_ratio"):
        typ = pa.int64() if name == "n_tokens" else pa.float64()
        out = out.append_column(name, pa.array(qs[name], typ))
    return out


class LangIdStage:
    """Actor stage: language-ID heuristic (stopword tables built once
    per actor — the canonical stateful-stage shape even though these
    tables are tiny; a real fasttext model would load here)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # force lazy tables/regex compilation once
        T.detect_lang(["warmup the and of"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = T.detect_lang(batch[self.text_col].to_pylist())
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fp = T.fingerprint64(batch[text_col].to_pylist())
    return batch.append_column("fp64", pa.array(fp, pa.int64()))


def quality_filter(batch: pa.Table, min_tokens: int = 5, max_punct_ratio: float = 0.3,
                   text_col: str = "text") -> pa.Table:
    """Drop low-quality rows (vectorized predicate inside the batch)."""
    qs = T.quality_stats(batch[text_col].to_pylist())
    keep = (qs["n_tokens"] >= min_tokens) & (qs["punct_ratio"] <= max_punct_ratio)
    return batch.filter(pa.array(keep))
