"""Differential tests for relational operators whose gate oracles
can't reach their edge cases at fixture scale."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_events_props_agg_null_semantics(ray_session, tmp_path):
    """Rows whose props carry no top-level integer ``k`` must count in
    ``n`` (COUNT(*)) but be EXCLUDED from sum/max (DuckDB SUM/MAX skip
    NULL; an all-miss group yields null sum/max) — the round-4 ADVICE
    fix: the old code raised on any regex miss. Verified differentially
    against DuckDB's real JSON parser over the same strings."""
    import duckdb

    from geomedea_ray.pipelines.relational import events_props_agg

    rows = [
        ("a", '{"k": 5}'),
        ("a", '{"x": 1}'),          # miss: no k at all
        ("a", '{"k": 10}'),
        ("b", '{}'),                # miss
        ("b", '{"j": 2}'),          # miss: group b has NULL sum/max
        ("c", '{"m": 3, "k": -7}'), # k after another key (comma anchor)
        ("c", '{ "k" : 12}'),       # whitespace around key/colon
    ]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "props": pa.array([r[1] for r in rows], pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (events_props_agg(str(tmp_path)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))

    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute("""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """).df()

    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n"].astype(np.int64).tolist() == want["n"].tolist()
    for col in ("sum_k", "max_k"):
        g = got[col]
        w = want[col]
        for i in range(len(g)):
            if pd.isna(w.iloc[i]):
                assert pd.isna(g.iloc[i]), f"{col}[{i}] should be null"
            else:
                assert int(g.iloc[i]) == int(w.iloc[i])
    # group b (all misses) really exercised the null path
    b = got[got["event_type"] == "b"].iloc[0]
    assert b["n"] == 2 and pd.isna(b["sum_k"]) and pd.isna(b["max_k"])
