"""geomedea_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the *capabilities* of
michaelkirk/geomedea (reference at /root/reference) as distributed Ray
Data operators over Arrow tables of image+caption rows:

- Hilbert-curve spatial ordering (bit-compatible with the reference's
  ``writer/hilbert.rs``) expressed as ``map_batches`` + a
  range-partitioned ``Dataset.sort`` shuffle,
- packed per-partition R-tree indexes (reference:
  ``packed_r_tree/``) built as numpy arrays beside partitioned
  Parquet, pruned by a driver-side manifest,
- bbox-slice / point-in-polygon / kNN / tile-assignment queries,
- image codec stages (actor pools), dedup (exact/MinHash/SimHash),
  text analysis, embedding similarity search,
- per-partition lineage + checkpoint log for resumable runs.

Layout:
  functions/  pure vectorized math (hilbert, geo, cells, codecs, text)
  sources/    deterministic synth tables + testdata-derived views
  stages/     map_batches stage functions & actor classes
  pipelines/  end-to-end pipelines (spatial write, queries, flagship)
  state/      manifest + checkpoint/lineage log
"""

__version__ = "0.1.0"
