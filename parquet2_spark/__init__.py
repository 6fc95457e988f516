"""parquet2_spark — a PySpark-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the capabilities of the reference
``jorgecarleitao/parquet2`` (a Rust Parquet IO crate: encodings, compression,
statistics, page indexes, bloom filters), re-expressed Spark-first:

- ``codecs/``    pure numpy/Arrow encode/decode kernels (no Spark imports);
                 each Spark partition plays the role of a parquet2 "column
                 chunk", each Arrow batch inside a vectorized UDF plays the
                 role of a "page" (reference model: src/page/mod.rs).
- ``functions/`` per-batch statistics + the stats-driven codec auto-selector
                 (the reference exposes encodings and lets writers choose —
                 README.md:95-99; the selector is our novel piece).
- ``operators/`` Spark jobs: encode / decode / validate / stats, plus
                 training-data-pipeline operators (dedup, similarity search,
                 text analysis, multimodal plumbing).
- ``sources/``   deterministic synthetic web-page table generator (the
                 BASELINE.json input_hint schema) and test-data loaders.
- ``plans/``     pruning helpers: zone-map chunk/page filters, bloom filters
                 (reference: src/indexes/*, src/bloom_filter/*).
- ``streaming/`` Structured Streaming encode path.
"""

__version__ = "0.1.0"
