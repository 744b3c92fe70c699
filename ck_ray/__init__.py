"""ck_ray — a Ray-Data-native full-text (BM25) index + query engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference ``ck`` code-search engine (szavadsky/ck), expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches:

- SPIMI-style inverted-index build: tokenize -> (term, doc_id, tf[, positions])
  triples -> ``groupby(term)`` shuffle -> delta-encoded varint posting lists
  with skip blocks and block-max metadata (``ck_ray.build``).
- Stateful actor-pool query stage answering top-k BM25 queries
  (``ck_ray.query``), rank-identical to the pure-Python oracle
  (``ck_ray.oracle``).
- Regex / semantic / hybrid-RRF search parity (``ck_ray.regex_search``,
  ``ck_ray.semantic``).
- Large-scale training-data operators: dedup, text analysis, ANN
  (``ck_ray.ops``).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
