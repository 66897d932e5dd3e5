"""boris_spark — a from-scratch PySpark-native distributed crawl + analytics
engine with the query/data-processing capabilities of emdonahue/boris.

Layout:
- ``kernel/``  pure-Python URL/HTML/hash kernel (golden-tested against the
  reference's rackunit literals); shared by oracle and Spark UDFs.
- ``oracle/``  the web-program AST + a pure-Python DFS interpreter
  reproducing the reference's crawl semantics exactly.
- ``engine/``  the Spark engine: round-based distributed URL frontier over
  snapshot tables (politeness, seen-filter, fetch, extract, path_key
  ordering).
- ``synth/``   deterministic synthetic Common-Crawl-style page corpus.
- ``ops/``     large-scale training-data pipeline operators (dedup,
  similarity search, text analysis) over the documents/embeddings tables.
"""

__version__ = "0.1.0"
