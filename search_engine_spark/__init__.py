"""search_engine_spark — a PySpark-native fulltext index + BM25 query engine.

A from-scratch re-expression of the capabilities of nissejokke/search-engine
(reference at /root/reference, TypeScript) as idiomatic Spark DataFrame
programs:

- tokenize → inverted index build (``operators.index_build``)
- conjunctive / phrase top-k queries with reference-parity scoring
  (``operators.search``)
- BM25 + block-max WAND scale path (``operators.bm25``, ``operators.wand``)
- resumable segment-based builds with per-partition lineage + metrics
- training-data pipeline operators: dedup, similarity search, text metrics
  (``operators.dedup``, ``operators.ann``, ``functions.text_metrics``)

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten pick physical strategies; Python appears only behind
Arrow-vectorized pandas UDFs (never per-row Python in a hot path).
"""

__version__ = "0.1.0"
