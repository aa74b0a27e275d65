"""solrutils_spark — a PySpark-native fulltext indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of the ``dinom-ru/solrutils``
Solr-extension suite (reference at /root/reference), re-expressed Spark-first:

- **Layer A (engine)**: what the reference delegates to Lucene/Solr 7.2.1 —
  code-aware analysis, inverted-index segment build (delta+VByte posting
  compression, block-max skip metadata), term-partitioned shuffle merge with
  hot-term salting, BM25 top-k with block-max WAND pruning.
  Modules: :mod:`solrutils_spark.index`, :mod:`solrutils_spark.query`.
- **Layer B (query surface)**: what the reference itself implements — the JSON
  query model (operators, conversions, templates, facets, rerank, split).
  Modules: :mod:`solrutils_spark.plans`, :mod:`solrutils_spark.operators`,
  :mod:`solrutils_spark.functions`.

Everything is DataFrame-declarative where Spark can express it; Arrow-batched
pandas UDFs (never per-row Python) where it cannot (posting codec, WAND).
"""

__version__ = "0.1.0"
