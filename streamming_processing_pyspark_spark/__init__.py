"""streamming_processing_pyspark_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the reference project ``USTriett/Streamming-Processing-PySpark``
(NYC-taxi streaming analytics on Structured Streaming), extended with the
relational surface the reference lacks and with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing).

Design principles (see SURVEY.md):

- DataFrame/SQL first: every operator is declared as a Catalyst logical plan
  so predicate pushdown, column pruning, partial aggregation and join
  selection are free.
- UDFs only where built-ins genuinely cannot express the semantics, and then
  Arrow-vectorized (``pandas_udf`` / ``applyInPandas``), never row-at-a-time.
- Streaming via Structured Streaming with explicit watermarks; no unbounded
  state by accident.
- Scale posture: broadcast small dims, AQE on, shuffle partitions sized to
  the cluster, no driver-side ``collect()`` in any data path.
"""

__version__ = "0.1.0"
