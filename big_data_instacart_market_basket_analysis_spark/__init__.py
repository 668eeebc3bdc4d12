"""PySpark-native analytics engine with the query & data-processing
capabilities of ``indrajitgohokar92/Big-Data-Instacart-Market-Basket-Analysis``.

The reference (/root/reference/"InstaCart Market Basket Analysis_Final.py",
abbreviated F.py in docstrings) is a single-node RDD+pandas+MLlib notebook.
This package re-expresses every operator it contains — plus the LLM-data-
pipeline extensions ([EXT]) called for by the project blueprint (SURVEY.md)
— as distributed Spark DataFrame / SQL / pyspark.ml / Structured Streaming
plans, designed for 100 TB scale:

- zero Python UDFs on the reference surface (everything is Catalyst-native),
- broadcast joins for dimension/feature tables, AQE + skew handling for
  fact-fact joins,
- explicit schemas at read time (no inference on the hot path),
- deterministic semantics (ordered limits, sorted collected arrays,
  ``max_by`` instead of bare ``last``) per SURVEY.md §5.

Layout:
  session     SparkSession factory tuned for local[32] tests / cluster scale
  sources     read-time schemas, parquet loaders, Instacart-format CSV ingest
  plans       fixture→Instacart role-mapping logical views (FIXTURES.md §B)
  operators   relational + [EXT] operators (features, candidates, dedup, …)
  functions   shared Catalyst expression helpers (safe_div, sorted_set, …)
  ml          pyspark.ml pipelines mirroring F.py:219-225 tree regressors
  streaming   Structured Streaming shapes over the events fixture
"""

__version__ = "0.1.0"
