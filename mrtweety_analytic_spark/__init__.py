"""mrtweety_analytic_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference app
kubahorak/mrtweety-analytic (a Spark-2.2 DStream hashtag-trending job;
see SURVEY.md) as an idiomatic Spark DataFrame / SQL / Structured
Streaming engine, extended with the batch-analytics and LLM-data-
pipeline operators inventoried in SURVEY.md §2B.

Layout:
  session.py    — SparkSession construction / runtime tuning
  sources.py    — table loaders + explicit schemas for the test corpus
  registry.py   — query/oracle registration (the driver contract)
  operators/    — batch operators, one module per §2B category
  streaming/    — Structured Streaming pipelines (reference semantics)
  queries.py    — assembled QUERIES / ORACLES dicts
"""

__version__ = "0.1.0"
