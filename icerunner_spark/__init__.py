"""icerunner_spark — a PySpark-native analytics engine with the capabilities
of TFMV/icerunner (Arrow Flight serving over snapshot-versioned lake tables),
rebuilt Spark-first.

Layers (see SURVEY.md for the reference inventory this covers):

- ``icerunner_spark.session``   — tuned SparkSession factory.
- ``icerunner_spark.table``     — snapshot-versioned parquet table format
  (append / time travel / incremental CDC reads). Replaces the reference's
  PyIceberg + DuckDB ``iceberg_scan`` stack (icerunner.py:60-103).
- ``icerunner_spark.connector`` — the IceRunnerConnector parity API
  (icerunner.py:49-259).
- ``icerunner_spark.flight``    — Arrow Flight server/client/mirror
  (icerunner.py:262-310, 716-1156).
- ``icerunner_spark.operators`` — query operators beyond plain SQL: as-of
  join, dedup family, similarity search, text analysis, multimodal.
- ``icerunner_spark.sample_data`` — deterministic sample-data profiles
  (icerunner.py:313-666).
"""

__version__ = "0.1.0"
