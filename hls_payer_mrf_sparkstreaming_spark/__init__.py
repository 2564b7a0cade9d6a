"""PySpark-native analytics engine for CMS healthcare price-transparency MRF
files, plus a large-scale training-data-pipeline operator library.

Capability parity target: databricks-industry-solutions/hls-payer-mrf-sparkstreaming
(reference at /root/reference, Scala byte-splitter + demo relational pipeline).
This is a ground-up Spark-first redesign, not a port:

- ``sources``   — the ``payer-mrf`` Python DataSource (batch + Structured
                  Streaming) backed by a numpy-vectorized JSON structural
                  scanner (the reference's ByteParser.scala equivalent).
- ``plans``     — bronze -> silver -> gold relational pipeline for the CMS
                  in-network-rates schema (reference 01_payer_mrf_demo.py).
- ``operators`` — the oracle-checked relational query surface plus
                  LLM-data-pipeline operators (dedup, similarity search,
                  text analysis, multimodal columns) designed for 100 TB.
- ``functions`` — reusable column-expression builders (vector math,
                  deterministic surrogate keys, text metrics).
- ``streaming`` — Structured Streaming pipelines (windowed aggregation,
                  watermarks) over the events table.
"""

__version__ = "0.1.0"

from hls_payer_mrf_sparkstreaming_spark.session import get_spark  # noqa: F401
