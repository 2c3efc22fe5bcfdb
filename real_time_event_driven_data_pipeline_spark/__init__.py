"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline
(Andrew-Marfo/Real-Time-Event-Driven-Data-Pipeline).

The reference is a batch-Spark-on-ECS, event-driven e-commerce KPI
pipeline (validate -> transform -> KV sink). This engine re-expresses
that surface Spark-first:

- schema-enforced ingestion (``sources``) — CSV/parquet, batch + stream
- single-pass data-quality validation operators (``operators.validation``)
- multi-way equi-join daily-grain KPI aggregations (``operators.kpis``)
- executor-side key-value serving sink (``sinks.kv``)
- a native Structured Streaming path (``streaming``) replacing the
  reference's S3-event -> Step Functions orchestration
- large-scale training-data extensions: dedup, similarity search,
  text analysis, multimodal plumbing (``operators.*``)

Everything is declared via the DataFrame API so Catalyst/Tungsten pick
the physical plan; Python UDFs appear only where built-ins cannot
express the semantics (and then only as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
