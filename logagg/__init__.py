"""logagg — a PySpark-native log/telemetry parse → enrich → route → aggregate engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (JLCodeSource/log_aggregator, studied
at /root/reference): grok/regex field extraction as vectorized pandas/Arrow
UDFs over a Common-Crawl-style pages table ``(url, warc_ts, html, text,
lang)``, broadcast-join enrichment, partition-aware multiplexed routing,
and per-sink hash aggregates — plus the training-data-pipeline operators a
100 TB corpus needs (dedup, similarity search, text analysis, multimodal
plumbing).

Architecture: DataFrame/Catalyst everywhere; Python only inside Arrow-batched
``mapInPandas`` stages where byte-identical parse semantics demand it.
"""

__version__ = "0.1.0"
