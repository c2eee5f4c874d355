"""bitcoinminingetl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system (lyfer233/BitcoinMiningETL: windowed time-series ETL —
see SURVEY.md), generalized into a full declarative operator surface
(scans, projections, joins, aggregates, window functions, set ops, scalar
function packs, streaming) plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns), all expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, designed for
100 TB / multi-executor scale while testable on local mode.
"""

__version__ = "0.1.0"
