"""PySpark-native knowledge-graph construction engine over transcript tables.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
KG-construction MCP server (see SURVEY.md): per-turn mention extraction
(vectorized Arrow UDF stage), blocking + similarity-scored entity linking,
iterative connected-components canonicalization, and (subj, pred, obj) triple
materialization into partitioned, snapshot-versioned node/edge tables.

Everything is pyspark.sql DataFrame + SQL; the single non-relational stage
(per-turn typed-span extraction, the analogue of the reference's Tree-sitter
scan, reference: src/scanner/astExtractor.ts:1678-2081) is one vectorized
mapInPandas stage over Arrow batches.
"""

__version__ = "0.1.0"
