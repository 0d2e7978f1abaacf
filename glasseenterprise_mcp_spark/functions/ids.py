"""Stable content-derived id minting (E16 analogue).

The reference mints every node id as ``md5(parts.join('|'))``
(src/scanner/astExtractor.ts:86-88) and every edge id as the literal triple
key (src/scanner/relationshipBuilder.ts:442-453). Deterministic identity is
the load-bearing invariant — it makes re-ingest idempotent and the MERGE
upsert a no-op on replay. We keep exactly that contract, as pure column
expressions (never Python UDFs), and mirror it in DuckDB SQL for the oracle.

Representation: ids are BINARY(16) (the raw md5 digest), NOT the 32-char hex
string. At 100TB the id columns dominate the triple table's bytes; the raw
digest halves them in every shuffle, cache and sink file, and md5's hex form
is order-preserving w.r.t. the digest bytes (lowercase hex is monotone in
the nibble value), so every min/least/row_number-over-id result is identical
in both representations. The DuckDB oracle stays on hex strings; oracle-
facing query surfaces convert once with :func:`hex_id_col` (lower(hex(id))
== md5 hex) on their dim-sized / final projections only.

Node-id key spaces:
  turn      md5('turn|<conv>|<turn_idx>')
  conv      md5('conv|<conv>')
  entity    md5('entity|<norm>')        (name-normalized blocking key)
  tool      md5('tool|<norm>')
  config    md5('config|<norm>')
  error     md5('error|<norm>')
  url       md5('url|<path>')           (consumed side, pre-api-strip path)
  resource  md5('resource|<norm>')      (provided side, fully normalized)
  mention   md5('m|<conv>|<turn>|<mtype>|<norm>|<ord>')
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column

SEP = "|"


def stable_id_py(*parts: object) -> bytes:
    return hashlib.md5(SEP.join(str(p) for p in parts).encode("utf-8")).digest()


def stable_id_col(*parts: Column | str) -> Column:
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.unhex(F.md5(F.concat_ws(SEP, *[c.cast("string") for c in cols])))


def hex_id_col(c: Column) -> Column:
    """Oracle-facing projection of a binary id: lower(hex(id)) == the md5
    hex string the DuckDB twin computes."""
    return F.lower(F.hex(c))


def stable_id_sql(*exprs: str) -> str:
    """DuckDB md5 over '|'-joined parts. Pass SQL expressions or quoted literals."""
    joined = ", ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return f"md5(concat_ws('{SEP}', {joined}))"


def node_id_col(kind: str, key: Column) -> Column:
    return stable_id_col(kind, key)


def node_id_sql(kind: str, key_expr: str) -> str:
    return stable_id_sql(f"'{kind}'", key_expr)
