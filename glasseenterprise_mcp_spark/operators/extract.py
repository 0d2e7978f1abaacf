"""Stage A — vectorized per-turn mention detection + typed-span extraction.

Analogue of the reference's per-file Tree-sitter entity scan
(src/scanner/astExtractor.ts:1678-2081 driver, 757-1676 analyzers): the one
stage that cannot be expressed relationally. Implemented as a single
``mapInPandas`` over Arrow batches — one Python invocation per batch of
turns, never per-row Spark UDFs (input_hint: "no per-row Python").

Detector families (all share group-1-as-surface regex shape, restricted to
the RE2 ∩ Java ∩ Python regex subset so the DuckDB oracle extracts the exact
same surfaces):

  entity    @Name            analogue of Function/Class/Variable detection
  tool      call:name(       tool-call detection (consumed API analogue,
                             astExtractor.ts:1083-1157 cascade)
  config    env:KEY          process.env.X analogue (astExtractor.ts:1160-1166)
  error     error:"..."      throw/raise/logger.error analogue
  reply     re:#N            reply reference (drives replies-to)
  url       http(s)://...    consumed full-URL mention (astExtractor.ts:1959-1973
                             full-URL ⇒ consumed correction)
  endpoint  GET /path        provided endpoint (Spring @GetMapping analogue)

Per-turn work caps replicate the reference's bounded AST walk
(astExtractor.ts:496-498,573: depth 500 / 10k nodes / ≤50 children): we cap
matches per (turn, mtype) and bytes scanned per turn — the skew guard for
mega-turns.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Callable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.normalize import (
    norm_name_py,
    norm_name_sql,
    norm_path_py,
    norm_path_sql,
    norm_resource_py,
    norm_resource_sql,
)
from ..schemas import MENTIONS_SCHEMA

# Work caps (reference: astExtractor.ts:496-498,573)
MAX_TEXT_BYTES = 1_000_000  # scan at most 1MB of a mega-turn
MAX_MATCHES_PER_KIND = 200  # ≤N matches per (turn, detector)

# (mtype, pattern, norm_dialects). Patterns MUST keep surface = group(1).
PATTERNS: list[tuple[str, str]] = [
    ("entity", r"@([A-Za-z_][A-Za-z0-9_]*)"),
    ("tool", r"call:([A-Za-z_][A-Za-z0-9_]*)\("),
    ("config", r"env:([A-Z][A-Z0-9_]*)"),
    ("error", r'error:"([^"]+)"'),
    ("reply", r"re:#([0-9]+)"),
    ("url", r"(https?://[^ ]+)"),
    ("endpoint", r"(?:GET|POST|PUT|DELETE) (/[A-Za-z0-9_/.-]*)"),
    # structured resource mention: table.column (DatabaseTable/Column
    # analogue, reference types.ts:161-174 + JPQL mini-parser E12)
    ("table", r"tbl:([a-z_]+\.[a-z_0-9]+)"),
]

# Necessary-literal prefilter per detector: a C-speed substring probe that
# skips the (much costlier) regex scan for turns that cannot match. Each
# hint MUST be a substring of every possible match of its pattern
# (semantics-preserving; the E6-cascade cheap-first idea,
# astExtractor.ts:1109-1153, applied to scan cost). None ⇒ always scan.
_LITERAL_HINTS: dict[str, str | None] = {
    "entity": "@",
    "tool": "call:",
    "config": "env:",
    "error": 'error:"',
    "reply": "re:#",
    "url": "http",
    "endpoint": None,  # verb alternation has no single necessary literal
    "table": "tbl:",
}

_NORM_PY: dict[str, Callable[[str], str]] = {
    "table": lambda s: s.lower(),
    "entity": norm_name_py,
    "tool": norm_name_py,
    "config": lambda s: s,  # config keys are case-significant (env var names)
    "error": norm_name_py,
    "reply": lambda s: s,
    "url": norm_resource_py,
    "endpoint": norm_resource_py,
}

_NORM_SQL: dict[str, Callable[[str], str]] = {
    "table": lambda e: f"lower({e})",
    "entity": norm_name_sql,
    "tool": norm_name_sql,
    "config": lambda e: e,
    "error": norm_name_sql,
    "reply": lambda e: e,
    "url": norm_resource_sql,
    "endpoint": norm_resource_sql,
}

# url/endpoint keep the pre-api-strip path for tier-2 linking + url node ids
_PATH_PY: dict[str, Callable[[str], str]] = {
    "url": norm_path_py,
    "endpoint": norm_path_py,
}

_COMPILED = [(m, re.compile(p), _LITERAL_HINTS.get(m)) for m, p in PATTERNS]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one call per Arrow batch of turns."""
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in MENTIONS_SCHEMA.fields}
        conv_ids = pdf["conv_id"].to_numpy()
        turn_idxs = pdf["turn_idx"].to_numpy()
        texts = pdf["text"].to_numpy()
        for i in range(len(pdf)):
            text = texts[i]
            if text is None:
                continue
            if len(text) > MAX_TEXT_BYTES:
                text = text[:MAX_TEXT_BYTES]
            seen: set[tuple[str, str]] = set()
            for mtype, rx, hint in _COMPILED:
                if hint is not None and hint not in text:
                    continue
                norm_fn = _NORM_PY[mtype]
                path_fn = _PATH_PY.get(mtype)
                for ord_, m in enumerate(rx.finditer(text), start=1):
                    if ord_ > MAX_MATCHES_PER_KIND:
                        break
                    surface = m.group(1)
                    norm = norm_fn(surface)
                    path = path_fn(surface) if path_fn else None
                    node_key = (mtype, path if mtype == "url" else norm)
                    first = node_key not in seen
                    seen.add(node_key)
                    out["conv_id"].append(conv_ids[i])
                    out["turn_idx"].append(turn_idxs[i])
                    out["mtype"].append(mtype)
                    out["surface"].append(surface)
                    out["norm"].append(norm)
                    out["ord"].append(ord_)
                    out["span_start"].append(m.start(1))
                    out["span_end"].append(m.end(1))
                    out["path"].append(path)
                    out["first_in_turn"].append(first)
        yield pd.DataFrame(out)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts → mentions (MENTIONS_SCHEMA). Narrow stage, no shuffle."""
    from ..functions.shipping import ensure_package_shipped

    ensure_package_shipped(transcripts.sparkSession)
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        _extract_batches, schema=MENTIONS_SCHEMA
    )


def enrich_mention_attrs(mentions: DataFrame) -> DataFrame:
    """E8-E13 analogue: typed attribute enrichment per mention kind, as pure
    column expressions over the extracted surface (the reference enriches
    entities with return types / schemas / parsed query structure,
    returnTypeExtractor.ts:9-236, springAnalyzer.ts:16-248).

      url      → host, scheme
      error    → error code (leading E<digits> token)
      tool     → base name + numeric suffix
      config   → namespace prefix (before first _)
    """
    mt = F.col("mtype")
    surface = F.col("surface")
    return mentions.select(
        "conv_id",
        "turn_idx",
        "mtype",
        "surface",
        "norm",
        "ord",
        F.when(mt == "url", F.regexp_extract(surface, r"^([a-z]+)://", 1)).alias("scheme"),
        F.when(mt == "url", F.regexp_extract(surface, r"^[a-z]+://([^/]+)", 1)).alias("host"),
        F.when(mt == "error", F.regexp_extract(surface, r"^(E[0-9]+)", 1)).alias("error_code"),
        F.when(mt == "tool", F.regexp_extract(surface, r"^([A-Za-z]+)_?", 1)).alias("tool_base"),
        F.when(mt == "tool", F.regexp_extract(surface, r"_([0-9]+)$", 1)).alias("tool_num"),
        F.when(mt == "config", F.regexp_extract(surface, r"^([A-Z]+)_", 1)).alias("cfg_ns"),
    )


def enrich_mention_attrs_cte() -> str:
    def when(mt: str, expr: str) -> str:
        return f"CASE WHEN mtype = '{mt}' THEN {expr} END"

    return f"""mention_attrs AS (
  SELECT conv_id, turn_idx, mtype, surface, norm, ord,
         {when('url', "regexp_extract(surface, '^([a-z]+)://', 1)")} AS scheme,
         {when('url', "regexp_extract(surface, '^[a-z]+://([^/]+)', 1)")} AS host,
         {when('error', "regexp_extract(surface, '^(E[0-9]+)', 1)")} AS error_code,
         {when('tool', "regexp_extract(surface, '^([A-Za-z]+)_?', 1)")} AS tool_base,
         {when('tool', "regexp_extract(surface, '_([0-9]+)$', 1)")} AS tool_num,
         {when('config', "regexp_extract(surface, '^([A-Z]+)_', 1)")} AS cfg_ns
  FROM mentions
)"""


# --------------------------------------------------------------------------
# DuckDB oracle: identical extraction, relationally.
# --------------------------------------------------------------------------
def mentions_cte() -> str:
    """DuckDB CTE body ``mentions`` over a ``transcripts`` CTE.

    Surfaces come from regexp_extract_all(group 1); the 1-based ordinal uses
    the zip-unnest(range) idiom. Span offsets are engine-only (oracle emits
    NULLs are avoided — columns omitted)."""
    per_kind = []
    for mtype, pattern in PATTERNS:
        pat_sql = pattern.replace("'", "''")
        norm = _NORM_SQL[mtype]("ms[ord]")
        path = (
            norm_path_sql("ms[ord]") if mtype in _PATH_PY else "CAST(NULL AS VARCHAR)"
        )
        per_kind.append(
            f"""
  SELECT conv_id, turn_idx, '{mtype}' AS mtype, ms[ord] AS surface,
         {norm} AS norm, CAST(ord AS INT) AS ord, {path} AS path
  FROM (
    SELECT conv_id, turn_idx, ms, unnest(range(1, len(ms)+1)) AS ord
    FROM (SELECT conv_id, turn_idx,
                 regexp_extract_all(text, '{pat_sql}', 1) AS ms
          FROM transcripts)
  )"""
        )
    union = "\n  UNION ALL".join(per_kind)
    return f"mentions AS ({union}\n)"
