"""S6 — line-stateful group-carry scan (grouped-map form).

Analogue of the reference's git-log ``--numstat`` segmentation parse
(src/scanner/developerAnalyzer.ts:134-209): a per-group sequential scan
where each record's interpretation depends on state carried from earlier
records of the same group. Here the state is a code-fence toggle: a turn is
"inside a code block" when an odd number of fence markers (```) have been
seen in the conversation up to and including that turn.

Physical shape: ``applyInPandas`` over ``groupBy(conv_id)`` — one shuffle on
the group key, then a pure sequential scan per group (the only stage family
besides extraction allowed to run Python, and it is Arrow-batched per
group). Mega-conversation skew is bounded by the per-turn O(1) state.

The DuckDB twin expresses the same carry as a running-sum window — proving
the operator is oracle-checkable even though the Spark side is deliberately
implemented in the imperative group-carry form the reference uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

FENCE = "```"

_OUT_SCHEMA = "conv_id string, turn_idx int, fences int, in_block int"


def _scan_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    state = 0
    fences_out, in_block = [], []
    for text in pdf["text"]:
        k = text.count(FENCE) if text is not None else 0
        state += k
        fences_out.append(k)
        in_block.append(state % 2)
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy(),
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "fences": fences_out,
            "in_block": in_block,
        }
    )


def stateful_block_scan(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, fences, in_block) — group-carry scan per conv."""
    from ..functions.shipping import ensure_package_shipped

    ensure_package_shipped(transcripts.sparkSession)
    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandas(_scan_group, schema=_OUT_SCHEMA)
    )


def stateful_block_scan_cte() -> str:
    return """block_scan AS (
  SELECT conv_id, turn_idx,
         CAST(fences AS INT) AS fences,
         CAST(SUM(fences) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                ROWS UNBOUNDED PRECEDING) % 2 AS INT) AS in_block
  FROM (
    SELECT conv_id, turn_idx,
           (len(text) - len(replace(text, '```', ''))) // 3 AS fences
    FROM transcripts
  )
)"""
