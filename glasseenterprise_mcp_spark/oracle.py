"""Assembly of DuckDB oracle SQL from per-stage CTE builders.

The driver's correctness gate runs each ``queries()[name]`` Spark DataFrame
against ``oracle_sql()[name]`` executed by DuckDB over the same parquet
tables. Every relational stage of the engine has a DuckDB-dialect CTE twin
(kept in lockstep next to the Spark implementation); this module just glues
them into full statements.
"""

from __future__ import annotations

from .operators.canonicalize import connected_components_cte, resolve_identities_cte
from .operators.extract import mentions_cte
from .operators.link import (
    calls_tool_cte,
    mentions_in_cte,
    refers_to_cte,
    replies_to_cte,
)
from .operators.materialize import nodes_cte
from .sources.transcripts import transcripts_cte


def with_ctes(*ctes: str) -> str:
    return "WITH " + ",\n".join(ctes)


def base() -> list[str]:
    return [transcripts_cte(), mentions_cte()]


def oracle(select: str, *extra_ctes: str) -> str:
    return with_ctes(*base(), *extra_ctes) + "\n" + select


__all__ = [
    "oracle",
    "with_ctes",
    "base",
    "transcripts_cte",
    "mentions_cte",
    "mentions_in_cte",
    "replies_to_cte",
    "calls_tool_cte",
    "refers_to_cte",
    "nodes_cte",
    "connected_components_cte",
    "resolve_identities_cte",
]
