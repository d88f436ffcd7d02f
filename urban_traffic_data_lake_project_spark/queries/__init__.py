"""Named query registry — the driver contract surface.

``REGISTRY`` maps query name -> QuerySpec (Spark fn + DuckDB oracle SQL).
Submodules group queries by domain; this module just assembles them.
"""

from __future__ import annotations

from urban_traffic_data_lake_project_spark.queries import (
    analytics,
    cleaning,
    core,
    curation,
    lakehouse,
    llm,
    scalars,
    windows,
)
from urban_traffic_data_lake_project_spark.queries.base import QuerySpec


def _assemble() -> dict[str, QuerySpec]:
    registry: dict[str, QuerySpec] = {}
    for m in (core, cleaning, llm, windows, analytics, scalars, curation, lakehouse):
        overlap = registry.keys() & m.REGISTRY.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(m.REGISTRY)
    # Oracle-backed queries FIRST (stable within each group): the driver's
    # correctness gate records a bounded number of entries in registration
    # order, so every hash-checkable query must land inside that window.
    # "defer"-tagged oracle queries sort after the core oracle set (they
    # overflow the window but stay verifiable by the local oracle replica);
    # rows-only (stochastic/ML) specs go last.
    def _key(kv: tuple[str, QuerySpec]) -> int:
        if kv[1].oracle is None:
            return 2
        return 1 if "defer" in kv[1].tags else 0

    return dict(sorted(registry.items(), key=_key))


REGISTRY: dict[str, QuerySpec] = _assemble()

__all__ = ["REGISTRY", "QuerySpec"]
