"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship record-linkage pipeline on the sf0.001
synthetic pages corpus (the BASELINE.json ``input_hint`` table shape,
generated deterministically — see kawa_ray/sources/pages.py).
``queries()`` / ``oracle_sql()`` expose each implemented operator over
the driver's parquet tables at the given ``sf_dir`` with DuckDB oracle
SQL where the op is SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001 pages corpus -> clusters Dataset."""
    from kawa_ray.pipelines.linkage import link_pages
    from kawa_ray.sources.pages import ensure_pages

    pages_dir = ensure_pages("0.001")
    result = link_pages(pages_dir)
    return result["clusters"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from kawa_ray.pipelines.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query (same column
    names as the Ray results; non-SQL ops are omitted -> rows-only check)."""
    from kawa_ray.pipelines.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
