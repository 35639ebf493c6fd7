"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: interleaved text+media
    documents -> parse -> extracted (kind, text, media_ref, order) spans."""
    from node_html_parser_ray.pipelines.queries import entry_pipeline

    return entry_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data operators (dedup / similarity / text analysis / multimodal)."""
    from node_html_parser_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; HTML-semantic
    and sketch-based ops are rows-only by design (driver records the weaker
    check)."""
    from node_html_parser_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
