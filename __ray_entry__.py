"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ``ray.init``/``ray.shutdown`` —
sessions are owned by the caller.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001: documents-derived
    corpus → mention tagging (lexicon-fusion + viterbi) → linking → triple
    materialization. Returns the triples Dataset."""
    from ccnerx_ray.queries.analytics import q_kg_triples

    return q_kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and
    the training-data ops layer; each callable takes ``sf_dir``."""
    from ccnerx_ray.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray output). Model-/sketch-driven ops are intentionally
    absent → the driver records rows-only checks for them."""
    from ccnerx_ray.queries import all_oracles

    return all_oracles()
