"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (nor in the library code) initialises or shuts down Ray.

- ``entry()``       — flagship CDC replay pipeline on sf0.001-scale
  synthesized transcripts (the payload mandated by BASELINE.json).
- ``queries()``     — one callable per implemented operator family from
  SURVEY §2 (+ the training-data operators), each taking ``sf_dir``.
- ``oracle_sql()``  — DuckDB-equivalent SQL for every SQL-expressible query,
  column names matched exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: replay a deterministic transcript WAL against a
    hash-partitioned lake and return the merged final table."""
    from bcdc2bcdc_ray.pipelines import queries as q

    return q.transcripts_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from bcdc2bcdc_ray.pipelines import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from bcdc2bcdc_ray.pipelines import queries as q

    return q.oracle_sql()
