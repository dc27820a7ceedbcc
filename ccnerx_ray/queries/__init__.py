"""Driver-facing query registry: every implemented operator/pipeline from
SURVEY.md §2 (plus the training-data ops) exposed as ``name → callable
(sf_dir) → Dataset/Table`` with matching DuckDB oracle SQL where the
semantics are SQL-expressible. Assembled by ``__ray_entry__``."""

from ccnerx_ray.queries.relational import RELATIONAL_ORACLE, RELATIONAL_QUERIES
from ccnerx_ray.queries.relational2 import RELATIONAL2_ORACLE, RELATIONAL2_QUERIES
from ccnerx_ray.queries.relational3 import RELATIONAL3_ORACLE, RELATIONAL3_QUERIES
from ccnerx_ray.queries.relational4 import RELATIONAL4_ORACLE, RELATIONAL4_QUERIES
from ccnerx_ray.queries.analytics import ANALYTICS_ORACLE, ANALYTICS_QUERIES


def all_queries() -> dict:
    q = {}
    q.update(RELATIONAL_QUERIES)
    q.update(RELATIONAL2_QUERIES)
    q.update(RELATIONAL3_QUERIES)
    q.update(RELATIONAL4_QUERIES)
    q.update(ANALYTICS_QUERIES)
    return q


def all_oracles() -> dict:
    o = {}
    o.update(RELATIONAL_ORACLE)
    o.update(RELATIONAL2_ORACLE)
    o.update(RELATIONAL3_ORACLE)
    o.update(RELATIONAL4_ORACLE)
    o.update(ANALYTICS_ORACLE)
    return o
