"""Query + oracle registrations for the driver correctness harness.

One ``register(...)`` call per implemented operator from SURVEY.md §2
(and the north-star extensions). Kept in a single module so the full
inventory is greppable in one place; the implementations live in the
operator modules.
"""

from __future__ import annotations

from fledge_south_csvplayback_spark.registry import register
from fledge_south_csvplayback_spark.operators import relational

# --- relational suite (SURVEY.md §2.3/§2.5/§2.7/§2.8 gap-fill) -------------
register("q1_pricing_summary", relational.q1_pricing_summary, relational.Q1_SQL)
