"""Skew-aware join helper (100 TB scale path).

AQE's skew-join split handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on session-wide), but it only
splits *sort-merge* partitions after a shuffle materializes. When one
key dominates a fact-fact equi-join badly enough that a single
partition OOMs before AQE can react, the classic remedy is salting:

- fact side: append a uniform random-ish salt in [0, S) to the key —
  here a deterministic ``pmod(xxhash64(whole row), S)`` so results are
  reproducible;
- build side: explode each row S times, one per salt value;
- join on (key, salt), then drop the salt.

The result is row-identical to the plain join (asserted in tests); the
hot key's rows spread across S partitions at the price of replicating
the build side S times — the right trade when the build side is the
smaller input but too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join on ``on`` with the fact side salted across n partitions."""
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    salted_build = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_fact.join(salted_build, [on, "_salt"], how)
    return out.drop("_salt")
