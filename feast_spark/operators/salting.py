"""Skew utilities: salted repartition and salted join.

The reference exposes a blunt ``partitions`` knob
(``infra/compute_engines/spark/compute.py:54-55``, applied via
``repartition`` at ``:180-183``). For mega-key skew (10^4-turn
conversations in a 10^12-turn corpus) that is not enough: we salt the hot
side of a key join — build side explodes over all salt values, probe side
draws a deterministic salt from a secondary column — and let AQE's skew
join handle the residue.

Aggregations do NOT need salting (Spark's partial aggregation combines
map-side), which is why the quality pipeline only salts joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, salt_buckets: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over
    ``salt_buckets`` partitions. Salt is deterministic: derived from
    ``salt_from`` (e.g. turn_idx) when given, else from a hash of the
    whole row's key+ts — never ``rand()`` (SURVEY §7 determinism)."""
    salt_src = F.col(salt_from) if salt_from else F.xxhash64(*df.columns)
    salted = df.withColumn(SALT, F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    return salted.repartition(num_partitions, F.col(key), F.col(SALT)).drop(SALT)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_buckets: int = 16,
    probe_salt_from: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Equi-join with the classic explode/derive salt pattern.

    ``build`` (small-ish side, e.g. conv_features) is exploded over all
    salt values; ``probe`` (huge side, e.g. turns) derives one salt per
    row. Join key becomes (key, salt) so a hot key splits into
    ``salt_buckets`` shuffle keys.
    """
    b = build.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    salt_src = F.col(probe_salt_from) if probe_salt_from else F.xxhash64(*probe.columns)
    p = probe.withColumn(SALT, F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    return p.join(b, [key, SALT], how).drop(SALT)
