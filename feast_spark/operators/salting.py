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


def shuffle_skew_report(
    df: DataFrame,
    key_cols: list[str],
    n_partitions: int,
    units: int = 1 << 20,
) -> DataFrame:
    """Shuffle-partition skew diagnostic: simulate hash-partitioning the
    input on ``key_cols`` into ``n_partitions`` buckets and report, per
    simulated partition, how unbalanced the exchange would be and how
    much salt the hottest key needs — the MEASUREMENT half of this
    module's ``salted_repartition``/``salted_join`` (the north rule's
    "salted repartitioning on conv_id to defuse mega-conversation skew"
    stated as a diagnostic you run BEFORE picking ``salt_buckets``).

    One row per simulated partition (empty partitions included — an
    empty bucket is itself a balance signal):

    - ``n_rows`` / ``n_keys`` — rows and distinct keys landing there
    - ``max_key_rows`` — the hottest single key's row count
    - ``hot_key`` — that key (ties broken by MAX key string, so the
      answer is deterministic and the DuckDB oracle reproduces it);
      NULL for empty partitions
    - ``balance_units`` — ``n_rows * n_partitions * units div total``:
      ``units`` = perfectly even, ``2*units`` = this partition carries
      twice its fair share
    - ``salt_hint`` — ``ceil(max_key_rows * n_partitions / total)``:
      the number of salt buckets that would split this partition's
      hottest key down to one even share (1 = no salting needed; the
      global recommendation is the MAX over partitions — exactly the
      ``salt_buckets`` knob of :func:`salted_join`)

    The partition function is the portable md5-48 surrogate (``pmod``
    of the first 12 md5 hex digits), NOT Spark's Murmur3 ``hash()`` —
    the point is the key-mass DISTRIBUTION, which is hash-agnostic for
    any well-mixed hash, and md5-48 is the one function both engines
    compute bit-identically (GENUINE SQL oracle). A mega-key shows up
    under any hash; only the bucket it lands in differs. Multi-column
    keys concatenate with the chr(30) separator, NULL -> '<null>'
    (distinct from the string 'null').

    Plan at 10^12 rows: ONE map-side-combined key-grain hash agg (the
    same exchange any groupBy(key) pays — nothing new crosses), then
    partition assignment MAP-SIDE on the key-grain relation into an
    ``n_partitions``-row agg; totals ride a window over that bounded
    relation (single partition of ``n_partitions`` rows — documented
    bounded, the grouped_quantiles argument); the hot-key argmax joins
    two key-grain relations on (partition, cnt) where the build side is
    the ``n_partitions``-row aggregate. Nothing is driver-side.

    Reference: feast's only skew lever is the blunt ``partitions`` knob
    (``infra/compute_engines/spark/compute.py:54-55``); the
    measure-then-salt loop is this repo's scale restatement.
    """
    from pyspark.sql import Window

    if n_partitions <= 0:
        raise ValueError(f"n_partitions must be positive: {n_partitions}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    key = F.concat_ws(
        "\x1e",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in key_cols
        ],
    )
    keyed = df.groupBy(key.alias("__key")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    part = F.pmod(
        F.conv(F.substring(F.md5("__key"), 1, 12), 16, 10).cast("long"),
        F.lit(int(n_partitions)),
    )
    keyed = keyed.withColumn("__p", part)

    pagg = keyed.groupBy("__p").agg(
        F.sum("__cnt").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__cnt").alias("max_key_rows"),
    )
    # deterministic hot key: max cnt, ties -> max key string; the join
    # build side is the n_partitions-row aggregate
    caps = pagg.select(
        F.col("__p").alias("__cp"), F.col("max_key_rows").alias("__cap")
    )
    hot = (
        keyed.join(
            F.broadcast(caps),
            (F.col("__p") == F.col("__cp"))
            & (F.col("__cnt") == F.col("__cap")),
        )
        .groupBy(F.col("__p").alias("__hp"))
        .agg(F.max("__key").alias("hot_key"))
    )
    w_all = Window.partitionBy()
    sized = pagg.withColumn(
        "__total", F.sum("n_rows").over(w_all).cast("long")
    ).join(hot, F.col("__p") == F.col("__hp"), "left")

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i,) for i in range(int(n_partitions))], "partition long"
    )
    full = dim.join(
        sized, F.col("partition") == F.col("__p"), "left"
    )
    total_nonzero = F.col("__total").isNotNull() & (F.col("__total") > 0)
    return full.select(
        "partition",
        *(F.coalesce(c, F.lit(0)).cast("long").alias(c) for c in
          ("n_rows", "n_keys", "max_key_rows")),
        "hot_key",
        F.when(
            total_nonzero,
            F.expr(
                f"(CAST(n_rows AS DECIMAL(38,0)) * {int(n_partitions)}"
                f" * {int(units)}) div __total"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("balance_units"),
        F.when(
            total_nonzero,
            F.expr(
                f"(CAST(max_key_rows AS DECIMAL(38,0)) * {int(n_partitions)}"
                " + __total - 1) div __total"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("salt_hint"),
    )
