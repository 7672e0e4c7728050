"""Point-in-time (as-of) join — the reference's load-bearing operator.

Semantics cloned from feast's Spark SQL template
(``sdk/python/feast/infra/offline_stores/contrib/spark_offline_store/
spark.py:1709-1887``) and cross-checked against the Dask dataflow form
(``offline_stores/dask.py:212-349, 1093-1270``) and the ibis form
(``offline_stores/ibis.py:384-489``):

1. stamp each entity row with ``entity_row_unique_id = hash(join_keys,
   entity_ts)`` (``spark.py:1718-1724`` uses CONCAT; we use sha2 of the
   same concat — collision-free in practice and fixed-width for shuffle);
2. time-bound scan of the feature table (min/max entity ts ± ttl pushed
   into the parquet scan — the ttl-derived bound is semantic, Catalyst
   can't derive it: SURVEY §4);
3. INNER join feature→entity on keys with ``f.ts <= e.ts`` (+ ttl lower
   bound ``f.ts >= e.ts - ttl``; ttl==0 means upper bound only, matching
   ``dask.py:1167-1200``), optional created-timestamp cutoff;
4. keep the latest feature row per entity row:
   ``ROW_NUMBER() OVER (PARTITION BY row_id ORDER BY ts DESC[, created
   DESC]) = 1`` (``spark.py:1836-1847``);
5. LEFT join the deduped features back onto the full entity frame by
   row_id — entity rows with no match survive with NULL features
   ("blank, don't drop").

Scale notes (100 TB): the window in step 4 partitions by ``row_id`` which
already embeds the timestamp, so a mega-entity (hot ``conv_id``) fans out
across partitions instead of collapsing onto one reducer (SURVEY §2.3
skew note). The raw key join in step 3 is the skew point — AQE skew-join
splits it at runtime; pass ``broadcast_features=True`` when the feature
table is dimension-sized to skip the shuffle entirely.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feast_spark.functions.text import row_id as _row_id

ROW_ID = "__entity_row_id"


def point_in_time_join(
    entity_df: DataFrame,
    feature_df: DataFrame,
    join_keys: list[str],
    feature_ts_col: str,
    entity_ts_col: str = "event_timestamp",
    created_ts_col: str | None = None,
    ttl_seconds: int | None = None,
    features: list[str] | None = None,
    prefix: str | None = None,
    broadcast_features: bool = False,
    created_cutoff: bool = False,
    entity_ts_bounds: tuple[datetime, datetime] | None = None,
    push_time_bounds: bool = False,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join ``feature_df`` onto ``entity_df``.

    Returns ``entity_df``'s columns plus one column per feature (optionally
    ``{prefix}__{name}``), each holding the value from the latest feature
    row with ``feature_ts <= entity_ts`` (within ``ttl_seconds`` when set),
    NULL when no feature row qualifies.

    ``created_cutoff=True`` additionally nulls features whose
    ``created_ts > entity_ts`` (no-backfill-leakage flag,
    ``offline_store.py:454-462``, ``dask.py:1203-1226``).

    The entity-range time bound on the feature scan is an OPTIMIZATION
    (correctness comes from the join predicates): pass
    ``entity_ts_bounds`` when the range is known (cheap, keeps the plan
    lazy), or ``push_time_bounds=True`` to pre-scan the entity frame for
    it (an eager min/max job — avoid inside multi-view accumulation where
    it re-executes every upstream join; SURVEY §4 keeps the ttl-derived
    bound explicit because Catalyst cannot derive it).

    ``tiebreak_cols`` pins determinism when (ts, created_ts) is not a
    total order over a key's feature rows.
    """
    if features is None:
        reserved = set(join_keys) | {feature_ts_col, created_ts_col}
        features = [c for c in feature_df.columns if c not in reserved]

    entity = entity_df.withColumn(ROW_ID, _row_id(join_keys, entity_ts_col))
    # distinct (keys, ts) rows — duplicates in the entity frame re-attach at
    # the final left join (reference collapses them the same way via the
    # concat row id, spark.py:1718-1724)
    entity_keys = entity.select(ROW_ID, entity_ts_col, *join_keys).dropDuplicates([ROW_ID])

    # time-bounded feature scan: push entity ts range ± ttl into the scan.
    # The ttl-derived bound is semantic — Catalyst can't infer it (SURVEY §4).
    if entity_ts_bounds is not None:
        lo_hi = {"lo": entity_ts_bounds[0], "hi": entity_ts_bounds[1]}
    elif push_time_bounds:
        lo_hi = entity_df.agg(
            F.min(entity_ts_col).alias("lo"), F.max(entity_ts_col).alias("hi")
        ).first()
    else:
        lo_hi = None
    fdf = feature_df
    if lo_hi is not None and lo_hi["hi"] is not None:
        hi: datetime = lo_hi["hi"]
        fdf = fdf.filter(F.col(feature_ts_col) <= F.lit(hi))
        if ttl_seconds:
            lo: datetime = lo_hi["lo"]
            fdf = fdf.filter(
                F.col(feature_ts_col)
                >= F.lit(lo) - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
            )

    fcols = [F.col(c) for c in join_keys] + [
        F.col(feature_ts_col).alias("__feature_ts")
    ] + [F.col(c).alias(f"__f_{c}") for c in features]
    if created_ts_col:
        fcols.append(F.col(created_ts_col).alias("__created_ts"))
    fdf = fdf.select(*fcols)

    probe = entity_keys
    if broadcast_features:
        fdf = F.broadcast(fdf)

    cond = [fdf[k] == probe[k] for k in join_keys]
    base = fdf.join(probe, cond, "inner").filter(
        F.col("__feature_ts") <= F.col(entity_ts_col)
    )
    if ttl_seconds:
        base = base.filter(
            F.col("__feature_ts")
            >= F.col(entity_ts_col) - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
        )

    order = [F.col("__feature_ts").desc()]
    if created_ts_col:
        order.append(F.col("__created_ts").desc())
    for c in tiebreak_cols or []:
        order.append(F.col(f"__f_{c}").desc())
    w = Window.partitionBy(ROW_ID).orderBy(*order)
    latest = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", entity_ts_col, *join_keys)
    )

    if created_cutoff and created_ts_col:
        # blank, don't drop: null the feature values, keep the row
        latest_e = latest.join(
            entity_keys.select(ROW_ID, entity_ts_col), ROW_ID, "inner"
        )
        for c in features:
            latest_e = latest_e.withColumn(
                f"__f_{c}",
                F.when(
                    F.col("__created_ts") <= F.col(entity_ts_col), F.col(f"__f_{c}")
                ).otherwise(F.lit(None)),
            )
        latest = latest_e.drop(entity_ts_col)

    out_name = (lambda c: f"{prefix}__{c}") if prefix else (lambda c: c)
    sel = [F.col(f"__f_{c}").alias(out_name(c)) for c in features]
    result = entity.join(latest.select(ROW_ID, *sel), ROW_ID, "left").drop(ROW_ID)
    return result
