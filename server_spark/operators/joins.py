"""Join operators (SURVEY.md §2.3). The reference does all of these as
map lookups and nested loops in Go; here each is a declarative join
whose physical strategy Catalyst/AQE picks (broadcast for dims, sorted
shuffle otherwise).

- J1 item enrich      — `ItemsMap[itemId]` lookup → broadcast hash join
- J2 hierarchy flatten— region→realm nesting → explode/joins
- J3 snapshot churn   — prev-vs-next live auction diff → full outer
- J5 unmet demand     — items with zero live auctions → left anti
- J6 as-of alignment  — nearest-entry history lookup → union + window
  `last(ignorenulls)` (Spark has no native ASOF join; this is the
  standard single-shuffle re-expression and scales as one window per
  user partition)
- J7 range/theta join — free in Spark; broadcast nested loop for bands
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(facts: DataFrame, dim: DataFrame, key: str, how: str = "inner") -> DataFrame:
    """J1 — attach dimension attributes via broadcast hash join."""
    return facts.join(F.broadcast(dim), key, how)


def snapshot_churn(prev: DataFrame, nxt: DataFrame, key: str) -> DataFrame:
    """J3 — classify keys across consecutive snapshots as new /
    removed / persisting via one full-outer join (two anti-joins would
    scan twice)."""
    p = prev.select(F.col(key).alias("k")).distinct()
    n = nxt.select(F.col(key).alias("k")).distinct()
    joined = p.withColumn("in_prev", F.lit(1)).join(
        n.withColumn("in_next", F.lit(1)), "k", "full_outer"
    )
    return joined.select(
        F.col("k").alias(key),
        F.when(F.col("in_prev").isNull(), F.lit("new"))
        .when(F.col("in_next").isNull(), F.lit("removed"))
        .otherwise(F.lit("persisting"))
        .alias("status"),
    )


def unmet_demand(items: DataFrame, auctions: DataFrame, key: str) -> DataFrame:
    """J5 — catalog items with zero live auctions (left anti join)."""
    return items.join(auctions, key, "left_anti")


def asof_align(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value: str,
    out: str,
    direction: str = "backward",
) -> DataFrame:
    """J6 — as-of join: for each left row, the nearest ``right``
    ``value`` within the ``on`` partition — the most recent with
    ``right.ts <= left.ts`` (``backward``, the default) or the next
    with ``right.ts >= left.ts`` (``forward``).

    Union-and-window form: one shuffle on ``on``, no n² range join.
    ``kind`` breaks equal-ts ties so right rows at exactly left.ts are
    visible in BOTH directions (ASOF `<=` / `>=` semantics).

    Determinism among RIGHT rows tied on (on, ts): the window
    additionally orders by the value, so backward picks the largest
    and forward the smallest tied value — a fixed rule instead of
    physical-partition order, which changed across retries and
    partitionings (r11 review finding; j13 solved the same tie with
    an explicit _tie column). NB native ASOF engines (the DuckDB
    oracle) leave this tie unspecified too — at-tie parity is a
    property of the DATA (unique (on, ts) per right side), not of
    either engine.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    # backward: rights sort BEFORE lefts at equal ts and the frame
    # looks back — forward: rights sort AFTER lefts and it looks ahead
    l = left.select(*lcols).withColumn("_kind", F.lit(1)).withColumn("_v", F.lit(None).cast("double"))
    r = (
        right.select(
            F.col(on), F.col(ts), F.col(value).cast("double").alias("_v")
        )
        .withColumn("_kind", F.lit(0 if direction == "backward" else 2))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    base = Window.partitionBy(on).orderBy(
        F.col(ts).asc(), F.col("_kind").asc(), F.col("_v").asc()
    )
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, 0)
        picked = F.last("_v", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(0, Window.unboundedFollowing)
        picked = F.first("_v", ignorenulls=True).over(w)
    return (
        unioned.withColumn(out, picked)
        .filter(F.col("_kind") == 1)
        .select(*lcols, out)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (big, skewed) ``left`` spreads
    each join key over ``n_salts`` shuffle partitions; ``right`` is
    replicated n_salts× so every salted partition still finds its
    match. Result rows are identical to ``left.join(right, key, how)``.

    When to reach for this instead of trusting AQE's skew-join split:
    AQE only splits SortMergeJoin partitions it can re-plan (not
    joins feeding aggregates it has fused, not stream-static joins),
    and a single monster key still serializes within one task's
    build side. Salting moves the fix into the logical plan. Cost:
    right side shuffles n_salts× its size — use for big-big joins
    with a skewed left; for small right sides just broadcast.

    The salt only affects row DISTRIBUTION, never matching — but it
    must be DETERMINISTIC per row: monotonically_increasing_id would
    re-salt rows when a fetch failure recomputes some map tasks
    (upstream-shuffle row order is not stable across recomputation),
    and a shuffle key that changes on retry duplicates or drops join
    rows (the SPARK-23207 nondeterministic-repartition hazard; r11
    review finding). xxhash64 over the row's columns is stable across
    retries; content-identical rows co-locating is fine — skew means
    same KEY, differing payloads, which the hash spreads.

    Two documented limits of the content-hash salt (r12 advisor
    finding):

    - Columns whose type xxhash64 cannot hash (MapType anywhere in
      the type tree) are EXCLUDED from the salt input rather than
      raising AnalysisException; the key itself is always hashable
      (it's an equi-join key) so a usable salt always exists, merely
      with less payload entropy when unhashable columns dominate.
    - Rows that are EXACT duplicates across every hashable column
      land on one salt and are not spread. That is the price of
      retry-stability: any per-row discriminator that distinguishes
      identical rows (row index, partition id under a round-robin
      upstream) changes on recomputation and re-raises the
      SPARK-23207 duplicate/drop hazard this design exists to avoid.
      Exact-duplicate skew should be collapsed upstream (count +
      re-expand, or dedup) before the join.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")

    def _hashable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    salt_cols = [
        f.name for f in left.schema.fields if _hashable(f.dataType)
    ] or [key]
    salted_l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int"),
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("_salt")
    salted_r = right.select("*", salts)
    return salted_l.join(salted_r, [key, "_salt"], how).drop("_salt")


def band_join(facts: DataFrame, bands: DataFrame, value_col: str) -> DataFrame:
    """J7 — range join of a fact value into [lo, hi) bands. The band
    table is tiny → broadcast nested-loop, no shuffle of facts."""
    cond = (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi"))
    return facts.join(F.broadcast(bands), cond, "inner")
