"""Warehouse-shaped operators: SCD2 history build and runtime-filtered
fact joins (SURVEY.md §2.3/§2.6 extensions).

The reference materializes per-realm price history by rewriting
whole snapshots (`app/pkg/state/state_pricelisthistories.go` intake
[M]); the warehouse-native equivalent is a slowly-changing-dimension
(type 2) build: collapse the event stream into versioned validity
intervals per key. At 100 TB this is the canonical "one shuffle, two
windows" shape — both windows partition by the same key, so Catalyst
plans a single Exchange and the second sort is free after the first.

j10 is the runtime-filter posture made visible: a selective dimension
slice joined to the big fact. On local[32] AQE converts it to a
broadcast join; on a 1000-executor cluster where the filtered dim is
too big to broadcast, the session's
``spark.sql.optimizer.runtime.bloomFilter.enabled`` posture (see
session.py) injects a bloom filter on the fact's join key so
non-matching fact rows die at the scan side of the shuffle instead of
crossing the wire (tests/test_plans.py proves the injection fires
with cluster-shaped thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from server_spark import tables
from server_spark.parity import r4, r4sql
from server_spark.registry import register

# ---------------------------------------------------------------------------
# J9 — SCD2 history build (change capture → versioned validity ranges)
# ---------------------------------------------------------------------------


@register(
    "j9_scd2_user_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_state
      FROM events
    ), changes AS (
      SELECT user_id, event_type AS state, ts AS effective_from,
             event_id AS chg_seq
      FROM ordered
      WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           state, effective_from,
           lead(effective_from) OVER w AS effective_to,
           (lead(effective_from) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY effective_from, chg_seq)
    """,
    doc="J9 — SCD2 (type-2 slowly-changing dimension) build from the "
    "raw event stream: per user, consecutive events with the same "
    "state collapse into one row; each state change opens a new "
    "version with [effective_from, effective_to) validity and the "
    "open-ended row flagged is_current. Both windows partition by "
    "user_id, so the plan carries ONE shuffle; the change filter "
    "runs between the two sorts, shrinking the second window's input "
    "to the change rows only. event_id tiebreaks make version "
    "numbering deterministic under same-timestamp changes.",
    tags=("join", "window", "scd2"),
    late=True,
)
def j9_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("event_type").over(w_ev))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("effective_from"),
            F.col("event_id").alias("chg_seq"),
        )
    )
    w_ver = Window.partitionBy("user_id").orderBy("effective_from", "chg_seq")
    return changes.select(
        "user_id",
        F.row_number().over(w_ver).cast("long").alias("version"),
        "state",
        "effective_from",
        F.lead("effective_from").over(w_ver).alias("effective_to"),
        F.lead("effective_from").over(w_ver).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# J10 — selective-dimension fact join (runtime-filter shape)
# ---------------------------------------------------------------------------

_J10_BAL_MIN = 6000.0


@register(
    "j10_runtime_filtered_join",
    f"""
    SELECT e.user_id, c.c_name AS user_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {r4sql('SUM(e.value)')} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_acctbal > {_J10_BAL_MIN}
    GROUP BY e.user_id, c.c_name
    """,
    doc="J10 — big fact joined to a selectively-filtered dimension. "
    "Declared as a plain join + filter; the physical strategy is "
    "Catalyst's choice: local AQE broadcasts the filtered dim, a "
    "cluster where the slice exceeds the broadcast threshold gets a "
    "shuffle join with a runtime-injected bloom filter on "
    "events.user_id (session posture; injection plan-tested with "
    "cluster-shaped thresholds in tests/test_plans.py), so fact rows "
    "failing the filter are dropped pre-shuffle.",
    tags=("join", "runtime-filter"),
    late=True,
)
def j10_runtime_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select("user_id", "value")
    cust = (
        tables.load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > _J10_BAL_MIN)
        .select("c_custkey", "c_name")
    )
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("user_id", F.col("c_name").alias("user_name"))
        .agg(
            F.count("*").alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )
    )
