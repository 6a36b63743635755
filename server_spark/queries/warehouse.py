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


def scd2_history(ev: DataFrame) -> DataFrame:
    """The SCD2 transform on any (user_id, event_type, ts, event_id)
    relation — separated from the table load so property tests can
    drive it with arbitrary event streams."""
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
    return scd2_history(
        tables.load(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id"
        )
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


# ---------------------------------------------------------------------------
# U5 — CDC merge apply (MERGE INTO semantics over plain tables)
# ---------------------------------------------------------------------------

_MERGE_DAY_BASE = "2024-01-10"
_MERGE_DAY_CHG = "2024-01-11"


def _last_state_of_day(spark: SparkSession, sf_dir: str, day: str) -> DataFrame:
    """Each user's final (state, value) on ``day`` — one window keyed
    by user over the single day's slice (partition-prunable at scale)."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.filter(F.to_date("ts") == F.lit(day).cast("date"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_type").alias("state"),
                F.col("value").alias("value"))
    )


def cdc_merge(base: DataFrame, chg: DataFrame) -> DataFrame:
    """MERGE INTO semantics over (user_id, state, value) relations —
    separated from the day-slice derivation so property tests can
    drive it with arbitrary base/changeset pairs. A changeset row
    with state='error' deletes its key."""
    base = base.alias("b")
    chg = chg.alias("c")
    merged = base.join(
        chg, F.col("b.user_id") == F.col("c.user_id"), "full_outer"
    )
    return (
        merged.filter(
            ~(
                F.col("c.user_id").isNotNull()
                & (F.col("c.state") == "error")
            )
        )
        .select(
            F.coalesce(F.col("b.user_id"), F.col("c.user_id")).alias(
                "user_id"
            ),
            F.coalesce(F.col("c.state"), F.col("b.state")).alias("state"),
            r4(F.coalesce(F.col("c.value"), F.col("b.value"))).alias(
                "value"
            ),
            F.when(F.col("b.user_id").isNull(), "inserted")
            .when(F.col("c.user_id").isNull(), "kept")
            .otherwise("updated")
            .alias("merge_action"),
        )
    )


@register(
    "u5_cdc_merge",
    f"""
    WITH base AS (
      SELECT user_id, event_type AS state, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events WHERE CAST(ts AS DATE) = DATE '{_MERGE_DAY_BASE}'
      ) WHERE rn = 1
    ), chg AS (
      SELECT user_id, event_type AS state, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events WHERE CAST(ts AS DATE) = DATE '{_MERGE_DAY_CHG}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, c.user_id) AS user_id,
           COALESCE(c.state, b.state) AS state,
           {r4sql('COALESCE(c.value, b.value)')} AS value,
           CASE WHEN b.user_id IS NULL THEN 'inserted'
                WHEN c.user_id IS NULL THEN 'kept'
                ELSE 'updated' END AS merge_action
    FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
    WHERE NOT (c.user_id IS NOT NULL AND c.state = 'error')
    """,
    doc="U5 — MERGE INTO semantics over plain tables (the Delta/"
    "Iceberg upsert primitive, reference's snapshot-overwrite intake "
    "re-expressed as CDC apply): day-B's per-user last event is the "
    "changeset; matched rows update, unmatched insert, and a "
    "terminal 'error' state deletes. ONE full-outer join keyed on "
    "user_id — both sides are same-keyed window outputs, so the join "
    "reuses their shuffle partitioning; at 100 TB the base side is "
    "the standing table and the changeset is increment-sized, which "
    "AQE turns into a broadcast or bloom-gated join (j10 posture).",
    tags=("setop", "cdc", "merge"),
    late=True,
)
def u5_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc_merge(
        _last_state_of_day(spark, sf_dir, _MERGE_DAY_BASE),
        _last_state_of_day(spark, sf_dir, _MERGE_DAY_CHG),
    )


# ---------------------------------------------------------------------------
# X53 — data-quality expectations report (deequ/dbt-test shape)
# ---------------------------------------------------------------------------


@register(
    "x53_data_expectations",
    """
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(*) - COUNT(DISTINCT event_id) AS dup_event_id,
             SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
             SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
               AS bad_value,
             SUM(CASE WHEN ts > TIMESTAMP '2024-12-31 00:00:00' THEN 1
                 ELSE 0 END) AS future_ts
      FROM events
    ), o AS (
      SELECT COUNT(*) AS orphans
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
      SELECT 'unique_event_id' AS check_name, dup_event_id AS n_violations
        FROM s
      UNION ALL SELECT 'no_null_user', null_user FROM s
      UNION ALL SELECT 'value_non_negative', bad_value FROM s
      UNION ALL SELECT 'no_future_ts', future_ts FROM s
      UNION ALL SELECT 'user_in_customer', orphans FROM o
    )
    """,
    doc="EXT x53 — table-health expectations (the Deequ/dbt-test "
    "shape, the reference's intake sanity checks as a declarative "
    "report): uniqueness, null, domain, and freshness checks fold "
    "into ONE aggregate over the fact (stack() fans the scalar row "
    "out to per-check rows); referential integrity is one broadcast "
    "anti-join. Two scans total, both column-pruned. At 100 TB the "
    "agg runs map-side partial; the report is constant-sized and "
    "cheap enough to gate every ingest batch with.",
    tags=("ext", "quality", "expectations"),
    late=True,
)
def x53_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    stats = ev.agg(
        (F.count("*") - F.countDistinct("event_id")).alias("dup_event_id"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user"),
        F.sum(
            (F.col("value").isNull() | (F.col("value") < 0)).cast("long")
        ).alias("bad_value"),
        F.sum(
            (F.col("ts") > F.lit("2024-12-31 00:00:00").cast("timestamp"))
            .cast("long")
        ).alias("future_ts"),
    )
    checks = stats.select(
        F.expr(
            "stack(4, 'unique_event_id', dup_event_id, "
            "'no_null_user', null_user, "
            "'value_non_negative', bad_value, "
            "'no_future_ts', future_ts) AS (check_name, n_violations)"
        )
    )
    cust = tables.load(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        ev.select("user_id")
        .join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("user_in_customer").alias("check_name"), "n_violations")
    )
    return checks.unionAll(orphans).select(
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# S10 — SQL front end (same statement, both engines)
# ---------------------------------------------------------------------------

_S10_SQL = """
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {REV} AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
""".format(REV=r4sql("SUM(o_totalprice)"))


@register(
    "s10_sql_frontend",
    _S10_SQL,
    doc="S10 — the SQL front door: the engine's surface is not only "
    "the DataFrame API — views registered in the session catalog and "
    "ONE ANSI statement (literally the same string the DuckDB oracle "
    "runs, including the r4 canonical rounding, which is valid in "
    "both dialects) go through spark.sql into the identical Catalyst "
    "plan a DataFrame build would produce: joins broadcast, "
    "aggregates go partial/final, pruning reaches the scans.",
    tags=("scan", "sql"),
    late=True,
)
def s10_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "nation"):
        tables.load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_S10_SQL)


# ---------------------------------------------------------------------------
# U6 — incremental SCD2 maintenance (apply an event increment)
# ---------------------------------------------------------------------------


def scd2_apply_increment(history: DataFrame, new_ev: DataFrame) -> DataFrame:
    """Apply an arriving event batch onto a STANDING SCD2 table —
    the production maintenance shape the j9 rebuild only simulates:
    per-increment cost scales with the touched users, history of
    untouched users is never read past the semi-join, and the result
    is IDENTICAL to rebuilding from the full event stream (the u6
    oracle asserts exactly that equivalence).

    Assumes event time moves forward: every increment event is later
    than the touched user's last change (true for any watermarked
    stream; a violation would need the full rebuild path).

    Mechanics: the increment's users pull ONLY their open row (state
    seed + version base); change capture runs over the new events
    with the seed as the initial prev_state; new versions continue
    the user's numbering; an open row whose user changed state closes
    at the first new change. Everything keyed by user_id throughout —
    one shuffle partitioning shared by the window, joins, and union
    branches."""
    touched = new_ev.select("user_id").distinct()
    open_rows = history.filter(F.col("is_current")).join(
        touched, "user_id", "left_semi"
    )
    seed = open_rows.select(
        "user_id",
        F.col("state").alias("_seed_state"),
        F.col("version").alias("_base_version"),
    )

    w_ev = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (
        new_ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_prev", F.lag("event_type").over(w_ev))
        .join(seed, "user_id", "left")
    )
    changes = ev.filter(
        F.when(
            F.col("_prev").isNotNull(), F.col("_prev") != F.col("event_type")
        ).otherwise(
            F.col("_seed_state").isNull()
            | (F.col("_seed_state") != F.col("event_type"))
        )
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.col("event_id").alias("chg_seq"),
        F.coalesce(F.col("_base_version"), F.lit(0)).alias("_base_version"),
    )

    w_ver = Window.partitionBy("user_id").orderBy("effective_from", "chg_seq")
    new_rows = changes.select(
        "user_id",
        (F.row_number().over(w_ver) + F.col("_base_version"))
        .cast("long")
        .alias("version"),
        "state",
        "effective_from",
        F.lead("effective_from").over(w_ver).alias("effective_to"),
        F.lead("effective_from").over(w_ver).isNull().alias("is_current"),
    )

    # close the open row of every user that has at least one new change
    first_change = changes.groupBy("user_id").agg(
        F.min(F.struct("effective_from", "chg_seq")).alias("_f")
    ).select("user_id", F.col("_f.effective_from").alias("_close_at"))
    kept = (
        history.join(first_change, "user_id", "left")
        .withColumn(
            "effective_to",
            F.when(
                F.col("is_current") & F.col("_close_at").isNotNull(),
                F.col("_close_at"),
            ).otherwise(F.col("effective_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("_close_at").isNull(),
        )
        .drop("_close_at")
    )
    return kept.unionByName(new_rows)


_U6_SPLIT = "2024-01-20"


@register(
    "u6_scd2_incremental",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_state
      FROM events
      WHERE ts < TIMESTAMP '{CUT2} 00:00:00'
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
    """.replace("{CUT2}", "2024-01-25"),
    doc="U6 — INCREMENTAL SCD2 maintenance: the standing history "
    "(events before Jan 20) plus a five-day increment applied via "
    "scd2_apply_increment. The ORACLE is the full rebuild over the "
    "union — the driver hash-verifies that incremental maintenance "
    "and rebuild-from-scratch produce byte-identical histories, the "
    "strongest possible equivalence for an incremental operator. "
    "Per-increment cost scales with touched users (semi-join gate), "
    "not history size.",
    tags=("setop", "scd2", "incremental"),
    late=True,
)
def u6_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cut1 = F.lit(_U6_SPLIT + " 00:00:00").cast("timestamp")
    cut2 = F.lit("2024-01-25 00:00:00").cast("timestamp")
    history = scd2_history(ev.filter(F.col("ts") < cut1))
    increment = ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2))
    return scd2_apply_increment(history, increment)


# ---------------------------------------------------------------------------
# J11 — point-in-time (SCD2 interval) lookup join
# ---------------------------------------------------------------------------


@register(
    "j11_scd2_lookup",
    f"""
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
    ), dim AS (
      SELECT user_id, state, effective_from,
             lead(effective_from) OVER (
               PARTITION BY user_id ORDER BY effective_from, chg_seq
             ) AS effective_to
      FROM changes
    )
    SELECT p.event_id, p.user_id, p.ts,
           d.state AS state_at_purchase,
           {r4sql("p.value")} AS value
    FROM (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.effective_from
     AND (d.effective_to IS NULL OR p.ts < d.effective_to)
    """,
    doc="J11 — point-in-time lookup against the J9 SCD2 dimension: "
    "each purchase is tagged with the user's state VALID AT ITS "
    "TIMESTAMP ([effective_from, effective_to) interval containment) "
    "— the canonical warehouse pattern for joining facts to a "
    "versioned dimension without leaking future attribute values. "
    "Plans as an equi-join on user_id with the interval test as a "
    "residual (no cartesian); versions-per-user is small, so the "
    "residual scans a handful of rows per match. When fact and "
    "dimension derive from the SAME stream, the J6 union+window "
    "as-of form does it in one shuffle — this form is for an "
    "independently maintained SCD2 table.",
    tags=("join", "scd2", "asof"),
    late=True,
)
def j11_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = scd2_history(
        tables.load(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id"
        )
    ).select(
        F.col("user_id").alias("d_user"),
        "state",
        "effective_from",
        "effective_to",
    )
    purchases = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    return purchases.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts") >= F.col("effective_from"))
        & (
            F.col("effective_to").isNull()
            | (F.col("ts") < F.col("effective_to"))
        ),
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("state").alias("state_at_purchase"),
        r4(F.col("value")).alias("value"),
    )
