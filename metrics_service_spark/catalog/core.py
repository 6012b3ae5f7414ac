"""Core operator queries: filters, aggregations, windows, sessionization,
rollup, spine/zero-fill, pivot, range-join, COUNTER two-level aggs.

Reference parity notes cite SURVEY.md §2 ids (P*, A*, W*, O*, F*).
Numeric discipline for oracle comparability: money-ish doubles are
summed as DECIMAL(18,2) (exact, order-independent) then rounded and
cast back to double; timestamps are emitted as epoch microseconds or
formatted strings — never raw floats from multi-order accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metrics_service_spark.catalog import QuerySpec
from metrics_service_spark.functions.stable import (
    round_frac,
    round_frac_int,
    sql_round_frac,
    sql_round_frac_int,
)
from metrics_service_spark.operators.counter import counter_report
from metrics_service_spark.operators.iprange import range_join
from metrics_service_spark.operators.sessionize import (
    hash_session_id,
    last_event_per_key,
    session_bounds,
    sessionize,
    top_k_per_key,
)
from metrics_service_spark.operators.spine import date_spine, zero_fill
from metrics_service_spark.sources.eventlog import (
    COUNTER_FILTER_SQL,
    EVENTLOG_SQL,
    counter_filter,
    eventlog_view,
)
from metrics_service_spark.sources.tables import load_table


def dec_sum(col, alias, scale=2):
    """Order-independent exact sum of a double money column: sum as
    decimal, round, surface as double (identical in Spark & DuckDB)."""
    return (
        F.round(F.sum(F.col(col).cast("decimal(18,2)")), scale)
        .cast("double")
        .alias(alias)
    )


DEC_SUM_SQL = "CAST(round(sum(CAST({col} AS DECIMAL(18,2))), 2) AS DOUBLE)"


# --- P2/P3/P6/O1/O2: predicate stack + deterministic limit ---------------
def q_ev_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("event_type").isin("view", "click")
            & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
            & (F.col("value") >= 50.0)
        )
        .orderBy("event_id")
        .limit(200)
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


ORACLE_EV_FILTER = """
SELECT event_id, event_type, user_id, epoch_us(ts) AS ts_us
FROM events
WHERE event_type IN ('view','click')
  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
  AND value >= 50.0
ORDER BY event_id
LIMIT 200
"""


# --- A1/A2/A3/A5: composite group-by + distinct + date histogram ---------
def q_ev_monthly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum("value", "total_value"),
    )


ORACLE_EV_MONTHLY = f"""
SELECT strftime(ts, '%Y-%m') AS month, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {DEC_SUM_SQL.format(col="value")} AS total_value
FROM events
GROUP BY 1, 2
"""


# --- DAU / rolling MAU / stickiness ----------------------------------------
def q_ev_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, EXACT trailing-28-day active users, and the
    DAU/MAU stickiness ratio.  Rolling DISTINCT has no window form; the
    exact shape is the contribution explode — each (user, day) activity
    contributes to the 28 days it stays inside the trailing window,
    then one countDistinct per day (equi-groupBy, no range join).  The
    28x row amplification is the price of exactness; at 10^11 events
    the sketch path is per-day HLL sketches merged over the window
    (approx_count_distinct), same plan shape minus the explode."""
    ev = load_table(spark, sf_dir, "events")
    # u_days feeds both the DAU and the MAU branch — materialize the
    # narrow distinct frame once (multi-consumer discipline)
    u_days = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dau = u_days.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = u_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 27))
        ).alias("day"),
    )
    mau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("mau28"))
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau28",
        round_frac(F.col("dau"), F.col("mau28"), 4).alias("stickiness"),
    )


ORACLE_EV_DAU = f"""
WITH u_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM u_days GROUP BY 1
), contrib AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS day
  FROM u_days, range(0, 28) t(i)
), mau AS (
  SELECT day, count(DISTINCT user_id) AS mau28 FROM contrib GROUP BY 1
)
SELECT dau.day, dau.dau, mau.mau28,
       {sql_round_frac("dau.dau", "mau.mau28", 4)} AS stickiness
FROM dau JOIN mau USING (day)
"""


# --- weekly cohort retention -----------------------------------------------
def q_ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week (Monday
    truncation — identical in Spark and DuckDB), counted distinct in
    each subsequent week offset.  The cohort frame derives from the
    SAME distinct (user, week) frame (week truncation is monotone, so
    min(week) = trunc(min(ts))) — one events scan, and the join side
    is one row per user, so the planner (AQE) picks the join strategy;
    no forced broadcast of a user-cardinality frame."""
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


ORACLE_EV_RETENTION = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT f.cohort_week,
       CAST(datediff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


# --- as-of join: event to latest order at event time -----------------------
def q_ev_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each event joined to the
    customer's LATEST order at or before the event time (union-window
    as-of join, operators/asof.py — one shuffle, no per-key range
    scan).  The order dim is deduped to one row per (custkey, date)
    first: ambiguous as-of is undefined in every engine.  Oracle =
    DuckDB's native ASOF LEFT JOIN."""
    from metrics_service_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .join(orders, ["o_custkey", "o_orderdate", "o_orderkey"])
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        dim,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "o_orderkey",
        "o_totalprice",
    )


ORACLE_EV_ASOF = """
WITH dim AS (
  SELECT o.o_custkey, o.o_orderdate, o.o_orderkey, o.o_totalprice
  FROM (
    SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
  ) d JOIN orders o USING (o_custkey, o_orderdate, o_orderkey)
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       dim.o_orderkey, dim.o_totalprice
FROM events e
ASOF LEFT JOIN dim
  ON e.user_id = dim.o_custkey AND e.ts >= dim.o_orderdate
"""


# --- exact distributed median per group -----------------------------------
def q_ev_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete median of `value` per event type WITHOUT a
    per-group row sort: the 2-decimal value column has bounded
    cardinality, so `group_quantile_disc` works off the (group, value)
    histogram — the generalization of the quality gate's cutoff
    trick to arbitrary per-group quantiles."""
    from metrics_service_spark.operators.gate import group_quantile_disc

    ev = load_table(spark, sf_dir, "events")
    return group_quantile_disc(ev, ["event_type"], "value", 0.5)


ORACLE_EV_MEDIAN = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, value AS q_value, n
FROM r
WHERE rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
"""


# --- rolling 7-day window over the daily frame ---------------------------
def q_ev_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals + a 7-day rolling sum.  The range-frame window runs
    over the DAILY frame (bounded cardinality — one row per day, like
    the quality gate's histogram), so the only corpus-sized work is the
    map-side-combined groupBy; the unpartitioned window never sees more
    rows than there are days."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "day", "n_events", F.sum("n_events").over(w).alias("n_7d")
    )


ORACLE_EV_ROLLING = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events GROUP BY 1
)
SELECT day, n_events,
       CAST(sum(n_events) OVER (ORDER BY day
            RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_7d
FROM daily
"""


# --- ordered conversion funnel over sessions ------------------------------
def q_ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel view -> click -> purchase within a gap
    session: stage 1 = saw a view, stage 2 = a click strictly after the
    first view, stage 3 = a purchase strictly after that click.
    Computed as three conditional-min aggregations over the sessionized
    events (each a map-side-combined groupBy on the session key — no
    window over raw events); output is sessions per reached stage.

    The sessionized projection is materialized once — the three agg
    passes would otherwise each re-run the sessionization window over
    the raw events (same discipline as the gate/minhash checkpoints:
    materialize the narrow multi-consumed frame, never recompute the
    expensive upstream)."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap_minutes=60, order_tiebreak=["event_id"]
    ).select("user_id", "session_seq", "ts", "event_type").localCheckpoint(eager=False)
    keys = ["user_id", "session_seq"]
    v = sess.groupBy(*keys).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    c = (
        sess.join(v, keys)
        .groupBy(*keys)
        .agg(
            F.first("t_view").alias("t_view"),
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click"),
        )
    )
    p = (
        sess.join(c, keys)
        .groupBy(*keys)
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase"),
        )
    )
    staged = p.select(
        (
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
        ).alias("funnel_stage")
    )
    return staged.groupBy("funnel_stage").agg(F.count(F.lit(1)).alias("n_sessions"))


ORACLE_EV_FUNNEL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 60 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
), v AS (
  SELECT user_id, session_seq,
         min(ts) FILTER (event_type = 'view') AS t_view
  FROM sess GROUP BY 1, 2
), c AS (
  SELECT s.user_id, s.session_seq, any_value(v.t_view) AS t_view,
         min(s.ts) FILTER (s.event_type = 'click' AND s.ts > v.t_view) AS t_click
  FROM sess s JOIN v USING (user_id, session_seq) GROUP BY 1, 2
), p AS (
  SELECT s.user_id, s.session_seq, any_value(c.t_view) AS t_view,
         any_value(c.t_click) AS t_click,
         min(s.ts) FILTER (s.event_type = 'purchase' AND s.ts > c.t_click)
             AS t_purchase
  FROM sess s JOIN c USING (user_id, session_seq) GROUP BY 1, 2
)
SELECT CASE WHEN t_purchase IS NOT NULL THEN 3
            WHEN t_click IS NOT NULL THEN 2
            WHEN t_view IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage,
       count(*) AS n_sessions
FROM p GROUP BY 1
"""


# --- W2/A6: gap sessionization + per-session bounds ----------------------
def _sessions(spark: SparkSession, sf_dir: str, min_events: int) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap_minutes=60, order_tiebreak=["event_id"]
    )
    bounds = session_bounds(sess, "user_id", "ts", min_events=min_events)
    return bounds.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


def q_ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sessions(spark, sf_dir, 1)


def q_ev_session_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sessions(spark, sf_dir, 3)


def q_ev_sessionize_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-fidelity flagged variant: reference-style globally monotone
    session ids (metricselasticsearch.py:598-627) on top of the gap
    sessionizer — numbered by session start time via the distributed
    two-phase rank (operators/rank.global_row_number; no full-data
    global sort).  The rank runs directly over the session BOUNDS so
    events are sessionized exactly once."""
    from metrics_service_spark.operators.rank import global_row_number
    from metrics_service_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_minutes=60, order_tiebreak=["event_id"])
    bounds = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("st"),
        F.max("ts").alias("en"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ranked = global_row_number(
        bounds,
        bucket=F.to_date("st"),
        order=[F.col("st"), F.col("user_id"), F.col("session_seq")],
        out_col="global_session_id",
    )
    return ranked.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.col("global_session_id").cast("long").alias("global_session_id"),
        F.unix_micros("st").alias("session_start_us"),
        F.unix_micros("en").alias("session_end_us"),
        "n_events",
    )


SESSION_QUANTILE_PERCENTS = [50, 90, 99]


def q_ev_session_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session-duration percentiles (p50/p90/p99 of duration in
    SECONDS) — the latency-style SLO view of the sessionizer's output,
    and the events-side consumer of `operators/rank.py
    exact_group_quantiles`: durations quantize to whole seconds, so
    the (day, duration) histogram is value-domain-bounded and the
    per-day window runs over distinct durations, never session rows.
    Exact and integer-only end to end (epoch-µs difference, floor-div
    to seconds, histogram-rank targets).  NEW r14 surface."""
    from metrics_service_spark.operators.rank import exact_group_quantiles
    from metrics_service_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap_minutes=60, order_tiebreak=["event_id"]
    )
    bounds = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    d = bounds.select(
        F.date_format("st", "yyyy-MM-dd").alias("day"),
        F.floor(
            (F.unix_micros("en") - F.unix_micros("st")) / F.lit(1_000_000)
        ).alias("dur_s"),
    )
    q = exact_group_quantiles(
        d, ["day"], "dur_s", percents=SESSION_QUANTILE_PERCENTS
    )
    return q.select(
        "day",
        *[
            F.col(f"p{p}").cast("long").alias(f"p{p}")
            for p in SESSION_QUANTILE_PERCENTS
        ],
    )


ORACLE_EV_SESSION_QUANTILES = f"""
WITH sess_rows AS ({{sessions}}),
d AS (
  SELECT strftime(make_timestamp(session_start_us), '%Y-%m-%d') AS day,
         (session_end_us - session_start_us) // 1000000 AS dur_s
  FROM sess_rows
), h AS (
  SELECT day, dur_s AS v, count(*) AS cnt FROM d GROUP BY 1, 2
), c AS (
  SELECT day, v, sum(cnt) OVER (PARTITION BY day ORDER BY v) AS cum FROM h
), n AS (
  SELECT day, sum(cnt) AS n FROM h GROUP BY 1
), t AS (
  SELECT day, p, CAST(floor((n * p + 99) / 100.0) AS BIGINT) AS tgt
  FROM n CROSS JOIN (SELECT unnest({SESSION_QUANTILE_PERCENTS}) AS p)
), q AS (
  SELECT t.day, t.p, min(c.v) AS qv
  FROM t JOIN c ON c.day = t.day AND c.cum >= t.tgt
  GROUP BY 1, 2
)
SELECT day,
{",".join(f"       CAST(max(CASE WHEN p = {p} THEN qv END) AS BIGINT) AS p{p}" for p in SESSION_QUANTILE_PERCENTS)}
FROM q GROUP BY day
"""


ORACLE_EV_SESS_GLOBAL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 60 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
), bounds AS (
  SELECT user_id, session_seq, min(ts) AS st, max(ts) AS en,
         count(*) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT user_id, session_seq,
       CAST(row_number() OVER (ORDER BY st, user_id, session_seq) AS BIGINT)
           AS global_session_id,
       epoch_us(st) AS session_start_us,
       epoch_us(en) AS session_end_us,
       n_events
FROM bounds
"""


def q_ev_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe bucketed sessionizer, held to the SAME oracle as
    the plain one — the output contract is bit-identical (the stitch
    logic is the thing under test)."""
    from metrics_service_spark.operators.sessionize import sessionize_bucketed

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize_bucketed(
        ev, "user_id", "ts", gap_minutes=60, bucket_days=7,
        order_tiebreak=["event_id"],
    )
    bounds = session_bounds(sess, "user_id", "ts", min_events=1)
    return bounds.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


def _oracle_sessions(having: str) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 60 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events
FROM sess
GROUP BY user_id, session_seq
{having}
"""


# --- W1: last event per key ----------------------------------------------
def q_ev_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return last_event_per_key(ev, "user_id", "ts", tiebreak=["event_id"]).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


ORACLE_EV_LAST = """
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
"""


# --- O3: top-k per group -------------------------------------------------
def q_ev_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    topk = top_k_per_key(
        ev, "event_type", [F.col("value").desc(), F.col("event_id").asc()], 3
    )
    return topk.select("event_type", "event_id", F.col("rank").cast("int").alias("rank"))


ORACLE_EV_TOP3 = """
SELECT event_type, event_id, CAST(rank AS INT) AS rank
FROM (SELECT event_type, event_id, row_number() OVER (
        PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
      FROM events)
WHERE rank <= 3
"""


# --- A9: partial ROLLUP cube (mat-view analog) ---------------------------
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
               count(*) AS n
        FROM orders
        GROUP BY o_orderstatus, ROLLUP(year(o_orderdate), month(o_orderdate))
        """
    )


ORACLE_ORDERS_ROLLUP = """
SELECT o_orderstatus,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus, ROLLUP(year(o_orderdate), month(o_orderdate))
"""


# --- A12: date spine + zero-fill -----------------------------------------
def q_ev_day_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_signups"))
    )
    spine = date_spine(spark, "2024-01-01", "2024-02-15")
    filled = zero_fill(spine, agg, ["d"], {"n_signups": 0})
    return filled.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_signups").cast("long").alias("n_signups"),
    )


ORACLE_EV_SPINE = """
WITH spine AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '2024-01-01', DATE '2024-02-15', INTERVAL 1 DAY) t(gs)
), agg AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n_raw
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT strftime(spine.d, '%Y-%m-%d') AS day,
       CAST(coalesce(agg.n_raw, 0) AS BIGINT) AS n_signups
FROM spine LEFT JOIN agg USING (d)
"""


# --- A12 pivot: wide daily counts per event type -------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_ev_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


ORACLE_EV_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY 1
"""


# --- A10/W4/F12: COUNTER report over the eventlog adapter ----------------
def q_counter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = eventlog_view(load_table(spark, sf_dir, "events"))
    filtered = counter_filter(ev).withColumn(
        "sess", hash_session_id(F.col("ipAddress"), F.lit("UA"), F.col("dateLogged"))
    )
    return counter_report(filtered, "sess", ["country"]).select(
        "country",
        F.col("total_investigations").cast("long").alias("total_investigations"),
        F.col("unique_investigations").cast("long").alias("unique_investigations"),
        F.col("total_requests").cast("long").alias("total_requests"),
        F.col("unique_requests").cast("long").alias("unique_requests"),
    )


ORACLE_COUNTER = f"""
WITH eventlog AS ({EVENTLOG_SQL}),
filtered AS (
  SELECT *, md5(ipAddress || ' ' || 'UA') || '|' || strftime(dateLogged, '%Y%m%d%H') AS sess
  FROM eventlog WHERE {COUNTER_FILTER_SQL}
),
g1i AS (SELECT sess, country, count(*) AS n FROM filtered GROUP BY 1, 2),
inv AS (SELECT country, count(*) AS unique_investigations,
               CAST(sum(n) AS BIGINT) AS total_investigations FROM g1i GROUP BY 1),
g1r AS (SELECT sess, country, count(*) AS n FROM filtered
        WHERE formatType = 'DATA' GROUP BY 1, 2),
req AS (SELECT country, count(*) AS unique_requests,
               CAST(sum(n) AS BIGINT) AS total_requests FROM g1r GROUP BY 1)
SELECT coalesce(inv.country, req.country) AS country,
       coalesce(total_investigations, 0) AS total_investigations,
       coalesce(unique_investigations, 0) AS unique_investigations,
       coalesce(total_requests, 0) AS total_requests,
       coalesce(unique_requests, 0) AS unique_requests
FROM inv FULL OUTER JOIN req ON inv.country = req.country
"""


# --- F16/F17 analog: broadcast range join (bucketed hash-join path) ------
TIERS = [(0, 50, "T0"), (50, 100, "T1"), (100, 150, "T2"), (150, 300, "T3")]


def q_ev_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(TIERS, "lo INT, hi INT, tag STRING")
    joined = range_join(ev, tiers, "value", how="left", bucket_width=50)
    return joined.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value", "total_value")
    )


ORACLE_EV_TIERS = f"""
WITH tiers(lo, hi, tag) AS (VALUES (0, 50, 'T0'), (50, 100, 'T1'),
                                   (100, 150, 'T2'), (150, 300, 'T3'))
SELECT t.tag, count(*) AS n, {DEC_SUM_SQL.format(col="e.value")} AS total_value
FROM events e LEFT JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tag
"""


# --- W4: hash-bucket session ids -----------------------------------------
def q_ev_hash_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = eventlog_view(load_table(spark, sf_dir, "events"))
    return ev.groupBy(
        hash_session_id(F.col("ipAddress"), F.lit("UA"), F.col("dateLogged")).alias(
            "session_key"
        )
    ).agg(F.count(F.lit(1)).alias("n_events"))


ORACLE_EV_HASH_SESS = f"""
WITH eventlog AS ({EVENTLOG_SQL})
SELECT md5(ipAddress || ' ' || 'UA') || '|' || strftime(dateLogged, '%Y%m%d%H') AS session_key,
       count(*) AS n_events
FROM eventlog
GROUP BY 1
"""


# --- F13/F19: JSON blob -> map analytics (props / queryParts shape) ------
def q_ev_props_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The logstash kv/queryParts pattern (search.conf:73-88) and the
    reference's JSON blob columns (citations.report/metadata): parse the
    props JSON into a map, explode, aggregate per key."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,string>")
        ).alias("k", "v")
    )
    return kv.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("v").alias("n_distinct_values"),
    )


ORACLE_EV_PROPS_KV = """
SELECT k,
       count(*) AS n,
       CAST(count(DISTINCT json_extract_string(props, '$.' || k))
            AS BIGINT) AS n_distinct_values
FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
GROUP BY 1
"""


# --- A2: approx unique counts (the reference's ES cardinality/HLL path) --
def q_ev_monthly_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly unique users via approx_count_distinct — the HLL family
    the reference's `cardinality` agg uses for every "unique" metric
    (metricsreader.py:196-203).  No oracle: HLL estimates differ across
    engines by design; the exact twin (`ev_monthly_stats`) is the
    oracle-checked variant, and the test bound lives in
    tests/test_catalog_oracle.py (rows-only) + the relative-error check
    here via the exact query."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


# --- J5/U5/F18: array-membership join (citation_metadata node_id ANY) ----
def q_ev_tag_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `'x' = ANY(array_col)` membership queries
    (metricsreader.py:827-830,1545) as explode + group: per tag (rows
    with empty tags under '(none)') count events and distinct sessions."""
    ev = eventlog_view(load_table(spark, sf_dir, "events"))
    return (
        ev.select(
            F.explode_outer("tags").alias("tag"), F.col("sessionId"), F.col("eventId")
        )
        .withColumn("tag", F.coalesce(F.col("tag"), F.lit("(none)")))
        .groupBy("tag")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("sessionId").alias("n_sessions"),
        )
    )


ORACLE_EV_TAG_MEMBERSHIP = f"""
WITH eventlog AS ({EVENTLOG_SQL})
SELECT coalesce(t.tag, '(none)') AS tag,
       count(*) AS n_events,
       CAST(count(DISTINCT sessionId) AS BIGINT) AS n_sessions
FROM eventlog LEFT JOIN LATERAL unnest(tags) AS t(tag) ON true
GROUP BY 1
"""


# --- M7: SUSHI per-(pid,country) COUNTER instances -----------------------
def q_sushi_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metrics_service_spark.plans.sushi import sushi_instances

    ev = counter_filter(eventlog_view(load_table(spark, sf_dir, "events")))
    return sushi_instances(ev)


ORACLE_SUSHI_INSTANCES = f"""
WITH eventlog AS ({EVENTLOG_SQL}),
ev AS (
  SELECT pid, lower(coalesce(country, 'n/a')) AS country, formatType,
         sessionId
  FROM eventlog WHERE {COUNTER_FILTER_SQL}
),
inv AS (
  SELECT pid, country,
         CAST(count(*) AS BIGINT) AS total_investigations,
         CAST(count(DISTINCT CAST(sessionId AS VARCHAR) || '|' || formatType)
              AS BIGINT) AS unique_investigations
  FROM ev WHERE formatType IN ('METADATA','DATA') GROUP BY 1, 2
),
req AS (
  SELECT pid, country,
         CAST(count(*) AS BIGINT) AS total_requests,
         CAST(count(DISTINCT sessionId) AS BIGINT) AS unique_requests
  FROM ev WHERE formatType = 'DATA' GROUP BY 1, 2
)
SELECT pid, country,
       coalesce(total_investigations, 0) AS total_investigations,
       coalesce(unique_investigations, 0) AS unique_investigations,
       coalesce(total_requests, 0) AS total_requests,
       coalesce(unique_requests, 0) AS unique_requests
FROM inv FULL JOIN req USING (pid, country)
"""



# --- W: inter-event gap statistics ----------------------------------------
def q_ev_interevent_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event time stats: consecutive-event gaps (lag
    window over (ts, event_id) — the reference orders ES session scans
    the same way, metricselasticsearch.py:714-719), then min/max/avg
    per user.  Gaps stay exact int64 microseconds; the single final
    division is the only float, so DuckDB reproduces it bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
        )
        .withColumn("prev", F.lag("us").over(w))
        .filter(F.col("prev").isNotNull())
        .select("user_id", (F.col("us") - F.col("prev")).alias("gap"))
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap").alias("min_gap_us"),
        F.max("gap").alias("max_gap_us"),
        (F.sum("gap") / F.count(F.lit(1))).alias("avg_gap_us"),
    )


ORACLE_EV_GAP = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id,
       count(*) AS n_gaps,
       min(gap) AS min_gap_us,
       max(gap) AS max_gap_us,
       CAST(sum(gap) AS DOUBLE) / count(*) AS avg_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""

QUERIES: dict[str, QuerySpec] = {
    "ev_props_kv": QuerySpec(
        q_ev_props_kv,
        ORACLE_EV_PROPS_KV,
        "F13/F19 JSON blob -> map explode analytics",
        ("core",),
    ),
    "ev_monthly_stats_approx": QuerySpec(
        q_ev_monthly_stats_approx,
        None,
        "A2 approx (HLL) unique counts, flagged variant",
        ("core",),
        exact_twin="ev_monthly_stats",
    ),
    "ev_tag_membership": QuerySpec(
        q_ev_tag_membership,
        ORACLE_EV_TAG_MEMBERSHIP,
        "J5/F18 array-membership explode join",
        ("core",),
    ),
    "sushi_instances": QuerySpec(
        q_sushi_instances,
        ORACLE_SUSHI_INSTANCES,
        "M7 SUSHI COUNTER instances per (pid, country)",
        ("core",),
    ),
    "ev_filter_project": QuerySpec(
        q_ev_filter_project, ORACLE_EV_FILTER, "P2/P3/P6 predicate stack", ("core",)
    ),
    "ev_monthly_stats": QuerySpec(
        q_ev_monthly_stats, ORACLE_EV_MONTHLY, "A1/A2/A5 composite agg", ("core",)
    ),
    "ev_sessionize": QuerySpec(
        q_ev_sessionize, _oracle_sessions(""), "W2 gap sessionization", ("core",)
    ),
    "ev_session_quantiles": QuerySpec(
        q_ev_session_quantiles,
        ORACLE_EV_SESSION_QUANTILES.format(sessions=_oracle_sessions("")),
        "per-day session-duration percentiles via histogram rank "
        "(exact, integer-only; window over distinct seconds)",
        ("core",),
    ),
    "ev_rolling_7d": QuerySpec(
        q_ev_rolling_7d,
        ORACLE_EV_ROLLING,
        "7-day rolling sum over the daily frame",
        ("core",),
    ),
    "ev_interevent_gap": QuerySpec(
        q_ev_interevent_gap,
        ORACLE_EV_GAP,
        "per-user inter-event gap min/max/avg (lag window, exact us)",
        ("core",),
    ),
    "ev_value_median": QuerySpec(
        q_ev_value_median,
        ORACLE_EV_MEDIAN,
        "exact per-group discrete median via value histogram",
        ("core",),
    ),
    "ev_asof_orders": QuerySpec(
        q_ev_asof_orders,
        ORACLE_EV_ASOF,
        "as-of join: event to latest order at event time",
        ("core",),
    ),
    "ev_retention": QuerySpec(
        q_ev_retention,
        ORACLE_EV_RETENTION,
        "weekly cohort retention (first-seen week x week offset)",
        ("core",),
    ),
    "ev_dau_stickiness": QuerySpec(
        q_ev_dau_stickiness,
        ORACLE_EV_DAU,
        "DAU / exact trailing-28d MAU / stickiness via contribution explode",
        ("core",),
    ),
    "ev_funnel": QuerySpec(
        q_ev_funnel,
        ORACLE_EV_FUNNEL,
        "ordered view->click->purchase funnel per session",
        ("core",),
    ),
    "ev_session_having": QuerySpec(
        q_ev_session_having,
        _oracle_sessions("HAVING count(*) >= 3"),
        "A6 session bounds + HAVING",
        ("core",),
    ),
    "ev_sessionize_global": QuerySpec(
        q_ev_sessionize_global,
        ORACLE_EV_SESS_GLOBAL,
        "W2 exact-fidelity globally monotone session ids",
        ("core",),
    ),
    "ev_sessionize_bucketed": QuerySpec(
        q_ev_sessionize_bucketed,
        _oracle_sessions(""),
        "W2 skew-safe bucketed sessionization (same oracle as plain)",
        ("core",),
    ),
    "ev_last_per_user": QuerySpec(
        q_ev_last_per_user, ORACLE_EV_LAST, "W1 top-1 per key", ("core",)
    ),
    "ev_top3_per_type": QuerySpec(
        q_ev_top3_per_type, ORACLE_EV_TOP3, "O3 top-k per group", ("core",)
    ),
    "orders_rollup": QuerySpec(
        q_orders_rollup, ORACLE_ORDERS_ROLLUP, "A9 partial ROLLUP", ("core",)
    ),
    "ev_day_spine": QuerySpec(
        q_ev_day_spine, ORACLE_EV_SPINE, "A12 spine zero-fill", ("core",)
    ),
    "ev_pivot_daily": QuerySpec(
        q_ev_pivot_daily, ORACLE_EV_PIVOT, "A12 pivot", ("core",)
    ),
    "counter_report": QuerySpec(
        q_counter_report, ORACLE_COUNTER, "A10 COUNTER unique/total", ("core",)
    ),
    "ev_value_tiers": QuerySpec(
        q_ev_value_tiers, ORACLE_EV_TIERS, "F16/F17 broadcast range join", ("core",)
    ),
    "ev_hash_sessions": QuerySpec(
        q_ev_hash_sessions, ORACLE_EV_HASH_SESS, "W4 hash session", ("core",)
    ),
}


# --- DAU / MAU sketch variants (the 100x-scale path) -----------------------
def q_ev_dau_stickiness_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28d MAU via threshold hash sampling (fixed-threshold
    KMV): users whose md5 prefix falls under a threshold form a
    deterministic Bernoulli sample (p = 192/256 here; the knob dials
    DOWN as cardinality grows — p=1/1024 at 10^9 users), counted
    distinct per window day and scaled by 1/p.  The sample filter runs
    BEFORE the 28x window explode, so the amplified frame is p x |user
    days| — that ordering is the scale win over the exact query.
    Deterministic in both engines (md5 of the decimal user_id string),
    hence oracle-exact, unlike the HLL twin."""
    ev = load_table(spark, sf_dir, "events")
    u_days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = u_days.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    sampled = u_days.filter(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "c0"
    )
    contrib = sampled.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 27))).alias("day"),
    )
    # the 1/p = 256/192 = 4/3 scale-up and the downstream stickiness
    # ratio both run in exact integer arithmetic (functions/stable.py):
    # est_x10k is round_half_up(10^4 * 4*count/3) as a BIGINT, so the
    # emitted doubles are single exact-int divisions on both engines
    mau = contrib.groupBy("day").agg(
        round_frac_int(
            F.countDistinct("user_id") * F.lit(4), F.lit(3), 4
        ).alias("est_x10k")
    )
    return dau.join(mau, "day").select(
        "day",
        "dau",
        (F.col("est_x10k").cast("double") / F.lit(10000.0)).alias("mau28_est"),
        round_frac(
            F.col("dau") * F.lit(10000),
            F.nullif(F.col("est_x10k"), F.lit(0)),
            4,
        ).alias("stickiness_est"),
    )


ORACLE_EV_DAU_KMV = f"""
WITH u_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM u_days GROUP BY 1
), sampled AS (
  SELECT user_id, day FROM u_days
  WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < 'c0'
), contrib AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS day
  FROM sampled, range(0, 28) t(i)
), mau AS (
  SELECT day,
         {sql_round_frac_int("count(DISTINCT user_id) * 4", "3", 4)} AS est_x10k
  FROM contrib GROUP BY 1
)
SELECT dau.day, dau.dau,
       CAST(mau.est_x10k AS DOUBLE) / 10000.0 AS mau28_est,
       {sql_round_frac("dau.dau * 10000", "nullif(mau.est_x10k, 0)", 4)}
           AS stickiness_est
FROM dau JOIN mau USING (day)
"""


def q_ev_dau_stickiness_approx_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28d MAU via per-day HLL sketch merge — the named sketch
    path from q_ev_dau_stickiness's docstring.  One Datasketches HLL
    sketch per day (hll_sketch_agg), each sketch exploded to the 28
    window days it covers (amplifies |days| x 28 SKETCHES, never user
    rows), merged with hll_union_agg and estimated.  Sketch bytes are
    engine-specific, so this is the flagged rows-only entry; the
    oracle-exact twin is ev_dau_stickiness_kmv and the error-bound test
    compares both against the exact query."""
    ev = load_table(spark, sf_dir, "events")
    u_days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = u_days.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    day_sketch = u_days.groupBy("day").agg(
        F.hll_sketch_agg(F.col("user_id")).alias("sketch")
    )
    contrib = day_sketch.select(
        "sketch",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 27))).alias("day"),
    )
    mau = contrib.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("mau28_est")
    )
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau28_est",
        F.round(
            F.col("dau").cast("double") / F.nullif(F.col("mau28_est"), F.lit(0)), 4
        ).alias("stickiness_est"),
    )


QUERIES["ev_dau_stickiness_kmv"] = QuerySpec(
    q_ev_dau_stickiness_kmv,
    ORACLE_EV_DAU_KMV,
    "oracle-exact threshold-KMV trailing-28d MAU estimate",
    ("core", "sketch"),
)
QUERIES["ev_dau_stickiness_approx_hll"] = QuerySpec(
    q_ev_dau_stickiness_approx_hll,
    None,
    "per-day HLL sketch merge trailing-28d MAU (rows-only; see KMV twin)",
    ("core", "sketch", "approx"),
    exact_twin="ev_dau_stickiness_kmv",
)
