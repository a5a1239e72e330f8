"""Event-sequence operators: gap-based sessionization and as-of joins —
capabilities a time-series/training-pipeline engine needs that plain
aggregation can't express (SURVEY.md §2.7 generalizations).

Both are pure window-function plans (one shuffle on ``user_id``), so they
scale with the key cardinality; the streaming twin of sessionization is
``F.session_window`` (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table

SESSION_GAP = "INTERVAL 30 MINUTE"


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end): split each
    user's event stream at >30-minute silences. Classic lag → flag → running
    sum; interval comparison (not epoch arithmetic — engines disagree on
    epoch()'s fractional seconds)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.expr(f"CASE WHEN prev_ts IS NULL OR ts > prev_ts + {SESSION_GAP} THEN 1 ELSE 0 END"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + {SESSION_GAP} THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  -- CAST: DuckDB sums integers to HUGEINT, which pandas materializes as
  -- float64 and the driver's value hash then differs from Spark's int64
  -- (CORRECTNESS_r01 hash_match:false root cause).
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess GROUP BY 1, 2
"""


def sessionize_events_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase sessionization — the SAME result as :func:`sessionize_events`
    (identical oracle), with the hot-key window defused for 100 TB: the
    plain form's ``Window.partitionBy(user_id)`` puts a bot user's entire
    event history through ONE task. Phase 1 sessionizes WITHIN
    (user, day) bins — per-task volume bounded by a user's single-day
    volume no matter how hot the key. Phase 2 stitches boundary-crossing
    sessions on the per-bin SESSION SUMMARY table: consecutive local
    sessions merge iff the silence between them is ≤ the gap (exactly the
    event-level rule, since the adjacent events at a bin boundary ARE the
    previous summary's end and the next summary's start). The per-user
    stitch window sees O(sessions + days) rows — output-sized, not
    event-sized; a bot with a million events/day contributes ONE summary
    row per day. Merging chains across any number of bins ride the same
    running sum. Session ids, counts, and bounds are bit-identical to the
    textbook form (equality test + shared oracle)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    binned = ev.withColumn("bin", F.date_trunc("day", "ts"))
    w_bin = Window.partitionBy("user_id", "bin").orderBy("ts", "event_id")
    flagged = binned.withColumn("prev_ts", F.lag("ts").over(w_bin)).withColumn(
        "new_local",
        F.expr(f"CASE WHEN prev_ts IS NULL OR ts > prev_ts + {SESSION_GAP} THEN 1 ELSE 0 END"),
    )
    local = flagged.withColumn(
        "local_id",
        F.sum("new_local").over(w_bin.rowsBetween(Window.unboundedPreceding, 0)),
    )
    summaries = local.groupBy("user_id", "bin", "local_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
    # start_ts totally orders a user's summaries: distinct local sessions in
    # one bin start strictly later than one another, and a later bin's
    # sessions start past the bin boundary, after every earlier-bin start
    w_u = Window.partitionBy("user_id").orderBy("start_ts")
    stitched = summaries.withColumn(
        "prev_end", F.lag("end_ts").over(w_u)
    ).withColumn(
        "new_global",
        F.expr(
            f"CASE WHEN prev_end IS NULL OR start_ts > prev_end + {SESSION_GAP}"
            " THEN 1 ELSE 0 END"
        ),
    ).withColumn(
        "session_id",
        F.sum("new_global").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return stitched.groupBy("user_id", "session_id").agg(
        F.sum("n").alias("n_events"),
        F.date_format(F.min("start_ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("end_ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


def asof_purchase_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(purchase_id, user_id, click_id): for every purchase, the user's most
    recent click at-or-before it (NULL when none) — an AS-OF join.

    Spark has no asof operator for static frames; the scalable shape is the
    union + running-last trick: tag both streams, sort once per user, carry
    the latest click struct forward. ONE shuffle, no range-join explosion.
    The oracle uses DuckDB's native ASOF LEFT JOIN — two independent
    implementations of the semantics.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    # collapse same-(user, ts) clicks to max event_id so both sides break the
    # ambiguity identically
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("event_id", "user_id", "ts", F.lit(0).alias("kind"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_click",
        F.last(F.when(F.col("kind") == 0, F.struct("ts", "event_id")), ignorenulls=True).over(w),
    )
    return (
        carried.where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_click.event_id").alias("click_id"),
        )
    )


def asof_purchase_prior_click_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase AS-OF — same result (and oracle) as
    :func:`asof_purchase_prior_click`, hot-key-proof like
    :func:`sessionize_events_scalable`: the plain form's carry-forward
    window puts a bot user's whole history through one task. Phase 1
    carries the latest click WITHIN (user, day) bins. Phase 2 computes
    each bin's carry-in — the latest click of all PRIOR bins — as a
    running struct-max over the per-(user, bin) summary table (O(active
    days) rows per user; bins without clicks inherit via NULL-skipping
    max). A purchase's prior click is then its within-bin carry, else its
    bin's carry-in: any earlier-bin click precedes the purchase by
    construction, so the event-level inclusive tie rule (p.ts >= c.ts,
    max event_id) only ever decides within the bin, where phase 1 applies
    it identically to the plain form."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("event_id", "user_id", "ts", F.lit(0).alias("kind"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind")
    )
    unioned = clicks.unionByName(purchases).withColumn("bin", F.date_trunc("day", "ts"))
    w_bin = (
        Window.partitionBy("user_id", "bin")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_click",
        F.last(F.when(F.col("kind") == 0, F.struct("ts", "event_id")), ignorenulls=True).over(w_bin),
    )
    # struct-max == the carry-forward order's last click: ts asc first,
    # event_id breaks same-ts ties exactly as the (ts, kind, event_id) sort
    bin_last = (
        unioned.where(F.col("kind") == 0)
        .groupBy("user_id", "bin")
        .agg(F.max(F.struct("ts", "event_id")).alias("bin_last_click"))
    )
    bins = unioned.select("user_id", "bin").distinct()
    w_u = (
        Window.partitionBy("user_id").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        bins.join(bin_last, ["user_id", "bin"], "left")
        .withColumn("carry_in", F.max("bin_last_click").over(w_u))
        .select("user_id", "bin", "carry_in")
    )
    return (
        carried.where(F.col("kind") == 1)
        .join(carry, ["user_id", "bin"], "left")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce(F.col("last_click"), F.col("carry_in"))
            .getField("event_id").alias("click_id"),
        )
    )


ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, c.click_id
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --------------------------------------------------------------------------- #
# funnel conversion (ordered-stage progression)
# --------------------------------------------------------------------------- #

def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, n_users): how many users progress through the ordered
    view → click → purchase funnel, where each stage must happen strictly
    AFTER the user's first event of the previous stage — the product-
    analytics staple that plain per-type counts can't answer (a purchase
    before any view must NOT convert). Three per-user aggregates, each a
    conditional MIN over the same user_id shuffle; stage tables are
    one-row-per-user (small) so the follow-up joins co-locate on the same
    key. No window over raw events, no self-join of the full fact.

    Each stage count is a PLAIN aggregate (``df.agg``), not a
    ``groupBy(lit)``: a grouped aggregate over an empty stage emits zero
    rows, while the oracle's ``SELECT 'view', count(*)`` always emits one —
    so a corpus with no purchases must still report
    (view>click>purchase, 0), not drop the row."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("p_ts"))
    )

    def _stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        _stage(v, "view")
        .unionByName(_stage(c, "view>click"))
        .unionByName(_stage(p, "view>click>purchase"))
    )


USER_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'view>click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM c
UNION ALL
SELECT 'view>click>purchase' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM p
"""


# --------------------------------------------------------------------------- #
# retention cohorts (first-seen week x activity-week offset)
# --------------------------------------------------------------------------- #

def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_offset, n_users): the classic retention triangle —
    users grouped by first-seen week, counted distinct in each subsequent
    activity week. First-seen is one per-user aggregate; the offset is pure
    date arithmetic on week-truncated timestamps (day difference always an
    exact multiple of 7, so the division is exact on any engine); the
    distinct count shuffles once on the (cohort, offset) pair."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.expr("date_trunc('week', first_ts)").alias("cohort_week"),
            F.expr(
                "cast(datediff(date_trunc('week', ts), date_trunc('week', first_ts)) / 7 as int)"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


USER_RETENTION_ORACLE = """
WITH first AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
SELECT date_trunc('week', first_ts) AS cohort_week,
       CAST(datediff('day', date_trunc('week', first_ts), date_trunc('week', e.ts)) / 7
            AS INT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN first ON e.user_id = first.user_id
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# hourly volume anomalies (trailing z-score over the aggregated series)
# --------------------------------------------------------------------------- #

ANOMALY_LOOKBACK = 24   # trailing hours forming each point's baseline
ANOMALY_Z_MIN = 2.0     # |z| threshold to report
Z_ROUND = 3


def events_hourly_anomalies(spark: SparkSession, sf_dir: str,
                            lookback: int = ANOMALY_LOOKBACK,
                            z_min: float = ANOMALY_Z_MIN) -> DataFrame:
    """(event_type, hour, n, z): hours whose event volume deviates ≥
    ``z_min`` sigmas from the trailing ``lookback``-hour baseline — the
    monitoring staple over any event firehose (traffic spikes, outages,
    bot bursts). Shape: ONE aggregation collapses the fact to the
    O(types × hours) hourly series, then the z-score is a bounded ROWS
    window PER event_type over that tiny series — the window never sees
    the raw fact, and the series is bounded by wall-clock time (≈ 9k
    rows/type/year) regardless of corpus size. Float discipline: the
    baseline mean/variance derive from EXACT integer window sums
    (sum(n), sum(n²) — associative, order-proof), with the algebra done
    identically in both engines; never a Welford-style running stddev,
    whose accumulation order differs between engines."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-lookback, -1)
    )
    # s2 accumulates squares: widen BEFORE the multiply, not just the sum —
    # (n*n).cast(decimal) squares in int64 first and wraps per-ROW at
    # n ≳ 3.0e9 events/hour (and DuckDB's BIGINT n*n errors at the same
    # point), so the cast must hoist above the product on BOTH engines:
    # decimal(38,0) * bigint on Spark, HUGEINT * BIGINT on DuckDB. The sum
    # of widened squares is then exact on both at any volume (same
    # int64-overflow discipline as q11's threshold).
    scored = hourly.select(
        "event_type",
        "hour",
        "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).over(w).alias("s2"),
        F.count("n").over(w).alias("cnt"),
    ).where(F.col("cnt") >= lookback)
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = (
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("cnt"))
        / (F.col("cnt") - 1)
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        scored.where(var > 0)
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm").alias("hour"),
            "n",
            F.round(z, Z_ROUND).alias("z"),
        )
        .where(F.abs(F.col("z")) >= z_min)
    )


EVENTS_ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, hour, n,
         sum(n) OVER w AS s1,
         sum(CAST(n AS HUGEINT) * n) OVER w AS s2,
         count(n) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M') AS hour, CAST(n AS BIGINT) AS n,
         round((n - CAST(s1 AS DOUBLE) / cnt)
               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1)),
               {Z_ROUND}) AS z
  FROM win
  WHERE cnt >= {ANOMALY_LOOKBACK}
    AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1) > 0
)
SELECT event_type, hour, n, z FROM scored WHERE abs(z) >= {ANOMALY_Z_MIN}
"""
