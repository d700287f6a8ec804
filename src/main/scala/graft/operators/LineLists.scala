package graft.operators

import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.DateFns

/** The rest of the reference's report family (SURVEY.md §2.1 #16):
  * each query mirrors the distinguishing logic of one
  * /root/reference/sql_queries report, mapped onto the test schema.
  * All oracle-backed.
  */
object LineLists {

  private val End = "2024-01-21" // REPORT_END_DATE analog

  // ------------------------------------------------------------------
  // Tx_Curr_VLEligible_LineList.sql — eligibility window: latest
  // follow-up per client, eligible when enough time has passed since
  // the anchor date.
  // ------------------------------------------------------------------
  private val vlEligible = GraftQuery(
    "q_ll_eligible",
    Some(s"""WITH latest AS (SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '$End') t WHERE rn = 1)
      SELECT user_id,
        strftime(ts, '%Y-%m-%d') AS last_seen,
        date_diff('day', CAST(ts AS DATE), DATE '$End') AS days_since,
        CASE WHEN event_type <> 'error'
              AND date_diff('day', CAST(ts AS DATE), DATE '$End') >= 7
          THEN 'Eligible' ELSE 'NotEligible' END AS eligibility
      FROM latest ORDER BY user_id"""),
    (s, dir) => {
      val latest = LatestPerKey(
        Tables(s, dir).events.filter(col("ts") <= lit(End)),
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      latest.select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("last_seen"),
          DateFns.daysBetween(col("ts"), lit(End)).as("days_since"),
          when(col("event_type") =!= "error"
              && DateFns.daysBetween(col("ts"), lit(End)) >= 7, "Eligible")
            .otherwise("NotEligible").as("eligibility"))
        .orderBy("user_id")
    })

  // ------------------------------------------------------------------
  // Tx_Curr_TPT_LineList.sql — course completion: first start vs last
  // completion event per client, completed iff both exist and the
  // course fits the window (inh_start_date/inh_date_completed shape).
  // ------------------------------------------------------------------
  private val tptCourse = GraftQuery(
    "q_ll_course",
    Some("""WITH c AS (SELECT user_id,
        MIN(CASE WHEN event_type = 'signup' THEN ts END) AS start_ts,
        MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS complete_ts
        FROM events GROUP BY user_id)
      SELECT user_id,
        strftime(start_ts, '%Y-%m-%d') AS course_start,
        strftime(complete_ts, '%Y-%m-%d') AS course_complete,
        CASE WHEN start_ts IS NOT NULL AND complete_ts IS NOT NULL
              AND complete_ts >= start_ts
              AND date_diff('day', CAST(start_ts AS DATE), CAST(complete_ts AS DATE)) <= 180
          THEN 'Completed'
          WHEN start_ts IS NOT NULL THEN 'Started' ELSE 'NotStarted' END AS course_status
      FROM c ORDER BY user_id"""),
    (s, dir) => Tables(s, dir).events
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("start_ts"),
        max(when(col("event_type") === "purchase", col("ts"))).as("complete_ts"))
      .select(col("user_id"),
        date_format(col("start_ts"), "yyyy-MM-dd").as("course_start"),
        date_format(col("complete_ts"), "yyyy-MM-dd").as("course_complete"),
        when(col("start_ts").isNotNull && col("complete_ts").isNotNull
            && col("complete_ts") >= col("start_ts")
            && DateFns.daysBetween(col("start_ts"), col("complete_ts")) <= 180,
          "Completed")
          .when(col("start_ts").isNotNull, "Started")
          .otherwise("NotStarted").as("course_status"))
      .orderBy("user_id"))

  // ------------------------------------------------------------------
  // Tx_Curr_HVL_LineList.sql — threshold classification on the latest
  // measurement (viral load >= 1000 copies shape).
  // ------------------------------------------------------------------
  private val highValue = GraftQuery(
    "q_ll_threshold",
    Some(s"""WITH m AS (SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase' AND ts <= TIMESTAMP '$End') t
        WHERE rn = 1)
      SELECT user_id, value AS last_measure,
        strftime(ts, '%Y-%m-%d') AS measured_on,
        CASE WHEN value >= 250 THEN 'High' WHEN value >= 50 THEN 'Low'
          ELSE 'Suppressed' END AS measure_band
      FROM m ORDER BY user_id"""),
    (s, dir) => {
      val m = LatestPerKey(
        Tables(s, dir).events
          .filter(col("event_type") === "purchase" && col("ts") <= lit(End)),
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      m.select(col("user_id"), col("value").as("last_measure"),
          date_format(col("ts"), "yyyy-MM-dd").as("measured_on"),
          when(col("value") >= 250, "High")
            .when(col("value") >= 50, "Low")
            .otherwise("Suppressed").as("measure_band"))
        .orderBy("user_id")
    })

  // ------------------------------------------------------------------
  // Tx_Curr_CCA_LineList.sql — two independent latest-per-key CTEs
  // joined per client (latest screening vs latest result, compare
  // dates — the latestDSD/latest-follow-up dual-CTE shape).
  // ------------------------------------------------------------------
  private val dualLatest = GraftQuery(
    "q_ll_dual_latest",
    Some(s"""WITH scr AS (SELECT * FROM (
        SELECT user_id, ts, event_id,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'view' AND ts <= TIMESTAMP '$End') t WHERE rn = 1),
      res AS (SELECT * FROM (
        SELECT user_id, ts, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'click' AND ts <= TIMESTAMP '$End') t WHERE rn = 1)
      SELECT scr.user_id,
        strftime(scr.ts, '%Y-%m-%d') AS screened_on,
        strftime(res.ts, '%Y-%m-%d') AS result_on,
        CASE WHEN res.ts IS NULL THEN 'AwaitingResult'
          WHEN res.ts >= scr.ts THEN 'ResultReceived'
          ELSE 'ResultStale' END AS screening_status,
        res.value AS result_value
      FROM scr LEFT JOIN res ON scr.user_id = res.user_id
      ORDER BY scr.user_id"""),
    (s, dir) => {
      val ev = Tables(s, dir).events
      def latestOf(t: String, extra: Seq[String]) = LatestPerKey(
        ev.filter(col("event_type") === t && col("ts") <= lit(End)),
        Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
        .select((Seq("user_id", "ts", "event_id") ++ extra).map(col): _*)
      val scr = latestOf("view", Nil)
        .withColumnRenamed("ts", "scr_ts").withColumnRenamed("event_id", "scr_id")
      val res = latestOf("click", Seq("value"))
        .withColumnRenamed("ts", "res_ts").withColumnRenamed("event_id", "res_id")
      scr.join(res, Seq("user_id"), "left")
        .select(col("user_id"),
          date_format(col("scr_ts"), "yyyy-MM-dd").as("screened_on"),
          date_format(col("res_ts"), "yyyy-MM-dd").as("result_on"),
          when(col("res_ts").isNull, "AwaitingResult")
            .when(col("res_ts") >= col("scr_ts"), "ResultReceived")
            .otherwise("ResultStale").as("screening_status"),
          col("value").as("result_value"))
        .orderBy("user_id")
    })

  // ------------------------------------------------------------------
  // As-of join: each view event annotated with the user's most recent
  // purchase at-or-before it (temporal enrichment; DuckDB's native
  // ASOF JOIN is the oracle).
  // ------------------------------------------------------------------
  private val asofJoin = GraftQuery(
    "q_asof_join",
    Some("""SELECT l.event_id, l.user_id,
        strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        r.value AS right_value,
        strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS right_ts
      FROM (SELECT * FROM events WHERE event_type = 'view') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND r.ts <= l.ts
      ORDER BY l.event_id"""),
    (s, dir) => {
      val ev = Tables(s, dir).events
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin.asOf(views, purchases, keyCol = "user_id", tsCol = "ts",
          payloadCols = Seq("value", "ts"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
          col("right_value"),
          date_format(col("right_ts"), "yyyy-MM-dd HH:mm:ss").as("right_ts"))
        .orderBy("event_id")
    })

  // ------------------------------------------------------------------
  // Batch sessionization — gaps-and-islands: session boundary when the
  // gap to the previous event exceeds 30 minutes; running sum of
  // boundary flags numbers the sessions. The batch twin of
  // streaming.EventStream.sessionize (same gap rule).
  // ------------------------------------------------------------------
  private val sessionizeBatch = GraftQuery(
    "q_sessionize_batch",
    Some("""WITH g AS (SELECT user_id, ts, event_id, value,
        CASE WHEN LAG(ts) OVER w IS NULL
              OR date_diff('second', LAG(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_start
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s AS (SELECT *, CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no FROM g)
      SELECT user_id, session_no, COUNT(*) AS n_events,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
        strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
      FROM s GROUP BY user_id, session_no
      ORDER BY user_id, session_no"""),
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      Tables(s, dir).events
        .withColumn("is_start",
          when(lag(col("ts"), 1).over(w).isNull
              || unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)) > 1800, 1)
            .otherwise(0))
        .withColumn("session_no", sum(col("is_start")).over(run))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .orderBy("user_id", "session_no")
    })

  // ------------------------------------------------------------------
  // Range join — events inside 30-minute windows opened by signup
  // events (bucketized equi-join vs Spark's nested-loop fallback;
  // DuckDB plans the same query as an IEJoin and is the oracle).
  // ------------------------------------------------------------------
  private val rangeJoin = GraftQuery(
    "q_range_join",
    Some("""WITH iv AS (SELECT event_id AS iv_id, ts AS start_ts,
        ts + INTERVAL 30 MINUTE AS end_ts FROM events WHERE event_type = 'signup')
      SELECT e.event_id, iv.iv_id
      FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
      ORDER BY e.event_id, iv.iv_id"""),
    (s, dir) => {
      val ev = Tables(s, dir).events
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("iv_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
      RangeJoin.pointInInterval(ev.select("event_id", "ts"), "ts",
          iv, "start_ts", "end_ts") // width auto-derived from interval stats
        .select("event_id", "iv_id")
        .orderBy("event_id", "iv_id")
    })

  val queries: Seq[GraftQuery] =
    Seq(vlEligible, tptCourse, highValue, dualLatest, asofJoin,
      sessionizeBatch, rangeJoin)
}
