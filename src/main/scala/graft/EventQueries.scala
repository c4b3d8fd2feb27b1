package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` stream table: tumbling-window
  * aggregation (the batch shape of the Structured Streaming windowed agg in
  * [[graft.streaming.Ingest]]), gap-based sessionization, and opaque-JSON
  * payload extraction (vecgo treats payload JSON as opaque, `README.md:111`;
  * users opt in via json functions — SURVEY.md §2.5).
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Tumbling 1-hour windows × event_type: counts and exact value sums. */
  def tumblingAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start").asc, col("event_type").asc)

  /** Sliding 1-hour windows advancing every 30 minutes × event_type: each
    * event lands in exactly width/slide = 2 windows. The sliding variant
    * of [[tumblingAgg]] — at 100 TB this is still ONE partial-aggregated
    * shuffle; the window expansion is a codegen'd 2-row explode, not a
    * self-join.
    */
  def slidingAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("window_start").asc, col("event_type").asc)

  /** Gap-based sessionization (30-minute inactivity gap): session counts
    * and event counts per user, for users < 50.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").where(col("user_id") < 50)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val withGap = ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
    withGap
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id").asc)
  }

  /** Opaque JSON payload extraction: sum of $.k per event type. */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type").asc)

  /** Scalar-function sampler: string/date/math built-ins over orders —
    * coverage for the §2.5 "scalar function library" surface.
    */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_orderkey") < 100)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
        length(col("o_orderstatus")).cast("long").as("st_len"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
        round(pow(col("o_totalprice"), lit(0.25)), 6).as("price_4rt"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
      .orderBy(col("o_orderkey").asc)

  /** Grouping-sets surface: rollup over (returnflag, linestatus) counts. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"))
      .orderBy(col("rf").asc, col("ls").asc)

  /** Set-op surface: suppliers' nations EXCEPT customers' nations, and the
    * intersection size, as one deterministic frame.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    val cus = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val except = sup.distinct().exceptAll(cus.distinct())
      .withColumn("op", lit("supplier_only"))
    val inter = sup.distinct().intersect(cus.distinct())
      .withColumn("op", lit("both"))
    except.unionByName(inter)
      .select(col("op"), col("nk"))
      .orderBy(col("op").asc, col("nk").asc)
  }

  /** AS-OF (point-in-time) join — the feature-store / training-snapshot
    * primitive a large pipeline needs constantly: for every `click`, the
    * most recent `purchase` by the same user at or before the click's
    * timestamp. NOT implemented as a join: both streams union into ONE
    * user-keyed shuffle and a running `last(..., ignoreNulls)` window
    * carries the purchase state forward — at 100 TB that is a single
    * partition-and-sort with no build side, no skew amplification, and no
    * per-row probe. Ties at one timestamp resolve purchase-first then
    * event-id, so results are deterministic on every engine.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
    val isP = col("event_type") === "purchase"
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, isP.desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both running-state columns in ONE select → a single Window operator
    // (sequential withColumns would split into two Sort+Window passes)
    ev
      .select(col("event_id"), col("user_id"), col("event_type"),
        last(when(isP, col("event_id")), ignoreNulls = true).over(w)
          .as("last_p_id"),
        last(when(isP, col("value")), ignoreNulls = true).over(w)
          .as("last_p_value"))
      .where(!isP)
      .select(col("event_id"), col("user_id"), col("last_p_id"),
        round(col("last_p_value"), 6).as("last_p_value"))
      .orderBy(col("event_id").asc)
  }

  /** Interval (range) join — the second join family the brief calls out
    * beyond as-of: error events with value > 50 open a 5-minute "burst"
    * interval; every click by users < 30 is matched against the bursts
    * that CONTAIN its timestamp. There is no equi-key at all, so a naive
    * plan is a cartesian product. The scale shape: quantize time into
    * buckets of exactly the max interval length, explode each interval to
    * the (≤2) buckets it overlaps, and equi-join on the bucket — every
    * qualifying (event, interval) pair shares the event's own bucket, so
    * the equi-join finds each pair exactly once (no dedup pass) and the
    * range predicate is a post-join filter. At 100 TB this is ONE
    * hash-partitioned shuffle on bucket with ~2× interval duplication,
    * instead of an O(n·m) nested loop.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val ivLenUs = 300L * 1000000L // 5 minutes, also the bucket width
    val iv = ev.where(col("event_type") === "error" && col("value") > 50)
      .select(col("event_id").as("iv_id"), unix_micros(col("ts")).as("s"))
      // covered buckets: floor(s/len) .. floor((s+len-1)/len) — 2 unless
      // the interval starts exactly on a bucket boundary
      .withColumn("bucket", explode(sequence(
        floor(col("s") / ivLenUs),
        floor((col("s") + lit(ivLenUs - 1)) / ivLenUs))))
    val clicks = ev
      .where(col("event_type") === "click" && col("user_id") < 30)
      .select(col("event_id"), unix_micros(col("ts")).as("u"))
      .withColumn("bucket", floor(col("u") / ivLenUs))
    clicks.join(iv,
        clicks("bucket") === iv("bucket") &&
          iv("s") <= clicks("u") && clicks("u") < iv("s") + ivLenUs,
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("iv_id")).as("n_bursts"))
      .orderBy(col("event_id").asc)
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one pass — with rollup_agg this completes the grouping-sets surface.
    */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,10)")).cast("double")
          .as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf").asc, col("ls").asc)

  /** PIVOT: one row per order priority, order-status counts and
    * decimal-exact price totals spread across columns. The pivot domain
    * is DECLARED (`Seq("O","F","P")`) — Spark then plans a single
    * partial-aggregated pass with no values-discovery job, the shape that
    * holds at 100 TB (an undeclared domain costs an extra distinct scan
    * and is capped by `spark.sql.pivotMaxValues`).
    */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(28,10)")).cast("double")
          .as("total"))
      .select(col("o_orderpriority"),
        col("O_cnt").as("cnt_o"), round(col("O_total"), 4).as("tot_o"),
        col("F_cnt").as("cnt_f"), round(col("F_total"), 4).as("tot_f"),
        col("P_cnt").as("cnt_p"), round(col("P_total"), 4).as("tot_p"))
      .orderBy(col("o_orderpriority").asc)

  /** Trailing time-RANGE window frame (not a rows frame): per event, the
    * count and exact sum of the same user's events in the preceding 10
    * minutes (inclusive). One user-keyed Sort+Window — the frame bound is
    * a value offset over event-time micros, so late/dense bursts are
    * handled without a self-join.
    */
  def rangeCount(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").where(col("user_id") < 30)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("u"),
        col("value").cast("decimal(28,10)").as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("u"))
      .rangeBetween(-600L * 1000000L, 0L)
    ev.select(col("event_id"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("v")).over(w).cast("double").as("sum_10m"))
      .orderBy(col("event_id").asc)
  }

  /** Exact interpolated quantiles of `value` per event type — the
    * percentile surface of the aggregation library (continuous/linear
    * interpolation, matching SQL percentile_cont semantics).
    */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.25)).as("q25"),
        percentile(col("value"), lit(0.5)).as("q50"),
        percentile(col("value"), lit(0.75)).as("q75"),
        percentile(col("value"), lit(0.9)).as("q90"))
      .select(col("event_type"), round(col("q25"), 6).as("q25"),
        round(col("q50"), 6).as("q50"), round(col("q75"), 6).as("q75"),
        round(col("q90"), 6).as("q90"))
      .orderBy(col("event_type").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_tumbling_agg" -> (tumblingAgg _),
    "events_sliding_agg" -> (slidingAgg _),
    "events_sessionize" -> (sessionize _),
    "events_json_props" -> (jsonProps _),
    "scalar_funcs" -> (scalarFuncs _),
    "rollup_agg" -> (rollupAgg _),
    "set_ops" -> (setOps _),
    "events_asof_join" -> (asofJoin _),
    "events_range_join" -> (rangeJoin _),
    "cube_agg" -> (cubeAgg _),
    "pivot_agg" -> (pivotAgg _),
    "events_range_count" -> (rangeCount _),
    "events_quantiles" -> (quantiles _)
  )

  val oracle: Map[String, String] = Map(
    "events_tumbling_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |       count(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start ASC, event_type ASC""".stripMargin,
    "events_sliding_agg" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
        |           AS window_start, event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
        |         event_type, value FROM events)
        |SELECT window_start, event_type, count(*) AS n,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2
        |ORDER BY window_start ASC, event_type ASC""".stripMargin,
    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events WHERE user_id < 50),
        |m AS (SELECT user_id,
        |        CASE WHEN prev_ts IS NULL THEN 1
        |             WHEN epoch(ts)::BIGINT - epoch(prev_ts)::BIGINT > 1800 THEN 1
        |             ELSE 0 END AS new_session
        |      FROM g)
        |SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM m GROUP BY user_id ORDER BY user_id ASC""".stripMargin,
    "events_json_props" ->
      """SELECT event_type, count(*) AS n,
        |       sum(CAST(props->>'k' AS BIGINT))::BIGINT AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(substring(o_orderpriority, 1, 3)) AS pri3,
        |  length(o_orderstatus)::BIGINT AS st_len,
        |  year(o_orderdate)::BIGINT AS yr,
        |  month(o_orderdate)::BIGINT AS mo,
        |  round(sqrt(o_totalprice), 6) AS sqrt_price,
        |  round(pow(o_totalprice, 0.25::DOUBLE), 6) AS price_4rt,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey ASC""".stripMargin,
    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf ASC, ls ASC""".stripMargin,
    "set_ops" ->
      """WITH sup AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
        |cus AS (SELECT DISTINCT c_nationkey AS nk FROM customer)
        |SELECT 'supplier_only' AS op, nk FROM (SELECT nk FROM sup EXCEPT SELECT nk FROM cus)
        |UNION ALL
        |SELECT 'both' AS op, nk FROM (SELECT nk FROM sup INTERSECT SELECT nk FROM cus)
        |ORDER BY op ASC, nk ASC""".stripMargin,
    "events_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type, value FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT event_id, user_id, event_type,
        |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts ASC, (event_type = 'purchase') DESC, event_id ASC
        |            ROWS UNBOUNDED PRECEDING) AS last_p_id,
        |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts ASC, (event_type = 'purchase') DESC, event_id ASC
        |            ROWS UNBOUNDED PRECEDING) AS last_p_value
        |  FROM ev)
        |SELECT event_id, user_id, last_p_id, round(last_p_value, 6) AS last_p_value
        |FROM w WHERE event_type = 'click' ORDER BY event_id ASC""".stripMargin,
    "events_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS iv_id, epoch_us(ts) AS s FROM events
        |  WHERE event_type = 'error' AND value > 50),
        |ev AS (
        |  SELECT event_id, epoch_us(ts) AS u FROM events
        |  WHERE event_type = 'click' AND user_id < 30)
        |SELECT ev.event_id, count(iv.iv_id) AS n_bursts
        |FROM ev LEFT JOIN iv
        |  ON iv.s <= ev.u AND ev.u < iv.s + 300000000
        |GROUP BY ev.event_id ORDER BY ev.event_id ASC""".stripMargin,
    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |       coalesce(l_linestatus, 'ALL') AS ls,
        |       count(*) AS n,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf ASC, ls ASC""".stripMargin,
    "pivot_agg" ->
      """SELECT o_orderpriority,
        |  sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS cnt_o,
        |  round(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 4) AS tot_o,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS cnt_f,
        |  round(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 4) AS tot_f,
        |  sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS cnt_p,
        |  round(CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 4) AS tot_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    "events_range_count" ->
      """SELECT event_id,
        |  count(*) OVER w AS n_10m,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS VARCHAR) AS DOUBLE) AS sum_10m
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id ASC""".stripMargin,
    "events_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS q25,
        |  round(quantile_cont(value, 0.5), 6) AS q50,
        |  round(quantile_cont(value, 0.75), 6) AS q75,
        |  round(quantile_cont(value, 0.9), 6) AS q90
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin
  )
}
