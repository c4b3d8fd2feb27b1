package graft.query

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.{QueryExecution, TakeOrderedAndProjectExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Query cost counters (vecgo `QueryStats` / `model/types.go:137-249`,
  * which counts distance computations and prune hits per query).
  *
  * Spark twin: the physical plan's SQLMetrics already meter every
  * operator — scans count rows and files, top-k operators count their
  * pools — so per-query counters are READ OFF the executed plan after the
  * action instead of threading hand-rolled accumulators through codegen'd
  * kernels (which would break whole-stage codegen in the hot path).
  * Session-wide running totals come from a [[QueryExecutionListener]].
  */
object QueryMetrics {

  /** Per-query cost report extracted from one executed plan. */
  final case class PlanMetrics(
      rowsScanned: Long,
      filesRead: Long,
      rerankPoolRows: Long)

  /** AQE-aware traversal: unwrap the adaptive root and descend into
    * materialized query stages (their plans are not `children`).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def metric(p: SparkPlan, name: String): Long =
    p.metrics.get(name).map(_.value).filter(_ > 0).getOrElse(0L)

  /** Extract scan + pool counters from an executed query.
    *
    * - `rowsScanned`: rows produced by leaf file scans — for a k-NN scan
    *   every one of these passes the distance kernel exactly once.
    * - `filesRead`: parquet files opened (after partition-directory and
    *   manifest pruning — the pruned-IO signal at 100 TB).
    * - `rerankPoolRows`: rows emitted by non-final TakeOrderedAndProject
    *   operators, i.e. candidates the two-phase path re-scored exactly.
    */
  def of(qe: QueryExecution): PlanMetrics = {
    val nodes = allNodes(qe.executedPlan)
    val scans = nodes.filter(n =>
      n.children.isEmpty && n.nodeName.contains("Scan"))
    val rowsScanned = scans.map(metric(_, "numOutputRows")).sum
    val filesRead = scans.map(metric(_, "numFiles")).sum
    val topks = nodes.collect { case t: TakeOrderedAndProjectExec => t }
    // the FINAL top-k (pre-order: first) is the query's own k; inner ones
    // are refine pools. Spark 4's TakeOrderedAndProject is shuffle-based
    // and has no numOutputRows: its map side writes the per-partition
    // partial top-k (shuffleRecordsWritten ≡ recordsRead on the merge
    // side), and the merged output is capped by the operator's limit.
    val poolRows = topks.drop(1).map { t =>
      val crossed = math.max(metric(t, "shuffleRecordsWritten"),
        metric(t, "recordsRead"))
      math.min(t.limit.toLong, crossed)
    }.sum
    PlanMetrics(rowsScanned, filesRead, poolRows)
  }

  /** Session-wide running totals (Spark-UI-style): every successful action
    * on the session adds its scan counters. Listener delivery is async —
    * totals are eventually consistent; [[Totals.awaitAtLeast]] bounds the
    * wait for tests/reporting.
    */
  final class Totals extends QueryExecutionListener {
    val queries = new LongAdder
    val rowsScanned = new LongAdder
    val filesRead = new LongAdder
    private val lastNs = new AtomicLong(0L)

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val m = of(qe)
      queries.increment()
      rowsScanned.add(m.rowsScanned)
      filesRead.add(m.filesRead)
      lastNs.set(System.nanoTime())
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def snapshot: Map[String, Long] = Map(
      "queries" -> queries.sum(),
      "rows_scanned" -> rowsScanned.sum(),
      "files_read" -> filesRead.sum())

    /** Wait (bounded) until at least `n` queries have been recorded —
      * listener events are delivered off the calling thread.
      */
    def awaitAtLeast(n: Long, timeoutMs: Long = 10000): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (queries.sum() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      queries.sum() >= n
    }
  }

  // weak keys: a closed/abandoned session must be collectable — a strong
  // map would pin every session and its listener for the JVM's lifetime in
  // long-lived multi-session drivers. The value (Totals) holds no session
  // reference, so the entry dies with the session.
  private val registered =
    new java.util.WeakHashMap[SparkSession, Totals]()

  /** The session's running totals, registering the listener on first use. */
  def totals(spark: SparkSession): Totals = registered.synchronized {
    val existing = registered.get(spark)
    if (existing != null) existing
    else {
      val t = new Totals
      spark.listenerManager.register(t)
      registered.put(spark, t)
      t
    }
  }

  /** Deregister and forget the session's totals listener — the explicit
    * detach for long-lived sessions embedding the library (the weak map
    * already lets an abandoned session collect, but an active session
    * keeps its listener until this is called).
    */
  def detach(spark: SparkSession): Unit = registered.synchronized {
    val t = registered.remove(spark)
    if (t != null) spark.listenerManager.unregister(t)
  }

  /** Run `df.collect()` and return rows + the executed plan's counters —
    * synchronous and exact (no listener race), for `searchWithStats`.
    */
  def collectWithMetrics(df: DataFrame): (Array[org.apache.spark.sql.Row], PlanMetrics) = {
    val rows = df.collect()
    (rows, of(df.queryExecution))
  }
}
