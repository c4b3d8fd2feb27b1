package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Connected components over an undirected edge list, by alternating
  * large-star / small-star rounds (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14 — public literature; the same shape
  * GraphFrames' connectedComponents uses). This is the piece that turns
  * near-duplicate PAIRS (exact / MinHash-LSH / SimHash / cosine) into
  * duplicate CLUSTERS a pipeline can act on — vecgo has no counterpart;
  * the operator exists for the training-data-dedup workload.
  *
  * Scale shape: every round is two node-keyed shuffles over a frame that
  * never exceeds the symmetric edge list; convergence is O(log² n) rounds
  * on pathological chains and 1-2 rounds on real dup graphs (dense small
  * clusters). No driver-side adjacency, no per-component state — holds
  * when the dup graph itself is billions of edges. Lineage is cut each
  * round with `localCheckpoint` (swap for a reliable `checkpoint` dir on
  * a production cluster where executor loss must not kill the job).
  */
object Components {

  /** Canonicalize to distinct undirected (u, v) long pairs, no loops. */
  private def canon(edges: DataFrame): DataFrame =
    edges.toDF("u", "v")
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** Large-star: every node points its LARGER neighbors at the minimum
    * of its closed neighborhood.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.union(edges.select(col("v"), col("u"))).toDF("u", "v")
    val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    nbrs.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node rewires itself and its SMALLER neighbors to
    * the minimum among them.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    oriented.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-independent fingerprint of an edge set: (count, xor of row
    * hashes). xor (not sum) so the ANSI overflow check can never trip.
    * The checksum rides the (eager) localCheckpoint's materialization job
    * via `observe` — a dedicated checksum job per round paid one extra
    * driver round-trip per iteration for a value the checkpoint action
    * already streams past.
    */
  private def checkpointWithChecksum(edges: DataFrame)
      : (DataFrame, (Long, Long)) = {
    val obs = org.apache.spark.sql.Observation()
    val out = edges.observe(obs, count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x"))
      .localCheckpoint()
    val m = obs.get
    (out, (m("c").asInstanceOf[Long], m("x").asInstanceOf[Long]))
  }

  /** Connected components of an undirected edge list. Input: any 2-column
    * frame of node-id pairs. Output: `(id, component)` for every node that
    * appears in an edge, where `component` is the minimum node id in the
    * component. Isolated nodes don't appear (callers coalesce over their
    * full id universe — see [[dedupClusters]]).
    */
  def connectedComponents(edges0: DataFrame, maxIter: Int = 30): DataFrame = {
    var (edges, prev) = checkpointWithChecksum(canon(edges0))
    var converged = prev._1 == 0L
    var it = 0
    while (!converged && it < maxIter) {
      // ONE alternation per checkpoint round — measured, not assumed
      // (r13): doubling to smallStar(largeStar(smallStar(largeStar(e))))
      // per checkpoint was built and REJECTED on JobCountProbe evidence:
      // chain-5k 112 -> 129 jobs / 10.7 -> 27.8 s, semanticDedup fixture
      // 28 -> 44 jobs / 2.6 -> 6.7 s. Under AQE every exchange in the
      // round's plan is its own stage-job, so halving the checkpoints
      // saves nothing (total exchanges are unchanged) while the 2x-deeper
      // un-materialized plan doubles per-round planning/AQE-replanning
      // work. The checkpoint cadence is NOT the cost here.
      val (next, cur) = checkpointWithChecksum(smallStar(largeStar(edges)))
      edges = next
      converged = cur == prev
      prev = cur
      it += 1
    }
    // exhausting the cap without reaching the fixed point means the edge
    // set is NOT fully merged — emitting it would yield silently wrong
    // cluster ids downstream, so fail loudly instead
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          s"(${prev._1} edges at exit); raise maxIter")
    // terminal state is a collection of stars centered at component minima
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v"), col("v")))
      .distinct()
  }

  /** Duplicate clusters over a document corpus: edges are the union of
    * exact-fingerprint groups (each member → group minimum, a star — same
    * connectivity as the clique at 1/d the edges) and MinHash-LSH verified
    * near-dup pairs (Jaccard ≥ `minJaccard`). Output: one row per
    * document, `(id, cluster_id)`, cluster_id = min doc id reachable
    * through any chain of duplicate relations; singletons map to
    * themselves.
    */
  def dedupClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8, workDir: Option[String] = None): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("id"))
    val fp = df.select(col(idCol).cast("long").as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val fpMin = fp.groupBy("fp").agg(min("id").as("m"))
    val exactEdges = fp.join(fpMin, "fp")
      .where(col("id") =!= col("m"))
      .select(col("id").as("u"), col("m").as("v"))
    // with a workDir the near-dup pass runs in its eager scoped-cache form
    // (one shingle+md5 pass, pairs materialized under workDir); without
    // one it stays lazy and recomputes per consumer
    val nearPairs = workDir match {
      case Some(w) => Dedup.minhashLshTo(df, idCol, textCol, s"$w/minhash",
        n, numHashes, rowsPerBand, minJaccard)
      case None => Dedup.minhashLsh(df, idCol, textCol,
        n, numHashes, rowsPerBand, minJaccard)
    }
    val nearEdges = nearPairs.select(col("id_a").as("u"), col("id_b").as("v"))
    val comp = connectedComponents(exactEdges.union(nearEdges))
    ids.join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster_id"))
  }

  /** The clustered-dedup view: keep exactly one canonical (minimum-id)
    * document per duplicate cluster.
    */
  def keepCanonical(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8, workDir: Option[String] = None): DataFrame = {
    val keep = dedupClusters(df, idCol, textCol, n, numHashes, rowsPerBand,
        minJaccard, workDir)
      .where(col("id") === col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(keep, idCol)
  }

  /** Quality-aware retention (the RefinedWeb/FineWeb rule): within each
    * duplicate cluster keep the member with the HIGHEST `score` (ties →
    * the lowest id), instead of the arbitrary min-id canonical — curation
    * wants the best copy, not the first-seen one. `score` is any per-row
    * Column over `df` (a quality-classifier output, a length prior, …).
    * One clusters pass + one per-cluster `max_by` aggregation keyed by
    * (score, −id) — the struct key is unique per row, so the argmax is
    * deterministic; no corpus-wide window.
    */
  def keepBest(df: DataFrame, idCol: String, textCol: String, score: Column,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8, workDir: Option[String] = None): DataFrame = {
    val cl = dedupClusters(df, idCol, textCol, n, numHashes, rowsPerBand,
      minJaccard, workDir)
    val scored = df.select(col(idCol).cast("long").as("id"), score.as("_sc"))
    val keep = cl.join(scored, "id")
      .groupBy(col("cluster_id"))
      .agg(max_by(col("id"),
        struct(col("_sc"), (-col("id")).as("_nid"))).as("id"))
      .select(col("id").as(idCol))
    df.join(keep, idCol)
  }
}
