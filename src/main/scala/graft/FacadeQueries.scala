package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end coverage THROUGH the public GraftDB facade: the same k-NN
  * and hybrid results as the operator-level queries, but produced by the
  * full engine path (validation → store segments → snapshot read →
  * search), oracle-checked against the same SQL.
  */
object FacadeQueries {

  private def buildDb(s: SparkSession, dir: String, name: String): GraftDB = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_$name"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val docs = Tables.load(s, dir, "documents")
    val records = emb
      .join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"), col("text"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"), textCol = Some("text"))
    // two segments so the facade read path exercises the union + manifest
    db.insertBatch(records.where(col("id") < 250))
    db.insertBatch(records.where(col("id") >= 250))
    db
  }

  private def qvec(s: SparkSession, dir: String, qid: Long): Array[Float] =
    Tables.load(s, dir, "embeddings").where(col("vec_id") === qid)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

  /** Facade k-NN == operator-level knn_l2 (same oracle). */
  def knn(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn")
    db.search(qvec(s, dir, 0), 10)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** MMR diversity through the engine facade ([[GraftDB.searchMmr]]):
    * the adaptive search path supplies a 30-candidate pool on the L2
    * store (relevance = -√distance), the greedy λ=0.7 fold picks 8.
    * Oracle: the shared unrolled-greedy mirror over `-list_distance`
    * relevance.
    */
  def mmrQ(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_mmr")
    db.searchMmr(qvec(s, dir, 0), k = 8, fetchK = 30, lambda = 0.7)
      .select(col("rank"), col("id").as("vec_id"),
        // +0.0 normalizes the self-match's −0.0 (λ·−√0) on both engines
        (round(col("score"), 6) + lit(0.0)).as("score"))
      .orderBy(col("rank").asc)
  }

  /** Diversity-capped grouped search through the engine facade
    * ([[GraftDB.searchGrouped]]): at most 3 per label among the global
    * top-12 — identical rows to the operator-level `knn_grouped`
    * (same oracle; the facade surfaces √ of its native squared score).
    */
  def knnGroupedQ(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_grouped")
    db.searchGrouped(qvec(s, dir, 5), k = 12, groupCol = "label",
        perGroup = 3)
      .select(col("label"), col("id").as("vec_id"),
        round(sqrt(col("score")), 6).as("score"), col("rank"))
      .orderBy(col("score").asc, col("vec_id").asc)
  }

  /** Facade k-NN THROUGH the built index: buildIndex compacts into an
    * IVF-partitioned SQ8-coded segment and search auto-routes through
    * probe-pruned two-phase rerank. All lists probed + a refine pool
    * sized as a corpus fraction → result is exact, so it hash-checks
    * against the same brute-force oracle while the physical plan carries
    * `PartitionFilters` on `_ivf_part` (recall-vs-nprobe trade-offs are
    * gated in `IndexedEngineSpec`).
    */
  def knnIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_idx")
    db.buildIndex(nlist = 8)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 0), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade k-NN THROUGH a PQ index (vecgo's large-segment coded path:
    * PQ codes + ADC scoring with exact rerank,
    * `internal/segment/diskann/writer.go:73-95`, `quantization/pq.go:
    * 468-500`): `buildIndex(kind = "pq")` compacts into an
    * IVF-partitioned segment whose coded column is m product codes per
    * row; probes are ADC-scored (per-query table lookups, no UDF) and
    * exact-reranked. All lists probed + corpus-fraction refine pool →
    * exact, same brute-force oracle; recall at realistic nprobe is gated
    * in `IndexedEngineSpec`.
    */
  def knnPqIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_pq")
    db.buildIndex(nlist = 8, kind = "pq", pqM = 16)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 0), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade k-NN THROUGH an OPQ index (vecgo I7, `quantization/opq.go`):
    * `buildIndex(kind = "opq")` learns an orthonormal rotation, stores PQ
    * codes of R·x, and probes ADC-score against the driver-rotated query —
    * L2 is rotation-invariant, so ordering semantics (and this exact
    * all-probe wide-refine check) are identical to the PQ path.
    */
  def knnOpqIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_opq")
    db.buildIndex(nlist = 8, kind = "opq", pqM = 16)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 0), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade k-NN THROUGH a RaBitQ index (vecgo I9,
    * `quantization/rabitq.go`): `buildIndex(kind = "rabitq")` stores 1
    * bit/dim sign codes under a seeded data-independent rotation (the
    * sidecar persists only the seed); probes estimate squared L2 from the
    * sign-bit Hamming distance (2 − 2cos(πh/d)) and exact-rerank. 1-bit
    * codes are the coarsest first pass, so the refine pool mirrors the
    * standalone `rabitq_rerank`'s 0.7 corpus fraction — all probes + that
    * pool → exact, same brute-force oracle.
    */
  def knnRabitqIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_rbq")
    db.buildIndex(nlist = 8, kind = "rabitq")
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.7 / 10).toInt)
    db.search(qvec(s, dir, 0), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade filtered k-NN on an INDEXED store through the ADAPTIVE
    * pre-filter route (vecgo's selectivity-based cursor pre-filter,
    * `search.go:215-233`): `label = 4` matches ~10% of rows, the manifest
    * stats estimate that fraction without scanning, and under the 0.15
    * cutoff the planner skips the IVF probe and exact-scans the filter
    * survivors — recall-proof, so it hash-checks against the brute-force
    * oracle with NO refine-pool tuning. Route choice is gated in
    * `IndexedEngineSpec`.
    */
  def knnPrefilter(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_pre")
    db.buildIndex(nlist = 8)
    db.search(qvec(s, dir, 3), 10,
      filter = graft.types.FilterSet.of(graft.types.Filter.Eq("label", 4)),
      projectCols = Seq("label"),
      selectivityCutoff = 0.15)
      .select(col("id").as("vec_id"), col("label"),
        round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade BATCH search THROUGH the built index: every query fans out
    * over the probed IVF lists in ONE pruned scan (union of all probe
    * lists → partition filters), SQ8-approximate per-query heaps, then
    * one exact rerank — vecgo's per-query index fan-out
    * (`engine.go:1303-1366`), distributed. All lists probed + corpus-
    * fraction refine pool → exact, so it hash-checks against the same
    * brute-force oracle as the operator-level `batch_search`.
    */
  def batchIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_batch_idx")
    db.buildIndex(nlist = 8)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(5, math.ceil(rows * 0.25 / 5).toInt)
    val queries = Tables.load(s, dir, "embeddings")
      .where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    db.batchSearch(queries, 5, nprobe = 8, refineFactor = refine)
      .select(col("query_id"), col("id").as("vec_id"), col("rank"),
        round(sqrt(col("score")), 6).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Facade Hamming store (vecgo serves Hamming directly over stored
    * codes, `distance/distance.go:36-38`): packed sign-bit codes of the
    * embeddings inserted under `metric=hamming`, searched with a packed
    * query — the engine path twin of the operator-level `bq_hamming`,
    * hash-checked against the same sign-disagreement-count oracle.
    */
  private def buildHammingDb(s: SparkSession, dir: String,
      name: String, withText: Boolean = false): (GraftDB, Array[Long]) = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_$name"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val packed = emb.select(col("vec_id").as("id"),
      graft.index.BQ.packCol(col("embedding"), 64).as("vector"), col("label"))
    val records =
      if (!withText) packed
      else packed.join(
        Tables.load(s, dir, "documents")
          .select(col("doc_id").as("id"), col("text")), "id")
    val db = GraftDB.open(s, root, dim = 64, metric = "hamming",
      schema = Map("label" -> "int"),
      textCol = if (withText) Some("text") else None)
    db.insertBatch(records.where(col("id") < 250))
    db.insertBatch(records.where(col("id") >= 250))
    val qe = qvec(s, dir, 8)
    val q = Array.tabulate(db.codeWords) { w =>
      (0 until math.min(32, 64 - w * 32)).foldLeft(0L) { (acc, i) =>
        if (qe(w * 32 + i) > 0f) acc | (1L << i) else acc
      }
    }
    (db, q)
  }

  /** Hybrid RRF on a HAMMING store (vecgo's `HybridSearch` is metric-
    * agnostic, `engine.go:1538`): popcount k-NN pool over packed sign-bit
    * codes fused with the BM25 pool — integer Hamming scores need no
    * rounding key, so pool ranks reproduce on any engine.
    */
  def hybridHamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_hybrid_hamming",
      withText = true)
    db.hybridSearchCodes(q, "spark vector merge", 10)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  def hamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_hamming")
    db.searchCodes(q, 10)
      .select(col("id").as("vec_id"), col("score").cast("bigint").as("hamming"))
  }

  /** Facade k-NN on an INDEXED COSINE store: vectors are L2-normalized at
    * write time (vecgo `prepareVector` under Cosine, `hnsw.go:799+`) and
    * cosine is scale-invariant, so the engine's scores over normalized
    * vectors hash-match the raw-vector oracle of the operator-level
    * `knn_cosine`. All lists probed + corpus-fraction refine → exact
    * through the probe-pruned quantized path — the second metric driven
    * end-to-end through the index.
    */
  def knnCosineIndexed(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_knn_cos"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label").cast("int").as("label"))
    val db = GraftDB.open(s, root, dim = 64, metric = "cosine",
      schema = Map("label" -> "int"))
    db.insertBatch(emb.where(col("id") < 250))
    db.insertBatch(emb.where(col("id") >= 250))
    db.buildIndex(nlist = 8)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 1), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Hamming RANGE query over packed codes (vecgo serves threshold search
    * on Hamming stores too): all ids within 26 bits of the packed query,
    * best-first, capped — the `searchThresholdCodes` facade path,
    * hash-checked against the sign-disagreement-count oracle.
    */
  def thresholdHamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_thr_ham")
    db.searchThresholdCodes(q, threshold = 26L, maxResults = 100)
      .select(col("id").as("vec_id"), col("score").cast("bigint").as("hamming"))
  }

  /** BM25 after a mixed writeBatch — the INCREMENTAL lexical-maintenance
    * gate (vecgo updates its inverted index on every insert/delete,
    * `lexical/bm25/bm25.go:180-278` `Add`/`Delete`): seed half the
    * corpus, resolve the lexical index once, then append the other half
    * and tombstone some seeded docs in one atomic batch. The post-batch
    * search must (a) score the LIVE corpus exactly — df/avgdl/N all
    * follow the tombstoned row set, hash-checked against DuckDB over the
    * same predicate — and (b) tokenize ONLY the appended segment's rows,
    * enforced loudly here via the engine's delta-build counters so the
    * verified path itself proves no full-corpus rebuild happened.
    */
  def bm25AfterAppend(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_bm25_inc"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val docs = Tables.load(s, dir, "documents")
    val recs = emb
      .join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"), col("text"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"), textCol = Some("text"))
    db.insertBatch(recs.where(col("id") < 250))
    db.lexicalSearch("spark vector merge", 5).collect() // builds seg-0 delta
    val preBuilds = db.lexicalDeltaBuilds.get()
    val preRows = db.lexicalDeltaRowsTokenized.get()
    val delIds = recs.where(col("id") < 250 && col("id") % 10 === 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    db.writeBatch(Some(recs.where(col("id") >= 250)), deleteIds = delIds)
    val appended = db.store.manifest().get.segments.last.rows
    val out = db.lexicalSearch("spark vector merge", 10)
      .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
    val res = out.collect() // force the resolve before reading the counters
    require(db.lexicalDeltaBuilds.get() == preBuilds + 1,
      s"post-append lexical resolve must build exactly the new segment's " +
        s"delta, built ${db.lexicalDeltaBuilds.get() - preBuilds}")
    require(db.lexicalDeltaRowsTokenized.get() == preRows + appended,
      s"post-append lexical build tokenized " +
        s"${db.lexicalDeltaRowsTokenized.get() - preRows} rows, expected " +
        s"only the $appended appended ones")
    s.createDataFrame(java.util.Arrays.asList(res: _*), out.schema)
  }

  /** Facade hybrid == operator-level hybrid_rrf (same oracle). */
  def hybrid(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_hybrid")
    db.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  /** Hybrid search through a CLONED store ([[GraftDB.cloneAt]]): the
    * source is indexed (so the idx sidecar must travel), carries
    * per-segment lexical deltas (so BM25 must reproduce from the copied
    * postings), and the clone is opened as an INDEPENDENT engine at a
    * fresh root — the whole backup/ship/fork path is in the verified
    * lane: config copy, artifact copy, manifest rebase, guard-published
    * commit, then a hybrid query whose vector pool routes through the
    * cloned index. Hash-checks against the same oracle as
    * `graftdb_hybrid` (a faithful clone answers identically); a
    * post-clone write to the SOURCE proves isolation.
    */
  def hybridCloned(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_clone_src")
    db.buildIndex(nlist = 8)
    val dest = s"${sys.props("java.io.tmpdir")}/graft_facade_clone_dst"
    val p = new Path(dest)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val v = db.cloneAt(dest)
    // source moves on AFTER the clone: must not leak into the clone
    db.insertBatch(Tables.load(s, dir, "embeddings").limit(1)
      .select((col("vec_id") + 90000L).as("id"),
        col("embedding").as("vector"), col("label"),
        lit("post clone spark vector merge noise").as("text")))
    val c = GraftDB.open(s, dest)
    require(c.currentVersion == v, "clone opened at the wrong version")
    require(c.segmentInfo().forall(_("index_kind") != "none"),
      "index sidecar did not travel with the clone")
    require(c.read().count() == db.read(version = v).count(),
      "clone row count != source cut")
    // all-lists probe + corpus-fraction refine: the indexed vector pool
    // is then exact, so the clone answers the SAME oracle as the
    // unindexed graftdb_hybrid (the hybridFiltered exactness recipe)
    val rows = c.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(1, math.ceil(rows.toDouble / 50.0).toInt)
    c.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10,
        nprobe = 8, refineFactor = refine)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  /** Facade THRESHOLD search THROUGH the built index (vecgo routes
    * threshold queries through the pruned searcher, `engine.go:1485-1532`):
    * the planner distance-prunes segments by centroid/radius, and the
    * indexed segment gates rows on the SQ8 approximate score within the
    * decode-error margin before the exact phase — recall-proof, so it
    * hash-checks against the same brute-force oracle as the operator-level
    * `search_threshold` (threshold 1.2 euclidean ≡ 1.44 in the engine's
    * squared-L2 score units). Pruning behavior is gated in
    * `IndexedEngineSpec`.
    */
  def thresholdIndexed(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_thr_idx")
    db.buildIndex(nlist = 8)
    db.searchThreshold(qvec(s, dir, 4), threshold = 1.2 * 1.2,
        maxResults = 100)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Facade FILTERED hybrid search on an INDEXED store (vecgo
    * `HybridSearch` + `WithFilter`, `engine.go:1538-1545`): `label >= 2`
    * estimates well above the pre-filter cutoff, so the vector pool routes
    * through the probe-pruned quantized index plan (all lists probed + a
    * corpus-covering refine pool → exact); the lexical pool left-semi
    * joins postings against the filter survivors before scoring. Route
    * choice and probe pruning are gated in `IndexedEngineSpec`.
    */
  def hybridFiltered(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_hybrid_f")
    db.buildIndex(nlist = 8)
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(1, math.ceil(rows.toDouble / 50.0).toInt)
    db.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10,
        filter = graft.types.FilterSet.of(graft.types.Filter.Gte("label", 2)),
        nprobe = 8, refineFactor = refine)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  /** Typed-record insert (vecgo W4 `InsertRecord`/builder ergonomics): the
    * corpus goes in as a case-class `Dataset[Record]` through
    * [[GraftDB.insertRecords]] — same validated path, same k-NN result as
    * the operator-level `knn_l2` oracle.
    */
  def records(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_records"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    import s.implicits._
    val ds = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label").cast("int").as("label"),
        lit(null).cast("binary").as("payload"))
      .as[graft.types.Record]
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"))
    db.insertRecords(ds)
    db.search(qvec(s, dir, 0), 10)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** Streaming-result iterator (vecgo R2 `SearchIter`): results consumed
    * as a lazy driver-side iterator, re-framed for the oracle compare —
    * identical rows to `graftdb_knn`.
    */
  def searchIterQ(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_iter")
    import s.implicits._
    val rows = db.searchIter(qvec(s, dir, 0), 10)
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    rows.toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Engine stats (vecgo R14 `Stats`): segment/row/tombstone counters
    * after the standard two-segment build plus a predicate delete — every
    * reported number is derivable from the source table, so the oracle
    * checks the introspection surface against relational ground truth.
    */
  def statsQ(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_stats")
    db.deleteWhere(graft.types.FilterSet.of(graft.types.Filter.Eq("label", 3)))
    val preDeleteRows = db.stats()("delete_rows").asInstanceOf[Long]
    // index build compacts live rows into ONE indexed segment (tombstones
    // fold away); a lexical query persists this version's index tables —
    // the introspection surface then reports all of it
    db.buildIndex(nlist = 8)
    db.lexicalSearch("spark", 1).collect()
    val st = db.stats()
    val si = db.segmentInfo()
    import s.implicits._
    Seq((st("segments").asInstanceOf[Int].toLong,
        st("segment_rows").asInstanceOf[Long],
        preDeleteRows,
        st("indexed_segments").asInstanceOf[Int].toLong,
        st("index_kinds").asInstanceOf[String],
        st("stats_segments").asInstanceOf[Int].toLong,
        st("lexical_versions").asInstanceOf[Int].toLong,
        si.map(_("rows").asInstanceOf[Long]).sum,
        si.count(_("index_kind") != "none").toLong))
      .toDF("segments", "segment_rows", "delete_rows", "indexed_segments",
        "index_kinds", "stats_segments", "lexical_versions",
        "seginfo_rows", "seginfo_indexed")
  }

  /** Per-query cost counters (vecgo R15 `QueryStats`): a filtered search
    * on a two-segment store whose label ranges are disjoint — the planner
    * must prune one segment from manifest stats alone, and the executed
    * plan's counters (rows scanned ≡ distance computations over the
    * surviving segment) are all derivable from the source table, so the
    * oracle checks the stats surface against relational ground truth.
    */
  def queryStats(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_qstats"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label").cast("int").as("label"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"))
    db.insertBatch(emb.where(col("id") < 250))
    db.insertBatch(emb.where(col("id") >= 250)
      .withColumn("label", col("label") + 100))
    val (_, st) = db.searchWithStats(qvec(s, dir, 3), 10,
      graft.types.FilterSet.of(graft.types.Filter.Eq("label", 104)))
    require(st.strategy.startsWith("pruned_brute_force"),
      s"expected stats-pruned route, got ${st.strategy}")
    import s.implicits._
    Seq((st.rowsReturned, st.segmentsScanned.toLong,
        st.segmentsPruned.toLong, st.rowsScanned, st.distanceComputations))
      .toDF("rows_returned", "segments_scanned", "segments_pruned",
        "rows_scanned", "distance_computations")
  }

  /** Serving-replica k-NN ([[graft.serve.LocalReplica]]): the snapshot is
    * exported ONCE into an in-process IVF-clustered replica, the query is
    * answered without a Spark job (every list probed here → exact, so the
    * same brute-force oracle hash-checks the whole export→serve path:
    * collect, CSR layout, probing, heap selection, tie-breaks).
    */
  def localKnn(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local")
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8)
    val res = rep.search(qvec(s, dir, 0), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** PQ-coded serving-replica k-NN (format v4): the export carries
    * m-byte PQ codes + codebooks instead of the n·dim SQ8 block; the ADC
    * first pass admits on a sound reconstruction-error margin and the
    * exact kernels rerank, so the result is IDENTICAL to the uncoded
    * scan — the same brute-force oracle hash-checks the whole
    * train→encode→ADC→rerank path (the reference's coded serving scan is
    * `internal/segment/diskann/segment.go:510-589`).
    */
  def localKnnPq(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_pq")
    val pm = graft.index.PQ.train(
      db.read().select(col("vector")), "vector", m = 8, iters = 8)
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      pqModel = Some(pm))
    require(rep.pqCoded && !rep.coded, "expected a PQ-coded v4 replica")
    val res = rep.search(qvec(s, dir, 5), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** k-NN through an INCREMENTALLY extended index: the store indexes its
    * first half (`buildIndex` → IVF+SQ8 segment), appends the second half
    * as a plain tail segment plus a couple of tail deletes, then folds the
    * tail into the probed layout with `extendIndex()` — encode + assign
    * under the FROZEN sidecar model, one pass over the new rows only, no
    * k-means re-training, the original indexed segment untouched (the
    * vector-index analog of the per-segment lexical deltas). After the
    * fold every segment is indexed (gated here) and an all-lists probe
    * with a corpus-fraction refine pool is exact, so the result
    * hash-checks against the brute-force oracle over the full corpus
    * minus the folded deletes.
    */
  def knnAfterExtend(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_extend"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val docs = Tables.load(s, dir, "documents")
    val records = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"), col("text"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"), textCol = Some("text"))
    db.insertBatch(records.where(col("id") < 250))
    db.buildIndex(nlist = 8)
    db.insertBatch(records.where(col("id") >= 250))
    db.delete(Seq(260L, 270L))
    require(db.extendIndex().isDefined, "extendIndex found no tail to fold")
    require(db.extendIndex().isEmpty, "second extendIndex must be a no-op")
    require(db.segmentInfo().forall(_("index_kind") != "none"),
      "extendIndex left an unindexed segment")
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 13), 10, nprobe = 8, refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** k-NN after a DRIFT-TRIGGERED retrain ([[GraftDB.maintainIndex]]):
    * the store indexes its first half, then appends a tail whose
    * distribution has shifted — the same embeddings scaled ×4, an exact
    * float op both engines reproduce bit-identically — so every tail row
    * lands outside its nearest frozen centroid's train-time q95 radius.
    * `indexDrift()` must read that (outFrac ≈ 1), and the default
    * [[graft.index.IndexPolicy.driftThreshold]] must escalate the fold
    * to a full re-train at the index's existing shape (the reference
    * re-runs k-means on every compaction merge —
    * `internal/engine/compaction.go:136-151`; here the retrain fires
    * only on measured drift). After the retrain every segment is indexed
    * (gated) and an all-lists probe with a corpus-fraction refine pool
    * is exact over the mixed corpus, so the row hash-checks the whole
    * drift-measure → policy → retrain → search path against a
    * brute-force oracle that rebuilds the same mixed corpus in SQL.
    */
  def knnAfterDrift(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_drift"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val docs = Tables.load(s, dir, "documents")
    val records = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"), col("text"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2",
      schema = Map("label" -> "int"), textCol = Some("text"))
    db.insertBatch(records.where(col("id") < 250))
    db.buildIndex(nlist = 8)
    // drifted tail: ×4-scaled copies of the back half under fresh ids
    // (×2² is exact in float32; unit-norm inputs stay far from overflow)
    db.insertBatch(records.where(col("id") >= 250)
      .select((col("id") + 10000L).as("id"),
        transform(col("vector"), x => x * lit(4.0f)).as("vector"),
        col("label"), col("text")))
    val d = db.indexDrift().getOrElse(
      throw new IllegalStateException("no tail after drifted append"))
    require(d.outFrac > 0.5, s"drifted tail read only $d")
    val (action, _) = db.maintainIndex().get
    require(action == graft.index.IndexPolicy.Retrain,
      s"drift policy chose $action, expected Retrain")
    require(db.indexDrift().isEmpty, "retrain left an unindexed tail")
    require(db.segmentInfo().forall(_("index_kind") != "none"),
      "retrain left an unindexed segment")
    val rows = db.stats()("segment_rows").asInstanceOf[Long]
    val refine = math.max(10, math.ceil(rows * 0.25 / 10).toInt)
    db.search(qvec(s, dir, 17).map(_ * 4f), 10, nprobe = 8,
        refineFactor = refine)
      .select(col("id").as("vec_id"), round(sqrt(col("score")), 6).as("score"))
  }

  /** OPQ-coded serving-replica k-NN (format v7): the PQ mirror over
    * ROTATED rows — the learned orthonormal rotation decorrelates the
    * subspaces before coding (lower reconstruction error than plain PQ at
    * the same m), the query rotates once per search for the ADC tables,
    * and the exact rerank stays on the ORIGINAL floats, so results are
    * IDENTICAL to the uncoded scan (the rotated-space drift of the
    * float-stored rotation is absorbed by the measured-defect margin —
    * see `LocalReplica.pqSearch`). The artifact is SAVED and RELOADED, so
    * the oracle row also hash-checks the v7 rotation round-trip.
    */
  def localKnnOpq(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_opq")
    val om = graft.index.OPQ.train(
      db.read().select(col("vector")), "vector", m = 8, iters = 3)
    val rep0 = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      opqModel = Some(om))
    require(rep0.opqCoded && rep0.pqCoded && !rep0.coded,
      "expected an OPQ-coded v7 replica")
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_local_opq.bin"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    require(rep.opqCoded, "v7 round-trip dropped the OPQ rotation")
    val res = rep.search(qvec(s, dir, 11), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** INT4-coded serving-replica k-NN (format v6): the export packs two
    * 4-bit codes per byte (split-plane nibbles) — ½ the coded-block RAM
    * and first-pass memory traffic of SQ8 — and the wider half-cells ride
    * the same sound-margin admission, so the result is IDENTICAL to the
    * uncoded scan (vecgo's int4 cell coding,
    * `internal/segment/diskann/writer.go:73-95`). The artifact is SAVED
    * and RELOADED here, so the oracle row also hash-checks the v6 format
    * round-trip.
    */
  def localKnnInt4(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_int4")
    val rep0 = graft.serve.LocalReplica.fromStore(db, nlist = 8, int4 = true)
    require(rep0.int4Coded && !rep0.coded && !rep0.pqCoded,
      "expected an INT4-coded v6 replica")
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_local_int4.bin"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    require(rep.int4Coded, "v6 round-trip dropped the INT4 section")
    val res = rep.search(qvec(s, dir, 9), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Sharded serving set ([[graft.serve.ReplicaSet]]): the corpus
    * exported as 4 hash-partitioned per-shard replicas, a query fanned
    * out and the per-shard pools merged — the single-process twin of the
    * 100 TB "replica per shard, route shard-side" deployment. The oracle
    * is the SAME brute-force scan as the unsharded rows, so the
    * hash-match proves partitioning+merge is invisible to results.
    */
  def localSharded(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_sharded")
    val set = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 4)
    require(set.numShards >= 2, "expected a multi-shard set")
    val res = set.search(qvec(s, dir, 21), 10, nprobe = 4)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** RESHARDED serving set ([[graft.serve.ReplicaSet.reshard]]): a
    * 4-shard export is mutated (a delete + an append that must survive
    * the row movement), SPLIT to 6 shards and then MERGED to 2 — pure
    * in-process row movement by the new hash-cell layout, no Spark
    * re-export — and the 2-shard set is saved, reloaded, and searched.
    * All-probe over every shard is exact, so the row hash-checks the
    * whole extract → re-route → rebuild → save/load path against the
    * same brute-force oracle a single global replica answers (the
    * append sits above id 100000, outside the oracle's top-k horizon;
    * the delete is reflected in the oracle's WHERE).
    */
  def localResharded(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_resharded")
    val set0 = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 4)
    require(set0.numShards >= 2, "expected a multi-shard set")
    set0.delete(Array(23L, 46L))
    set0.append(Array(100001L), Array(Array.fill(64)(100f)))
    val split = set0.reshard(6, nlist = 2)
    require(split.numShards >= 2, "split did not fan the rows out")
    val merged = split.reshard(2, nlist = 2)
    require(merged.shards.map(_.liveSize).sum ==
      set0.shards.map(_.liveSize).sum, "reshard lost rows")
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_facade_reshard_set"
    val p = new Path(outDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    merged.save(outDir, s.sparkContext.hadoopConfiguration)
    val loaded = graft.serve.ReplicaSet.load(outDir,
      s.sparkContext.hadoopConfiguration)
    val res = loaded.search(qvec(s, dir, 29), 10, nprobe = 2)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Hamming serving-tier freshness ([[graft.serve.LocalCodeReplica]]
    * mutations): tombstone-delete a family of ids on the exported code
    * replica, search — integer-exact against the brute-force oracle over
    * the surviving rows. The artifact is saved+loaded first, covering
    * the GRCR format round-trip in the verified path.
    */
  def localHammingDelete(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_del")
    val rep0 = graft.serve.LocalCodeReplica.fromStore(db)
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_local_ham.bin"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalCodeReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    val delIds = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(7)) === 3)
      .select("vec_id").collect().map(_.getLong(0))
    rep.delete(delIds)
    import s.implicits._
    rep.search(q, 10).map(c => (c.id, c.score.toLong))
      .toDF("vec_id", "hamming")
  }

  /** Replica-side HYBRID search (format v5): the export carries a compact
    * lexical postings section (sorted vocab + CSR (row, tf) + doc
    * lengths), the replica scores BM25 in-process and fuses with the
    * coded vector pass by RRF — vecgo's embedded `HybridSearch`
    * (`internal/engine/engine.go:1538-1635`) without a Spark job on the
    * query path. The artifact is SAVED and RELOADED here, so the oracle
    * hash-checks the full v5 round-trip: pools, rounded rank keys, id
    * tie-breaks, and fused ordering must all equal the engine's
    * distributed `hybridSearch` (same oracle as `graftdb_hybrid`).
    */
  def localHybrid(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_hybrid")
    val rep0 = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      textCol = Some("text"))
    require(rep0.lexical, "expected a lexical v5 replica")
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_local_hybrid.bin"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    val res = rep.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10,
      nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Cross-shard replica hybrid ([[graft.serve.ReplicaSet.hybridSearch]]):
    * 4 hash-partitioned shards, global-stats exchange (df/N/avgdl summed
    * exactly across shards) so every shard scores BM25 under corpus-level
    * idf, vector + lexical pools merged and RRF-fused. Same oracle as the
    * unsharded `graftdb_local_hybrid` — the hash-match proves the
    * exchange reproduces global scoring, not a per-shard approximation.
    */
  def localShardedHybrid(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_sh_hybrid")
    val set = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 4,
      textCol = Some("text"))
    require(set.numShards >= 2 && set.lexical,
      "expected a multi-shard lexical set")
    val res = set.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10,
      nprobe = 4)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Hybrid through a RESHARDED lexical set: the 4-shard export is
    * split to 6 shards and merged to 2 — postings re-split with the
    * rows in-process ([[graft.serve.ReplicaSet.reshard]]), per-shard
    * stats recomputed — and the 2-shard set is saved, reloaded, and
    * queried. The set-level global-stats exchange makes the resharded
    * BM25 pool bit-identical to a single global replica's, so the row
    * answers the SAME oracle as `graftdb_local_sharded_hybrid` —
    * proving reshard keeps hybrid serving without a Spark re-export.
    */
  def localReshardedHybrid(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_resh_hybrid")
    val set0 = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 4,
      textCol = Some("text"))
    require(set0.numShards >= 2 && set0.lexical,
      "expected a multi-shard lexical set")
    val re = set0.reshard(6, nlist = 2).reshard(2, nlist = 2)
    require(re.lexical, "reshard dropped the lexical section")
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_facade_resh_hyb_set"
    val p = new Path(outDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    re.save(outDir, s.sparkContext.hadoopConfiguration)
    val set = graft.serve.ReplicaSet.load(outDir,
      s.sparkContext.hadoopConfiguration)
    require(set.lexical, "saved/loaded resharded set lost the postings")
    val res = set.hybridSearch(qvec(s, dir, 5), "spark vector merge", 10,
      nprobe = 2)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** FILTERED replica-side hybrid (vecgo embedded `HybridSearch` +
    * `WithFilter`): typed predicates compiled against the exported
    * metadata columns restrict both pools in-process — same oracle as
    * the engine's `graftdb_hybrid_filtered` (corpus-level BM25 stats,
    * label >= 2 survivors only).
    */
  def localHybridFiltered(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_hybrid_f")
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      metaCols = Seq("label"), textCol = Some("text"))
    require(rep.lexical && rep.metaColumns == Seq("label"))
    val res = rep.hybridSearchWhere(qvec(s, dir, 5), "spark vector merge",
      10, Seq(graft.types.Filter.Gte("label", 2)), nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** RaBitQ-coded serving replica (format v5): 1 bit/dim sign codes under
    * a seeded rotation (seed-only in the artifact — the rotation
    * regenerates at load), Hamming-estimate first pass + exact rerank.
    * The estimator has no sound error bound, so exactness here comes from
    * the same 0.7-corpus rerank pool the engine's own
    * `graftdb_knn_rabitq_indexed` uses; realistic-pool recall is gated in
    * `LocalReplicaSpec`. Save+load round-trips the codes.
    */
  def localKnnRabitq(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_rbq")
    val rep0 = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      rabitq = true)
    require(rep0.rbqCoded, "expected a RaBitQ-coded v5 replica")
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_local_rbq.bin"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    val res = rep.searchRabitq(qvec(s, dir, 0), 10,
      rerankPool = math.ceil(rep.size * 0.7).toInt, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Hamming serving replica ([[graft.serve.LocalCodeReplica]]): packed
    * codes exported from the engine, popcount top-k in-process — integer-
    * exact, so the full export→serve path hash-checks against the same
    * oracle as the engine's own `graftdb_hamming`.
    */
  def localHamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_hamming")
    val rep = graft.serve.LocalCodeReplica.fromStore(db)
    import s.implicits._
    rep.search(q, 10).map(c => (c.id, c.score.toLong))
      .toDF("vec_id", "hamming")
  }

  /** Sharded Hamming serving ([[graft.serve.CodeReplicaSet]]): the code
    * store exported as 4 hash-cell shards, queried through the router
    * with a mixed mutation pass (broadcast delete + cell-routed append
    * of re-inserted rows) and a save/load round-trip of the set
    * directory — integer-exact against the brute-force popcount oracle
    * over the surviving rows.
    */
  def localShardedHamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_sh_hamming")
    val set0 = graft.serve.CodeReplicaSet.fromStore(db, shards = 4)
    val dir0 = s"${sys.props("java.io.tmpdir")}/graft_facade_codeset"
    val p0 = new Path(dir0)
    val fs0 = p0.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs0.exists(p0)) fs0.delete(p0, true)
    set0.save(dir0, s.sparkContext.hadoopConfiguration)
    val set = graft.serve.CodeReplicaSet.load(dir0,
      s.sparkContext.hadoopConfiguration)
    val moved = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(7)) === 3)
      .select("vec_id").collect().map(_.getLong(0))
    val codes = moved.map(id => set.get(id).get)
    set.delete(moved)
    set.append(moved, codes) // delete + re-insert: same corpus state
    import s.implicits._
    set.search(q, 10).map(c => (c.id, c.score.toLong))
      .toDF("vec_id", "hamming")
  }

  /** RESHARDED Hamming serving set ([[graft.serve.CodeReplicaSet
    * .reshard]]): the 4-shard code export is mutated (a delete family
    * that must survive the row movement), split to 6 and merged to 2
    * shards in-process, saved, reloaded, and searched — popcount scores
    * are integers, so the resharded answer is EXACTLY the brute-force
    * oracle over the surviving rows.
    */
  def localReshardedHamming(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_resh_hamming")
    val set0 = graft.serve.CodeReplicaSet.fromStore(db, shards = 4)
    val victims = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(11)) === 5)
      .select("vec_id").collect().map(_.getLong(0))
    set0.delete(victims)
    val re = set0.reshard(6).reshard(2)
    val dir0 = s"${sys.props("java.io.tmpdir")}/graft_facade_resh_codeset"
    val p0 = new Path(dir0)
    val fs0 = p0.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs0.exists(p0)) fs0.delete(p0, true)
    re.save(dir0, s.sparkContext.hadoopConfiguration)
    val set = graft.serve.CodeReplicaSet.load(dir0,
      s.sparkContext.hadoopConfiguration)
    import s.implicits._
    set.search(q, 10).map(c => (c.id, c.score.toLong))
      .toDF("vec_id", "hamming")
  }

  /** MMR diversity on the HAMMING serving tier
    * ([[graft.serve.LocalCodeReplica.searchMmr]]): a 30-candidate
    * popcount pool, then the greedy λ=0.7 trade with −popcount(cᵢ⊕cⱼ)
    * as the redundancy term — every objective term is an exact integer
    * scaled by λ/μ, so the selection decisions replay bit-exact in the
    * shared unrolled-greedy DuckDB mirror with the sign-bit similarity.
    * The replica round-trips through save/load (format v2) first.
    */
  def localHammingMmr(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_mmr")
    val rep0 = graft.serve.LocalCodeReplica.fromStore(db)
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_ham_mmr.grcr"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalCodeReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    import s.implicits._
    rep.searchMmr(q, k = 8, fetchK = 30, lambda = 0.7)
      .zipWithIndex
      .map { case (c, i) => (i + 1, c.id, c.score) }
      .toDF("rank", "vec_id", "score")
      .select(col("rank"), col("vec_id"),
        // +0.0 normalizes a −0.0 objective (λ·−0) on both engines
        (round(col("score"), 6) + lit(0.0)).as("score"))
      .orderBy(col("rank").asc)
  }

  /** Diversity-capped (grouped) search on the HAMMING serving tier
    * ([[graft.serve.CodeReplicaSet.searchGrouped]]): label metadata
    * exported with the codes (format v2 trailer), a delete family
    * tombstoned through the 4-shard router, then at most 3 per label
    * among the global top-12 — the cap runs ONCE at the router with
    * group keys resolved through the owning shard, so a label split
    * across shards is capped globally. Integer-exact against the same
    * QUALIFY oracle shape as the float tier's `knn_grouped`.
    */
  def localHammingGrouped(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_grouped")
    val set = graft.serve.CodeReplicaSet.fromStore(db, shards = 4,
      metaCols = Seq("label"))
    val victims = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(9)) === 4)
      .select("vec_id").collect().map(_.getLong(0))
    set.delete(victims)
    import s.implicits._
    val page = set.searchGrouped(q, k = 12, groupCol = "label", perGroup = 3)
      .map(c => (c.id, c.score.toLong)).toDF("vec_id", "hamming")
    page.join(Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label")), "vec_id")
      .select(col("label"), col("vec_id"), col("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
  }

  /** Typed-predicate filtered search on the HAMMING serving tier
    * ([[graft.serve.LocalCodeReplica.searchWhere]] — vecgo evaluates
    * typed filters engine-side for any metric, `metadata/filter.go:
    * 122-216`, `internal/engine/search.go:295-307`): label metadata
    * exported with the codes (format v2 trailer), the predicate runs
    * replica-side against it, popcount scores stay integer-exact over
    * the survivors. The artifact round-trips through save/load first.
    */
  def localHammingWhere(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_where")
    val rep0 = graft.serve.LocalCodeReplica.fromStore(db,
      metaCols = Seq("label"))
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_ham_where.grcr"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalCodeReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    import s.implicits._
    rep.searchWhere(q, 10, Seq(graft.types.Filter.Gte("label", 3),
        graft.types.Filter.Lte("label", 7)))
      .map(c => (c.id, c.score.toLong)).toDF("vec_id", "hamming")
  }

  /** Hybrid RRF on the HAMMING serving tier
    * ([[graft.serve.LocalCodeReplica.hybridSearch]] — vecgo's embedded
    * `HybridSearch` is metric-agnostic, `engine.go:1538-1635`): the
    * export carries the compact lexical postings section (format v3
    * trailer), the replica scores BM25 in-process and fuses with the
    * popcount pool by RRF, lexical pool overlapping the scan on a
    * ForkJoin task. Integer Hamming scores need no rounding key, so the
    * result matches the engine's `graftdb_hybrid_hamming` bit-for-bit —
    * the SAME oracle. Save+load covers the v3 round-trip.
    */
  def localHammingHybrid(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_hyb",
      withText = true)
    val rep0 = graft.serve.LocalCodeReplica.fromStore(db,
      textCol = Some("text"))
    require(rep0.lexical, "expected a lexical v3 code replica")
    val path = s"${sys.props("java.io.tmpdir")}/graft_facade_ham_hyb.grcr"
    rep0.save(path, s.sparkContext.hadoopConfiguration)
    val rep = graft.serve.LocalCodeReplica.load(path,
      s.sparkContext.hadoopConfiguration)
    val res = rep.hybridSearch(q, "spark vector merge", 10)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Cross-shard Hamming hybrid ([[graft.serve.CodeReplicaSet
    * .hybridSearch]]): 4 hash-cell shards, global-stats exchange
    * (df/N/avgdl summed exactly) so every shard scores BM25 under
    * corpus-level idf, popcount + lexical pools merged and RRF-fused —
    * same oracle as the engine's `graftdb_hybrid_hamming`, proving the
    * exchange reproduces global scoring on the code tier too.
    */
  def localShardedHammingHybrid(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_sh_ham_hyb",
      withText = true)
    val set = graft.serve.CodeReplicaSet.fromStore(db, shards = 4,
      textCol = Some("text"))
    require(set.numShards >= 2 && set.lexical,
      "expected a multi-shard lexical code set")
    val res = set.hybridSearch(q, "spark vector merge", 10)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Hybrid through a RESHARDED lexical code set: the 4-shard export is
    * split to 6 and merged to 2 shards in-process — postings re-split
    * with the rows ([[graft.serve.CodeReplicaSet.reshard]]), per-shard
    * stats recomputed — then saved, reloaded, and queried. Same oracle
    * as `graftdb_hybrid_hamming`: reshard keeps Hamming hybrid serving
    * without a Spark re-export.
    */
  def localReshardedHammingHybrid(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_resh_ham_hyb",
      withText = true)
    val set0 = graft.serve.CodeReplicaSet.fromStore(db, shards = 4,
      textCol = Some("text"))
    require(set0.numShards >= 2 && set0.lexical,
      "expected a multi-shard lexical code set")
    val re = set0.reshard(6).reshard(2)
    require(re.lexical, "reshard dropped the lexical section")
    val outDir = s"${sys.props("java.io.tmpdir")}/graft_facade_resh_hamhyb"
    val p = new Path(outDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    re.save(outDir, s.sparkContext.hadoopConfiguration)
    val set = graft.serve.CodeReplicaSet.load(outDir,
      s.sparkContext.hadoopConfiguration)
    require(set.lexical, "saved/loaded resharded set lost the postings")
    val res = set.hybridSearch(q, "spark vector merge", 10)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** FILTERED Hamming hybrid on the serving tier
    * ([[graft.serve.LocalCodeReplica.hybridSearchWhere]] — vecgo
    * `HybridSearch` + `WithFilter` over any metric): the typed predicate
    * restricts BOTH pools replica-side while df/avgdl/N stay
    * corpus-level, matching the engine's `hybridSearchCodes` + filter
    * semantics.
    */
  def localHammingHybridFiltered(s: SparkSession, dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_ham_hyb_f",
      withText = true)
    val rep = graft.serve.LocalCodeReplica.fromStore(db,
      metaCols = Seq("label"), textCol = Some("text"))
    require(rep.lexical && rep.metaColumns == Seq("label"))
    val res = rep.hybridSearchWhere(q, "spark vector merge", 10,
      Seq(graft.types.Filter.Gte("label", 2)))
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Cross-shard FILTERED hybrid ([[graft.serve.ReplicaSet
    * .hybridSearchWhere]]): typed predicates restrict both pools on
    * every shard while df/N/avgdl stay corpus-global via the exchange —
    * same oracle as the engine's `graftdb_hybrid_filtered`, proving the
    * sharded filtered fuse reproduces the single-store semantics.
    */
  def localShardedHybridFiltered(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_sh_hyb_f")
    val set = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 4,
      metaCols = Seq("label"), textCol = Some("text"))
    require(set.numShards >= 2 && set.lexical,
      "expected a multi-shard lexical set")
    val res = set.hybridSearchWhere(qvec(s, dir, 5), "spark vector merge",
      10, Seq(graft.types.Filter.Gte("label", 2)), nprobe = 4)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Cross-shard FILTERED Hamming hybrid ([[graft.serve.CodeReplicaSet
    * .hybridSearchWhere]]) — same oracle as the single-replica
    * `graftdb_local_hamming_hybrid_filtered`.
    */
  def localShardedHammingHybridFiltered(s: SparkSession,
      dir: String): DataFrame = {
    val (db, q) = buildHammingDb(s, dir, "facade_local_sh_ham_hyb_f",
      withText = true)
    val set = graft.serve.CodeReplicaSet.fromStore(db, shards = 4,
      metaCols = Seq("label"), textCol = Some("text"))
    require(set.numShards >= 2 && set.lexical,
      "expected a multi-shard lexical code set")
    val res = set.hybridSearchWhere(q, "spark vector merge", 10,
      Seq(graft.types.Filter.Gte("label", 2)))
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("id", "s")
      .select(col("id"), round(col("s"), 6).as("score"))
  }

  /** Filtered serving-replica k-NN: the metadata predicate runs ENGINE-
    * side (stats-pruned scan) and only the surviving id-set ships to the
    * replica ([[graft.serve.LocalReplica.searchFiltered]] — vecgo
    * `WithFilter` on the embedded path). Pre-filter semantics are exact,
    * so the result hash-checks against the brute-force filtered oracle.
    */
  def localKnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_pre")
    val allowed = db.collectFilterIds(Seq(graft.types.Filter.Eq("label", 4)))
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8)
    val res = rep.searchFiltered(qvec(s, dir, 3), 10, allowed, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Filtered serving-replica k-NN with the predicate evaluated REPLICA-
    * side: the export ships typed metadata columns (format v3) and
    * [[graft.serve.LocalReplica.searchWhere]] compiles the engine's own
    * `Filter` leaves against them — no driver-materialized id-set at any
    * selectivity (vecgo evaluates typed predicates inside the engine,
    * `metadata/filter.go:122-216`). Numeric range + substring containment
    * in one conjunction; exact pre-filter semantics, same oracle shape.
    */
  def localKnnWhere(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_where")
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8,
      metaCols = Seq("label", "text"))
    val res = rep.searchWhere(qvec(s, dir, 7), 10,
      Seq(graft.types.Filter.Gte("label", 6),
        graft.types.Filter.Lte("label", 8),
        graft.types.Filter.Contains("text", "a")), nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Serving-tier tombstone deletes ([[graft.serve.LocalReplica.delete]]):
    * export a replica, tombstone `vec_id ≡ 3 (mod 7)` (one in-memory
    * bitmap flip per id — the analog of vecgo's delete bitmap,
    * BASELINE.md's 16.5 M ids/s row), search. The result must equal a
    * brute-force scan over the surviving rows — deletes through the coded
    * first pass included, since admission only ever sees live rows.
    */
  def localDelete(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_local_del")
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8)
    val delIds = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(7)) === 3)
      .select("vec_id").collect().map(_.getLong(0))
    rep.delete(delIds)
    val res = rep.search(qvec(s, dir, 11), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Serving-tier delta appends ([[graft.serve.LocalReplica.append]]):
    * export a replica from 80% of the corpus, append the remaining 20%
    * in-process (vecgo's insert-then-search freshness — the memtable-
    * segment analog), search. Appended rows are exact-scanned and fused,
    * so the result equals the full-corpus brute-force oracle.
    */
  def localAppend(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_local_app"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
    val db = GraftDB.open(s, root, dim = 64, metric = "l2")
    db.insertBatch(emb.where(pmod(col("vec_id"), lit(5)) =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vector")))
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8)
    val rest = emb.where(pmod(col("vec_id"), lit(5)) === 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    rep.append(rest.map(_._1), rest.map(_._2))
    val res = rep.search(qvec(s, dir, 13), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Incremental serving refresh ([[graft.serve.LocalReplica.refreshFrom]]):
    * export a replica from 60% of the corpus, then move the STORE forward
    * (insert the rest, delete `vec_id ≡ 2 (mod 9)`) and pull the manifest
    * diff into the replica — the file-level CDC pattern that keeps a
    * serving host fresh between re-exports. The refreshed replica must
    * answer exactly like the store's current version.
    */
  def localRefresh(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_local_refresh"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2")
    db.insertBatch(emb.where(pmod(col("id"), lit(5)) < 3))
    val rep = graft.serve.LocalReplica.fromStore(db, nlist = 8)
    db.insertBatch(emb.where(pmod(col("id"), lit(5)) >= 3))
    val delIds = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(9)) === 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    db.delete(delIds)
    rep.refreshFrom(db)
    val res = rep.search(qvec(s, dir, 17), 10, nprobe = 8)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Sharded CDC refresh ([[graft.serve.ReplicaSet.refreshFrom]]): a
    * 4-shard set exported mid-history, then the store takes an insert
    * batch and a delete batch; each shard pulls ONLY its hash cell's
    * slice of the manifest diff (tombstones apply wherever the rows
    * live). Same oracle as the single-replica `graftdb_local_refresh` —
    * the hash-match proves the partitioned replay reconstructs the same
    * corpus state.
    */
  def localShardedRefresh(s: SparkSession, dir: String): DataFrame = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_facade_set_refresh"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val db = GraftDB.open(s, root, dim = 64, metric = "l2")
    db.insertBatch(emb.where(pmod(col("id"), lit(5)) < 3))
    val set = graft.serve.ReplicaSet.fromStore(db, shards = 4, nlist = 2)
    db.insertBatch(emb.where(pmod(col("id"), lit(5)) >= 3))
    val delIds = Tables.load(s, dir, "embeddings")
      .where(pmod(col("vec_id"), lit(9)) === 2)
      .select("vec_id").collect().map(_.getLong(0))
    db.delete(delIds.toSeq)
    set.refreshFrom(db)
    val res = set.search(qvec(s, dir, 17), 10, nprobe = 2)
    import s.implicits._
    res.map(c => (c.id, c.score)).toDF("vec_id", "s")
      .select(col("vec_id"), round(sqrt(col("s")), 6).as("score"))
  }

  /** Engine k-NN JOIN ([[GraftDB.knnJoin]]): every embeddings row joined
    * to its 3 nearest store rows through the built index's persisted
    * `_ivf_part` cells. All cells probed (nprobe = nlist) ⇒ exact ⇒ same
    * cross-join + row_number oracle as the operator-level `knn_join`;
    * partial-probe recall is gated in `IndexedEngineSpec`.
    */
  def knnJoinQ(s: SparkSession, dir: String): DataFrame = {
    val db = buildDb(s, dir, "facade_knn_join")
    db.buildIndex(nlist = 8)
    val queries = Tables.load(s, dir, "embeddings")
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    db.knnJoin(queries, "query_id", "qv", k = 3, nprobe = 8)
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("vec_id"), col("rank"),
        round(sqrt(col("score")), 6).as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graftdb_knn" -> (knn _),
    "graftdb_mmr" -> (mmrQ _),
    "graftdb_knn_grouped" -> (knnGroupedQ _),
    "graftdb_knn_join" -> (knnJoinQ _),
    "graftdb_knn_indexed" -> (knnIndexed _),
    "graftdb_knn_after_extend" -> (knnAfterExtend _),
    "graftdb_knn_after_drift" -> (knnAfterDrift _),
    "graftdb_knn_pq_indexed" -> (knnPqIndexed _),
    "graftdb_knn_opq_indexed" -> (knnOpqIndexed _),
    "graftdb_knn_rabitq_indexed" -> (knnRabitqIndexed _),
    "graftdb_knn_prefilter" -> (knnPrefilter _),
    "graftdb_batch_indexed" -> (batchIndexed _),
    "graftdb_hamming" -> (hamming _),
    "graftdb_hybrid" -> (hybrid _),
    "graftdb_hybrid_cloned" -> (hybridCloned _),
    "graftdb_bm25_after_append" -> (bm25AfterAppend _),
    "graftdb_threshold_indexed" -> (thresholdIndexed _),
    "graftdb_hybrid_filtered" -> (hybridFiltered _),
    "graftdb_records" -> (records _),
    "graftdb_search_iter" -> (searchIterQ _),
    "graftdb_stats" -> (statsQ _),
    "graftdb_query_stats" -> (queryStats _),
    "graftdb_threshold_hamming" -> (thresholdHamming _),
    "graftdb_knn_cosine_indexed" -> (knnCosineIndexed _),
    "graftdb_local_knn" -> (localKnn _),
    "graftdb_local_knn_pq" -> (localKnnPq _),
    "graftdb_local_knn_opq" -> (localKnnOpq _),
    "graftdb_local_knn_int4" -> (localKnnInt4 _),
    "graftdb_local_sharded" -> (localSharded _),
    "graftdb_local_resharded" -> (localResharded _),
    "graftdb_local_sharded_hybrid" -> (localShardedHybrid _),
    "graftdb_local_resharded_hybrid" -> (localReshardedHybrid _),
    "graftdb_local_hybrid" -> (localHybrid _),
    "graftdb_local_hybrid_filtered" -> (localHybridFiltered _),
    "graftdb_local_knn_rabitq" -> (localKnnRabitq _),
    "graftdb_local_hamming" -> (localHamming _),
    "graftdb_local_sharded_hamming" -> (localShardedHamming _),
    "graftdb_local_resharded_hamming" -> (localReshardedHamming _),
    "graftdb_local_hamming_delete" -> (localHammingDelete _),
    "graftdb_local_hamming_mmr" -> (localHammingMmr _),
    "graftdb_local_hamming_grouped" -> (localHammingGrouped _),
    "graftdb_local_hamming_where" -> (localHammingWhere _),
    "graftdb_local_hamming_hybrid" -> (localHammingHybrid _),
    "graftdb_local_sharded_hamming_hybrid" -> (localShardedHammingHybrid _),
    "graftdb_local_resharded_hamming_hybrid" ->
      (localReshardedHammingHybrid _),
    "graftdb_local_hamming_hybrid_filtered" ->
      (localHammingHybridFiltered _),
    "graftdb_local_sharded_hybrid_filtered" ->
      (localShardedHybridFiltered _),
    "graftdb_local_sharded_hamming_hybrid_filtered" ->
      (localShardedHammingHybridFiltered _),
    "graftdb_local_knn_filtered" -> (localKnnFiltered _),
    "graftdb_local_knn_where" -> (localKnnWhere _),
    "graftdb_local_delete" -> (localDelete _),
    "graftdb_local_append" -> (localAppend _),
    "graftdb_local_refresh" -> (localRefresh _),
    "graftdb_local_sharded_refresh" -> (localShardedRefresh _),
    "graftdb_hybrid_hamming" -> (hybridHamming _)
  )

  val oracle: Map[String, String] = Map(
    "graftdb_knn" -> Queries.oracle("knn_l2"),
    "graftdb_knn_grouped" -> Queries.oracle("knn_grouped"),
    "graftdb_mmr" -> graft.query.Mmr.oracleSql(
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id = 0),
        |c0 AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
        |              -list_distance(e.embedding::DOUBLE[], q.qv) AS rel
        |       FROM embeddings e, q
        |       ORDER BY rel DESC, vec_id ASC LIMIT 30),
        |cand AS (SELECT 0 AS qid, * FROM c0)""".stripMargin,
      k = 8, lambda = 0.7,
      """SELECT t::INT AS rank,
        |       ids[CAST(sel[CAST(t AS INT)] AS INT)] AS vec_id,
        |       round(ss[CAST(t AS INT)], 6) + 0.0 AS score
        |FROM selK, unnest(range(1, 9)) u(t)
        |ORDER BY rank ASC""".stripMargin),
    // Hamming serving-tier MMR: the same unrolled-greedy mirror with
    // sign-bit 0/1 vectors and −xor-count similarity — exact integers
    // scaled by λ/μ, so the fold replays bit-exact
    "graftdb_local_hamming_mmr" -> graft.query.Mmr.oracleSql(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |c0 AS (SELECT e.vec_id,
        |              list_transform(range(1, 65), p ->
        |                CASE WHEN e.embedding[p] > 0 THEN 1.0 ELSE 0.0 END) AS v,
        |              -(len(list_filter(range(1, 65),
        |                  i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::DOUBLE) AS rel
        |       FROM embeddings e, q
        |       ORDER BY rel DESC, vec_id ASC LIMIT 30),
        |cand AS (SELECT 0 AS qid, * FROM c0)""".stripMargin,
      k = 8, lambda = 0.7,
      """SELECT t::INT AS rank,
        |       ids[CAST(sel[CAST(t AS INT)] AS INT)] AS vec_id,
        |       round(ss[CAST(t AS INT)], 6) + 0.0 AS score
        |FROM selK, unnest(range(1, 9)) u(t)
        |ORDER BY rank ASC""".stripMargin,
      simExpr = graft.query.Mmr.hammingSimExpr(64)),
    // Hamming serving-tier grouped page: per-label QUALIFY cap over the
    // popcount ranking of the surviving (non-deleted) rows
    "graftdb_local_hamming_grouped" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |s AS (SELECT e.label, e.vec_id,
        |             len(list_filter(range(1, 65),
        |                 i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::BIGINT
        |               AS hamming
        |      FROM embeddings e, q
        |      WHERE e.vec_id % 9 <> 4),
        |g AS (SELECT label, vec_id, hamming,
        |             row_number() OVER (PARTITION BY label
        |                                ORDER BY hamming ASC, vec_id ASC) AS rn
        |      FROM s QUALIFY rn <= 3)
        |SELECT label, vec_id, hamming
        |FROM g ORDER BY hamming ASC, vec_id ASC LIMIT 12""".stripMargin,
    "graftdb_knn_indexed" -> Queries.oracle("knn_l2"),
    // full corpus minus the two tail deletes folded by extendIndex
    "graftdb_knn_after_extend" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q
        |      WHERE e.vec_id NOT IN (260, 270))
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    // mixed corpus after the drift retrain: original front half plus the
    // ×4-scaled back half under remapped ids; drifted query (17, ×4)
    "graftdb_knn_after_drift" ->
      """WITH q AS (SELECT list_transform(embedding::DOUBLE[], x -> x * 4) AS qv
        |           FROM embeddings WHERE vec_id = 17),
        |base AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |         FROM embeddings WHERE vec_id < 250
        |         UNION ALL
        |         SELECT vec_id + 10000,
        |                list_transform(embedding::DOUBLE[], x -> x * 4)
        |         FROM embeddings WHERE vec_id >= 250),
        |s AS (SELECT b.vec_id, list_distance(b.v, q.qv) AS score
        |      FROM base b, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_knn_pq_indexed" -> Queries.oracle("knn_l2"),
    "graftdb_knn_opq_indexed" -> Queries.oracle("knn_l2"),
    "graftdb_knn_rabitq_indexed" -> Queries.oracle("knn_l2"),
    "graftdb_local_knn" -> Queries.oracle("knn_l2"),
    "graftdb_local_knn_rabitq" -> Queries.oracle("knn_l2"),
    // resharded set: full corpus minus the two pre-reshard deletes (the
    // far-away append can never enter a top-10)
    "graftdb_local_resharded" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 29),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q
        |      WHERE e.vec_id NOT IN (23, 46))
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_sharded" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 21),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_knn_int4" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 9),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_knn_pq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_knn_opq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_knn_where" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, q
        |      WHERE e.label >= 6 AND e.label <= 8 AND contains(d.text, 'a'))
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_knn_filtered" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.label = 4)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_delete" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.vec_id % 7 <> 3)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_append" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_sharded_refresh" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 17),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.vec_id % 9 <> 2)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_local_refresh" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 17),
        |s AS (SELECT e.vec_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.vec_id % 9 <> 2)
        |SELECT vec_id, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_knn_prefilter" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
        |s AS (SELECT e.vec_id, e.label,
        |             list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |      FROM embeddings e, q WHERE e.label = 4)
        |SELECT vec_id, label, round(score, 6) AS score
        |FROM s ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "graftdb_batch_indexed" -> Queries.oracle("batch_search"),
    "graftdb_hamming" -> IndexQueries.oracle("bq_hamming"),
    "graftdb_local_hamming" -> IndexQueries.oracle("bq_hamming"),
    "graftdb_local_sharded_hamming" -> IndexQueries.oracle("bq_hamming"),
    "graftdb_local_resharded_hamming" -> IndexQueries.oracle("bq_hamming")
      .replace("FROM embeddings e, q",
        "FROM embeddings e, q WHERE e.vec_id % 11 <> 5"),
    "graftdb_local_hamming_delete" -> IndexQueries.oracle("bq_hamming")
      .replace("FROM embeddings e, q",
        "FROM embeddings e, q WHERE e.vec_id % 7 <> 3"),
    // replica-side typed predicate over the exported label column
    "graftdb_local_hamming_where" -> IndexQueries.oracle("bq_hamming")
      .replace("FROM embeddings e, q",
        "FROM embeddings e, q WHERE e.label >= 3 AND e.label <= 7"),
    "graftdb_knn_cosine_indexed" -> Queries.oracle("knn_cosine"),
    // facade corpus = embeddings JOIN documents; at scale factors where
    // the two tables differ in size the BM25 side must be restricted to
    // the joined ids
    "graftdb_hybrid" -> Queries.oracle("hybrid_rrf").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),
    // a faithful clone answers exactly like its source store
    "graftdb_hybrid_cloned" -> Queries.oracle("hybrid_rrf").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),
    "graftdb_local_hybrid" -> Queries.oracle("hybrid_rrf").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),
    "graftdb_local_sharded_hybrid" -> Queries.oracle("hybrid_rrf").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),
    // a resharded lexical set answers exactly like the sharded one
    "graftdb_local_resharded_hybrid" -> Queries.oracle("hybrid_rrf").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),

    // live corpus after the mixed batch: everything except the tombstoned
    // seeded docs (doc_id % 10 = 3 among the first-half ids)
    "graftdb_bm25_after_append" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM documents JOIN embeddings ON vec_id = doc_id
        |  WHERE NOT (doc_id % 10 = 3 AND doc_id < 250)),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id)
        |SELECT doc_id, round(score, 6) AS score
        |FROM scored ORDER BY round(score, 6) DESC, doc_id ASC LIMIT 10""".stripMargin,
    "graftdb_hybrid_hamming" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM documents JOIN embeddings ON vec_id = doc_id),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |bscore AS (
        |  SELECT p.doc_id AS id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id),
        |brank AS (
        |  SELECT id, row_number() OVER (ORDER BY round(score, 6) DESC, id ASC) AS lrank
        |  FROM bscore QUALIFY lrank <= 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |vscore AS (
        |  SELECT e.vec_id AS id,
        |         len(list_filter(range(1, 65),
        |             i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::DOUBLE AS score
        |  FROM embeddings e, q),
        |vrank AS (
        |  SELECT id, row_number() OVER (ORDER BY score ASC, id ASC) AS vrank
        |  FROM vscore QUALIFY vrank <= 50),
        |fused AS (
        |  SELECT coalesce(v.id, b.id) AS id,
        |         coalesce(1.0::DOUBLE / (60 + v.vrank), 0.0) +
        |         coalesce(1.0::DOUBLE / (60 + b.lrank), 0.0) AS score
        |  FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id)
        |SELECT id, round(score, 6) AS score
        |FROM fused ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    // filtered Hamming hybrid: BM25 corpus statistics come from the FULL
    // joined corpus — the filter restricts which docs may claim a pool
    // slot on BOTH sides, not the index the pools are scored against
    "graftdb_local_hamming_hybrid_filtered" ->
      """WITH corpus AS (
        |  SELECT doc_id, label, text
        |  FROM documents JOIN embeddings ON vec_id = doc_id),
        |tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM corpus),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |bscore AS (
        |  SELECT p.doc_id AS id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id),
        |brank AS (
        |  SELECT b.id, row_number() OVER (ORDER BY round(b.score, 6) DESC, b.id ASC) AS lrank
        |  FROM bscore b JOIN corpus c ON c.doc_id = b.id
        |  WHERE c.label >= 2 QUALIFY lrank <= 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |vscore AS (
        |  SELECT e.vec_id AS id,
        |         len(list_filter(range(1, 65),
        |             i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::DOUBLE AS score
        |  FROM embeddings e, q WHERE e.label >= 2),
        |vrank AS (
        |  SELECT id, row_number() OVER (ORDER BY score ASC, id ASC) AS vrank
        |  FROM vscore QUALIFY vrank <= 50),
        |fused AS (
        |  SELECT coalesce(v.id, b.id) AS id,
        |         coalesce(1.0::DOUBLE / (60 + v.vrank), 0.0) +
        |         coalesce(1.0::DOUBLE / (60 + b.lrank), 0.0) AS score
        |  FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id)
        |SELECT id, round(score, 6) AS score
        |FROM fused ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "graftdb_threshold_indexed" -> Queries.oracle("search_threshold"),
    "graftdb_records" -> Queries.oracle("knn_l2"),
    "graftdb_threshold_hamming" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 8),
        |s AS (SELECT e.vec_id,
        |             len(list_filter(range(1, 65),
        |                 i -> (e.embedding[i] > 0) <> (q.qv[i] > 0)))::BIGINT AS hamming
        |      FROM embeddings e, q)
        |SELECT vec_id, hamming FROM s WHERE hamming <= 26
        |ORDER BY hamming ASC, vec_id ASC LIMIT 100""".stripMargin,
    "graftdb_search_iter" -> Queries.oracle("knn_l2"),
    // buildDb corpus = embeddings JOIN documents (1:1 on id); the delete
    // tombstones label-3 rows without rewriting segments
    "graftdb_stats" ->
      """SELECT 1::BIGINT AS segments,
        |       (SELECT count(*) FROM embeddings WHERE label <> 3)::BIGINT AS segment_rows,
        |       (SELECT count(*) FROM embeddings WHERE label = 3)::BIGINT AS delete_rows,
        |       1::BIGINT AS indexed_segments,
        |       'ivf_sq8' AS index_kinds,
        |       1::BIGINT AS stats_segments,
        |       1::BIGINT AS lexical_versions,
        |       (SELECT count(*) FROM embeddings WHERE label <> 3)::BIGINT AS seginfo_rows,
        |       1::BIGINT AS seginfo_indexed""".stripMargin,
    // the filtered search scans only the surviving (vec_id >= 250) segment
    // — every counter reduces to a count over the source table
    "graftdb_query_stats" ->
      """SELECT least(10, (SELECT count(*) FROM embeddings
        |                  WHERE label = 4 AND vec_id >= 250))::BIGINT AS rows_returned,
        |       1::BIGINT AS segments_scanned,
        |       1::BIGINT AS segments_pruned,
        |       count(*)::BIGINT AS rows_scanned,
        |       count(*)::BIGINT AS distance_computations
        |FROM embeddings WHERE vec_id >= 250""".stripMargin,
    // filtered hybrid: BM25 corpus statistics (idf / avgdl / N) come from
    // the FULL joined corpus — the filter restricts which docs may claim a
    // pool slot, not the index the pools are scored against
    "graftdb_hybrid_filtered" ->
      """WITH corpus AS (
        |  SELECT doc_id, label, text
        |  FROM documents JOIN embeddings ON vec_id = doc_id),
        |tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> len(x) > 0)) AS term
        |  FROM corpus),
        |post AS (SELECT term, doc_id, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*)::DOUBLE AS dlen FROM tok GROUP BY 1),
        |stats AS (SELECT count(*)::DOUBLE AS n, avg(dlen) AS avgdl FROM dl),
        |qt AS (SELECT unnest(ARRAY['spark', 'vector', 'merge']) AS term),
        |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY 1),
        |bscore AS (
        |  SELECT p.doc_id AS id,
        |         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) *
        |              (p.tf * (1.2::DOUBLE + 1)) /
        |              (p.tf + 1.2::DOUBLE * ((1 - 0.75::DOUBLE) + 0.75::DOUBLE * l.dlen / s.avgdl)) ) AS score
        |  FROM post p
        |  JOIN qt USING (term)
        |  JOIN dfreq d USING (term)
        |  JOIN dl l ON l.doc_id = p.doc_id, stats s
        |  GROUP BY p.doc_id),
        |brank AS (
        |  SELECT b.id, row_number() OVER (ORDER BY round(b.score, 6) DESC, b.id ASC) AS lrank
        |  FROM bscore b JOIN corpus c ON c.doc_id = b.id
        |  WHERE c.label >= 2 QUALIFY lrank <= 50),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
        |vscore AS (
        |  SELECT e.vec_id AS id,
        |         list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS score
        |  FROM embeddings e, q WHERE e.label >= 2),
        |vrank AS (
        |  SELECT id, row_number() OVER (ORDER BY round(score, 6) ASC, id ASC) AS vrank
        |  FROM vscore QUALIFY vrank <= 50),
        |fused AS (
        |  SELECT coalesce(v.id, b.id) AS id,
        |         coalesce(1.0::DOUBLE / (60 + v.vrank), 0.0) +
        |         coalesce(1.0::DOUBLE / (60 + b.lrank), 0.0) AS score
        |  FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id)
        |SELECT id, round(score, 6) AS score
        |FROM fused ORDER BY score DESC, id ASC LIMIT 10""".stripMargin
  )

  /** Derived aliases: rows whose oracle is literally another row's. */
  val oracleAliases: Map[String, String] = Map(
    "graftdb_local_hybrid_filtered" -> "graftdb_hybrid_filtered",
    "graftdb_local_sharded_hybrid_filtered" -> "graftdb_hybrid_filtered",
    "graftdb_local_sharded_hamming_hybrid_filtered" ->
      "graftdb_local_hamming_hybrid_filtered",
    // the in-process / sharded / resharded Hamming hybrids answer the
    // engine's exact integer-pool fuse — one oracle pins all four
    "graftdb_local_hamming_hybrid" -> "graftdb_hybrid_hamming",
    "graftdb_local_sharded_hamming_hybrid" -> "graftdb_hybrid_hamming",
    "graftdb_local_resharded_hamming_hybrid" -> "graftdb_hybrid_hamming",
    "graftdb_knn_join" -> "knn_join")
}
