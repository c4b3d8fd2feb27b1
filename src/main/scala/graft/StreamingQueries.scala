package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.store.CompactionPolicy
import graft.streaming.Ingest

/** Structured-Streaming verify queries. Each runs a REAL streaming query
  * (micro-batch engine: watermarks, append-mode windowed state, a custom
  * `mapGroupsWithState` operator, `foreachBatch` store ingest) to
  * completion inside the call and returns the final result frame, which
  * must hash-match the SAME DuckDB oracle as its batch twin — the
  * streaming plan and the batch plan are two physical strategies for one
  * logical query, so the oracle is shared.
  *
  * The reference's "online insert → immediately searchable" write path
  * (vecgo MemTable absorbing inserts, `internal/engine/engine.go:833`;
  * flush loop `engine.go:2313`) maps here to micro-batches committing one
  * snapshot version each; `streaming_ingest` drives that path end-to-end
  * and proves the final store content equals the source of record.
  *
  * Determinism notes (driver hash-compares against DuckDB):
  *   - `streaming_tumbling_agg` uses watermark + APPEND mode. Windows only
  *     emit once the watermark passes them, so after the real events a
  *     far-future sentinel row advances the watermark beyond every real
  *     window end; a second sentinel makes the emission batch itself carry
  *     data (emission happens in the batch AFTER the watermark-advancing
  *     one, and a data-bearing batch is awaited by `processAllAvailable`
  *     — a trailing zero-data batch is not). Sentinel rows are filtered
  *     from the result by their reserved event_type, so whether their own
  *     windows ever emit cannot affect the output.
  *   - decimal sums are order-insensitive (exact addition), so the result
  *     is identical however the engine splits micro-batches.
  *   - `streaming_sessionize` feeds one batch: within-group processing
  *     sorts by timestamp, and equal-second events cannot flip session
  *     boundaries (gap 0 ≤ 1800 either way), so the per-user totals equal
  *     the batch window-function formulation. Cross-batch state carry is
  *     exercised in `StreamingQueriesSpec`, where batch splits are
  *     controlled.
  */
object StreamingQueries {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private def sinkName(tag: String) = s"graft_${tag}_${sinkSeq.incrementAndGet()}"
  private def ckpt(tag: String): String =
    Files.createTempDirectory(s"graft_ckpt_$tag").toString

  /** Reserved event_type for watermark-advancing sentinel rows. */
  private val Sentinel = "graft_wm_sentinel"

  /** Tumbling 1-hour windows × event_type with a 17-minute watermark in
    * append mode — the streaming twin of [[EventQueries.tumblingAgg]].
    */
  def streamingTumblingAgg(s: SparkSession, dir: String): DataFrame =
    streamingWindowedAgg(s, dir, slide = None, tag = "tumbling")

  /** Sliding 1-hour/30-minute windows — the streaming twin of
    * [[EventQueries.slidingAgg]]: same watermark/append machinery, each
    * event feeding width/slide = 2 open windows of state.
    */
  def streamingSlidingAgg(s: SparkSession, dir: String): DataFrame =
    streamingWindowedAgg(s, dir, slide = Some("30 minutes"), tag = "sliding")

  private def streamingWindowedAgg(s: SparkSession, dir: String,
      slide: Option[String], tag: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ev = Tables.load(s, dir, "events")
      .select(unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("value"))
      .as[(Long, String, Double)].collect()
    val maxUs = ev.iterator.map(_._1).max
    val input = MemoryStream[(Long, String, Double)]
    val stream = input.toDF().toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val win = slide match {
      case Some(sl) => window(col("ts"), "1 hour", sl)
      case None => window(col("ts"), "1 hour")
    }
    val agg = stream
      .withWatermark("ts", "17 minutes")
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val sink = sinkName(tag)
    val q = agg.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt(tag))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(ev.toSeq)
      q.processAllAvailable()
      // sentinel 1: watermark → beyond every real window end
      input.addData(Seq((maxUs + 4L * 3600 * 1000000L, Sentinel, 0.0)))
      q.processAllAvailable()
      // sentinel 2: a data-bearing batch that runs WITH the advanced
      // watermark and therefore emits every real window
      input.addData(Seq((maxUs + 8L * 3600 * 1000000L, Sentinel, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink)
      .where(col("event_type") =!= Sentinel)
      .orderBy(col("window_start").asc, col("event_type").asc)
  }

  /** Gap-based sessionization through the custom stateful operator
    * ([[Ingest.sessionCounts]], `mapGroupsWithState`) — the streaming twin
    * of [[EventQueries.sessionize]] (same 30-minute gap rule, same
    * user_id < 50 slice).
    */
  def streamingSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ev = Tables.load(s, dir, "events")
      .where(col("user_id") < 50)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
      .as[(Long, Long)].collect()
    val input = MemoryStream[(Long, Long)]
    val updates = Ingest.sessionCounts(input.toDS(), gapSec = 1800)
    val sink = sinkName("sessionize")
    val q = updates.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("sessionize"))
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(ev.toSeq) // one batch → one final row per user
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink)
      .select(col("key").as("user_id"), col("sessions").as("n_sessions"),
        col("events").as("n_events"))
      .orderBy(col("user_id").asc)
  }

  /** Online ingest (vecgo W1): a file-source stream of embedding records
    * flows through [[GraftDB.insertStream]] one file per micro-batch —
    * each batch validates, commits a snapshot version, and is immediately
    * searchable; a compaction policy folds segments as they accumulate.
    * The final store content must equal the source of record exactly.
    */
  def streamingIngest(s: SparkSession, dir: String): DataFrame = {
    val src = s.read.parquet(s"$dir/embeddings.parquet")
    // lay the source out as several files so maxFilesPerTrigger=1 yields
    // several micro-batches (several store versions + a compaction)
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    src.repartition(4).write.mode("overwrite").parquet(srcDir)
    val stream = s.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"))
    val dbRoot = Files.createTempDirectory("graft_stream_db").toString
    val db = GraftDB.open(s, dbRoot, dim = 64, metric = "l2",
      schema = Map("label" -> "int"))
    val q = db.insertStream(stream, ckpt("ingest"),
      policy = Some(CompactionPolicy.threshold(3)))
    try q.processAllAvailable() finally q.stop()
    db.read()
      .select(col("id"), col("label").cast("long").as("label"))
      .orderBy(col("id").asc)
  }

  /** Streaming ingest feeding LEXICAL search — the W1+R10 integration
    * the incremental index exists for: every micro-batch commits one
    * store version, the per-segment lexical deltas resolve WITHOUT a
    * corpus re-tokenize (each delta built once over its own batch's
    * rows, enforced loudly via the engine counters), and the post-stream
    * BM25 top-10 hash-checks against DuckDB over the full corpus.
    */
  def streamingLexical(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val src = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("text"))
    val srcDir = Files.createTempDirectory("graft_stream_lex_src").toString
    src.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = s.readStream.schema(
        s.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val dbRoot = Files.createTempDirectory("graft_stream_lex_db").toString
    val db = GraftDB.open(s, dbRoot, dim = 64, metric = "l2",
      textCol = Some("text"))
    val q = db.insertStream(stream, ckpt("lex_ingest"), collectStats = false)
    try q.processAllAvailable() finally q.stop()
    val out = db.lexicalSearch("spark vector merge", 10)
      .select(col("id").as("doc_id"),
        org.apache.spark.sql.functions.round(col("score"), 6).as("score"))
    val res = out.collect()
    // incrementality gate: one delta build per micro-batch segment, total
    // rows tokenized == corpus size (no per-version corpus rebuilds)
    val segs = db.store.manifest().get.segments
    require(db.lexicalDeltaBuilds.get() == segs.size,
      s"expected ${segs.size} delta builds (one per streamed segment), " +
        s"got ${db.lexicalDeltaBuilds.get()}")
    require(db.lexicalDeltaRowsTokenized.get() == segs.map(_.rows).sum,
      s"tokenized ${db.lexicalDeltaRowsTokenized.get()} rows, corpus has " +
        s"${segs.map(_.rows).sum}")
    s.createDataFrame(java.util.Arrays.asList(res: _*), out.schema)
  }

  /** Streaming exact dedup — the unbounded-corpus twin of
    * [[PipelineQueries.dedupExact]]: a running stateful aggregation keyed
    * by canonical fingerprint (min surviving id + duplicate count),
    * COMPLETE output mode. Two micro-batches split the corpus so the
    * result provably merges state across batches; `min`/`count` are
    * order-insensitive, so the final table equals the batch twin's oracle
    * however the stream is chopped.
    */
  def streamingDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (first, second) = docs.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
    val sink = sinkName("dedup")
    val q = agg.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("dedup"))
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink)
      .select(col("keep_id"), col("n_dups"), col("fp"))
      .orderBy(col("keep_id").asc)
  }

  /** Streaming MinHash+LSH near-dup — the unbounded-corpus twin of
    * [[PipelineQueries.dedupMinhashLsh]]: each micro-batch is checked
    * against the ACCUMULATED corpus via
    * [[graft.dedup.Dedup.minhashLshIncrement]] (band-key equi-join against
    * the band state, candidate-only verification sets), and the batch's
    * band keys + hashed shingles are appended to the state store. A pair
    * emits exactly once — in the batch where its second member arrives —
    * so the union of per-batch emissions over any split equals the batch
    * twin's result, and the shared oracle hash-checks it. Ordering inside
    * `foreachBatch` matters: the pairs plan lazily reads the PRIOR state
    * dirs, so it is materialized before the state appends land.
    */
  def streamingMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (first, second) = docs.partition(_._1 % 2 == 0)
    val root = Files.createTempDirectory("graft_stream_minhash").toString
    val bandsDir = s"$root/bands"
    val hashedDir = s"$root/hashed"
    val pairsDir = s"$root/pairs"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def readIf(p: String): Option[DataFrame] =
      if (fs.exists(new org.apache.hadoop.fs.Path(p))) Some(s.read.parquet(p))
      else None
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (pairs, bBands, bHashed) = graft.dedup.Dedup.minhashLshIncrement(
          batch, "doc_id", "text", readIf(bandsDir), readIf(hashedDir),
          n = 3, numHashes = 32, rowsPerBand = 4, minJaccard = 0.8)
        pairs.write.mode("append").parquet(pairsDir)    // BEFORE state appends
        bBands.write.mode("append").parquet(bandsDir)
        bHashed.write.mode("append").parquet(hashedDir)
        ()
      }
      .option("checkpointLocation", ckpt("minhash"))
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.read.parquet(pairsDir)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Streaming banded-SRP cosine near-dup — the embedding twin of
    * [[streamingMinhash]] (unbounded-corpus form of
    * [[PipelineQueries.neardupCosine]]): batch 1 streams the original
    * embeddings, batch 2 the perturbed twins, so every true pair spans the
    * batch boundary and must be found by joining the new batch's band keys
    * against the ACCUMULATED key state. Plane-centering offsets derive
    * once from the first half and stay fixed (keys must be comparable
    * across batches); `bands = 64` keeps near-threshold recall under
    * sample-derived centering. Emitted pairs are exact-cosine-verified, so
    * the streaming result hash-checks against the same exact all-pairs
    * oracle as the batch twin.
    */
  def streamingNeardupCosine(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Dedup
    implicit val ctx = s.sqlContext
    val emb = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pert = emb.select(col("vec_id").as("src_id"), col("embedding"))
      .select(
        (col("src_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) => {
          val h = Dedup.portableHash(col("src_id"), (i + 1).cast("string"))
          (x.cast("double") + (h % 201 - 100).cast("double") / 4000.0).cast("float")
        }).as("embedding"))
    val offsets = Dedup.srpCenteringOffsets(emb, "embedding", dim = 64,
      bands = 64)
    import s.implicits._
    val first = emb.as[(Long, Seq[Float])].collect()
    val second = pert.as[(Long, Seq[Float])].collect()
    val root = Files.createTempDirectory("graft_stream_srp").toString
    val keysDir = s"$root/keys"
    val vecsDir = s"$root/vecs"
    val pairsDir = s"$root/pairs"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def readIf(p: String): Option[DataFrame] =
      if (fs.exists(new org.apache.hadoop.fs.Path(p))) Some(s.read.parquet(p))
      else None
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (pairs, bKeys, bVecs) = Dedup.srpNearDupIncrement(
          batch, "vec_id", "embedding", dim = 64, threshold = 0.9,
          offsets = offsets, priorKeys = readIf(keysDir),
          priorVecs = readIf(vecsDir), bands = 64)
        pairs.write.mode("append").parquet(pairsDir) // BEFORE state appends
        bKeys.write.mode("append").parquet(keysDir)
        bVecs.write.mode("append").parquet(vecsDir)
        ()
      }
      .option("checkpointLocation", ckpt("srp"))
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.read.parquet(pairsDir)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Streaming AS-OF join — the streaming twin of
    * [[EventQueries.asofJoin]] through the custom stateful operator
    * [[Ingest.asofMatches]] (flatMapGroupsWithState): purchases update
    * per-user carried state, clicks emit the purchase state as of their
    * timestamp. The corpus is split at its time midpoint into two
    * micro-batches, so batch 2's clicks provably read purchase state
    * carried over from batch 1. Each click emits exactly once, so the
    * Update-mode memory sink accumulates exactly the batch twin's rows
    * and hash-checks against the same oracle.
    */
  def streamingAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ev = Tables.load(s, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("u"),
        (col("event_type") === "purchase").as("is_p"), col("value"))
      .as[(Long, Long, Long, Boolean, Double)].collect()
    val mid = {
      val ts = ev.map(_._3); (ts.min + ts.max) / 2
    }
    // time-split batches: state flows forward, never backward
    val (first, second) = ev.partition(_._3 <= mid)
    val input = MemoryStream[(Long, Long, Long, Boolean, Double)]
    val matches = Ingest.asofMatches(input.toDS())
    val sink = sinkName("asof")
    val q = matches.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("asof"))
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink)
      .select(col("eventId").as("event_id"), col("userId").as("user_id"),
        col("lastPId").as("last_p_id"),
        round(col("lastPValue"), 6).as("last_p_value"))
      .orderBy(col("event_id").asc)
  }

  /** Streaming interval join — a REAL watermarked stream-stream join with
    * an event-time range condition, the streaming twin of
    * [[EventQueries.rangeJoin]]'s matching core: click events join the
    * 5-minute error-burst intervals that contain their timestamp. Both
    * sides carry the same bucket quantization as the batch twin (interval
    * exploded to the ≤2 buckets it overlaps), so the join has an equi-key
    * for state lookup and every qualifying pair matches exactly once in
    * the event's own bucket. Each side is fed in two time-split
    * micro-batches arriving ALTERNATELY (clicks₁, bursts₁, clicks₂,
    * bursts₂), so pairs provably match against buffered state from
    * earlier batches of the other stream. Inner-join append mode emits
    * each pair exactly once; the watermark bounds buffered state by event
    * time at scale without affecting which pairs emit here.
    */
  def streamingRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ivLenUs = 300L * 1000000L
    val ev = Tables.load(s, dir, "events")
    val bursts = ev.where(col("event_type") === "error" && col("value") > 50)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val clicks = ev.where(col("event_type") === "click" && col("user_id") < 30)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect()
    val mid = {
      val all = bursts.map(_._2) ++ clicks.map(_._2)
      (all.min + all.max) / 2
    }
    val ivInput = MemoryStream[(Long, Long)]
    val evInput = MemoryStream[(Long, Long)]
    val ivSide = ivInput.toDF().toDF("iv_id", "s_us")
      .withColumn("s_ts", timestamp_micros(col("s_us")))
      .withWatermark("s_ts", "1 hour")
      .withColumn("bucket", explode(sequence(
        floor(col("s_us") / ivLenUs),
        floor((col("s_us") + lit(ivLenUs - 1)) / ivLenUs))))
    val evSide = evInput.toDF().toDF("event_id", "u_us")
      .withColumn("u_ts", timestamp_micros(col("u_us")))
      .withWatermark("u_ts", "1 hour")
      .withColumn("bucket", floor(col("u_us") / ivLenUs))
    val joined = evSide.join(ivSide,
      evSide("bucket") === ivSide("bucket") &&
        ivSide("s_ts") <= evSide("u_ts") &&
        evSide("u_ts") < ivSide("s_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("event_id"), col("iv_id"))
    val sink = sinkName("rangejoin")
    val q = joined.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("rangejoin"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      // alternate the two sides' time-split halves: matches must come from
      // buffered join state in BOTH directions across batch boundaries
      evInput.addData(clicks.filter(_._2 <= mid).toSeq)
      q.processAllAvailable()
      ivInput.addData(bursts.filter(_._2 <= mid).toSeq)
      q.processAllAvailable()
      evInput.addData(clicks.filter(_._2 > mid).toSeq)
      q.processAllAvailable()
      ivInput.addData(bursts.filter(_._2 > mid).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("event_id").asc, col("iv_id").asc)
  }

  /** Streaming DSIR scoring — the deployment shape of
    * [[graft.pipeline.Dsir]]: both n-gram distributions are TRAINED ONCE
    * on static corpora, then the raw stream is scored against the frozen
    * model (stream-static broadcast joins, totals as literals). The
    * per-doc weight is a pure function of (doc, model), so any
    * micro-batch split reproduces the batch twin bit-for-bit and the
    * oracle is shared.
    */
  def streamingDsir(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Tables.load(s, dir, "documents")
    val target = docs.where(pmod(col("doc_id"), lit(10)) === 7)
    val raw = docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
    val m = graft.pipeline.Dsir.train(raw, target, "doc_id", "text", 1024)
    val rawRows = raw.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (evens, odds) = rawRows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val scored = graft.pipeline.Dsir.score(
      m, input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val sink = sinkName("dsir")
    val q = scored.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("dsir"))
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink)
      .select(col("id").as("doc_id"), col("n_tokens"), col("dsir_logratio"))
      .orderBy(col("doc_id").asc)
  }

  /** Streaming hashed-TF-IDF scoring ([[graft.text.Features.scoreTfIdf]])
    * under a FROZEN idf model trained batch-side on the full corpus —
    * the same train-once/score-anywhere split as `streaming_dsir`.
    * Scoring is row-local (zero shuffle, zero state), so the stream runs
    * in plain APPEND mode and each micro-batch's rows are final the
    * moment they are scored; the accumulated sink must hash-match the
    * batch twin's oracle exactly.
    */
  def streamingTfIdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Tables.load(s, dir, "documents")
    val m = graft.text.Features.trainIdf(docs, "doc_id", "text", dim = 64)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val scored = graft.text.Features.scoreTfIdf(
      m, input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val sink = sinkName("tfidf")
    val q = scored.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("tfidf"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("doc_id").asc, col("bucket").asc)
  }

  /** Streaming quality scoring ([[graft.text.QualityClassifier.score]])
    * under the same frozen linear model as the batch twin
    * `pipeline_quality_score` — scoring is a row-local expression (zero
    * shuffle, zero state), so the stream runs in plain APPEND mode and
    * the accumulated sink must hash-match the batch oracle exactly.
    * This is the deployment shape of model-based filtering: train once
    * batch-side, score every arriving document in-flight.
    */
  def streamingQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val m = graft.text.QualityClassifier.LinearQualityModel(64,
      Array.tabulate(64)(b => ((b * 2654435761L % 1000) - 500) / 1000.0),
      bias = 0.1)
    val rows = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val scored = graft.text.QualityClassifier.score(
      m, input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.55)
    val sink = sinkName("quality")
    val q = scored.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("quality"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("doc_id").asc)
  }

  /** Streaming text normalization ([[graft.text.TextAnalysis.normalizeText]])
    * with the batch twin's deterministic fixture injection — row-local,
    * append mode, accumulated sink hash-matches the batch oracle.
    */
  def streamingNormalize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val rows = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val in = input.toDF().toDF("doc_id", "text")
    val aug = concat(col("text"),
      when(col("doc_id") % 4 === 0,
        lit("\tCafé  \u200bRÉSUMÉ naïve\r\n")).otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        lit(" ÀÉÎÕÜ çñ ÿ\u00ad")).otherwise(lit("")))
    val normed = in.select(col("doc_id"),
        graft.text.TextAnalysis.normalizeText(aug).as("norm_text"))
      .withColumn("n_chars", length(col("norm_text")).cast("long"))
    val sink = sinkName("normalize")
    val q = normed.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("normalize"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("doc_id").asc)
  }

  /** Streaming random projection ([[graft.index.RandomProjection]]) —
    * the seeded matrix is frozen by construction (regenerates from md5),
    * so projection of arriving embeddings is row-local and append-safe;
    * the accumulated sink hash-matches the batch oracle.
    */
  def streamingProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val emb = Tables.load(s, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).limit(1).collect()(0)
      .getInt(0)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, Seq[Float])]
    val mat = graft.index.RandomProjection.matrix(dim, 16, "rp0")
    val proj = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"),
        posexplode(graft.index.RandomProjection.projectCol(
          col("embedding"), mat)))
      .select(col("vec_id"), col("pos").cast("long").as("j"),
        round(col("col"), 6).as("w"))
    val sink = sinkName("project")
    val q = proj.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("project"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("vec_id").asc, col("j").asc)
  }

  /** Streaming BPE encoding ([[graft.text.Bpe.encode]]) under the same
    * frozen merge list as the batch twin `text_bpe_tokens` — encoding is
    * a row-local replace chain (zero shuffle, zero state), so the stream
    * runs in plain APPEND mode and the accumulated sink must hash-match
    * the batch oracle byte-for-byte. The deployment shape of a learned
    * tokenizer: train once batch-side, tokenize every arriving document
    * in-flight.
    */
  def streamingBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val rows = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (evens, odds) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, String)]
    val enc = graft.text.Bpe.encode(graft.CurationQueries.frozenBpe,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val sink = sinkName("bpe")
    val q = enc.writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt("bpe"))
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(evens.toSeq)
      q.processAllAvailable()
      input.addData(odds.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    s.table(sink).orderBy(col("doc_id").asc)
  }

  /** Streaming ExactSubstr marking ([[graft.dedup.Dedup.duplicateSpanIncrement]]):
    * batch 1 streams the even doc_ids, batch 2 the odd, so cross-batch
    * duplicated substrings must be found by probing the ACCUMULATED
    * window-gram state — a batch window marks when its hash count over
    * state ∪ batch reaches 2, and a previously-unique STATE window marks
    * the moment a later batch collides with it. The union of emitted
    * marks equals the batch marking of the full corpus, so the final
    * gaps-and-islands merge hash-checks against the same DuckDB spans
    * oracle as the batch twin `dedup_substr_spans`.
    */
  def streamingDedupSubstr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val ctx = s.sqlContext
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (first, second) = docs.partition(_._1 % 2 == 0)
    val root = Files.createTempDirectory("graft_stream_substr").toString
    val gramsDir = s"$root/grams"
    val marksDir = s"$root/marks"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def readIf(p: String): Option[DataFrame] =
      if (fs.exists(new org.apache.hadoop.fs.Path(p))) Some(s.read.parquet(p))
      else None
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (marked, bg) = graft.dedup.Dedup.duplicateSpanIncrement(
          batch, "doc_id", "text", minLen = 30, readIf(gramsDir),
          portable = true)
        marked.write.mode("append").parquet(marksDir) // BEFORE state append
        bg.write.mode("append").parquet(gramsDir)
        ()
      }
      .option("checkpointLocation", ckpt("substr"))
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    graft.dedup.Dedup.mergeWindowSpans(s.read.parquet(marksDir), minLen = 30)
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
      .orderBy(col("doc_id").asc, col("span_start").asc)
  }

  /** Change-feed follower ([[graft.streaming.ChangeFeed]] — the
    * external-consumer twin of the replica's `refreshFrom` CDC): a
    * parquet mirror is seeded at the first version, then a streaming
    * `foreachBatch` follower converges it window-by-window while the
    * store moves underneath — two plain inserts (file-diff fast path),
    * an upsert-then-delete batch (fast path with tombstones), and a
    * compaction followed by another upsert (the two-scan fallback
    * window). The final mirror must hash-match the mutation algebra over
    * the source of record — proving each window applied exactly, in
    * order, through both diff paths.
    */
  def streamingChanges(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.ChangeFeed
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        col("label"))
    val dbRoot = Files.createTempDirectory("graft_changes_db").toString
    val db = GraftDB.open(s, dbRoot, dim = 64, metric = "l2",
      schema = Map("label" -> "int"))
    db.insertBatch(emb.where(pmod(col("id"), lit(3)) === 0))
    val mirrorDir = Files.createTempDirectory("graft_changes_mirror").toString
    ChangeFeed.initMirror(db, mirrorDir)
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ticks = MemoryStream[Int]
    val q = ChangeFeed.follow(db, ticks.toDF(), mirrorDir, ckpt("changes"))
    try {
      // window 1: two plain inserts — the file-diff fast path
      db.insertBatch(emb.where(pmod(col("id"), lit(3)) === 1))
      db.insertBatch(emb.where(pmod(col("id"), lit(3)) === 2))
      ticks.addData(1)
      q.processAllAvailable()
      // window 2: upsert a family, then delete another — tombstones ride
      // the fast path; upserts arrive as delete+insert of the same id
      db.upsert(emb.where(pmod(col("id"), lit(7)) === 2)
        .withColumn("label", col("label") + 100))
      val victims = emb.where(pmod(col("id"), lit(9)) === 4)
        .select("id").collect().map(_.getLong(0)).toSeq
      db.delete(victims)
      ticks.addData(2)
      q.processAllAvailable()
      // window 3: compaction + an upsert INSIDE one window — the file
      // diff cannot apply across the rewrite, so the follower converges
      // through the two-scan content-diff fallback
      db.compact()
      db.upsert(emb.where(pmod(col("id"), lit(11)) === 6)
        .withColumn("label", col("label") + 1000))
      ticks.addData(3)
      q.processAllAvailable()
    } finally q.stop()
    ChangeFeed.readMirror(db, mirrorDir)
      .select(col("id"), col("label").cast("long").as("label"))
      .orderBy(col("id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_changes" -> (streamingChanges _),
    "streaming_dedup_substr" -> (streamingDedupSubstr _),
    "streaming_tumbling_agg" -> (streamingTumblingAgg _),
    "streaming_sliding_agg" -> (streamingSlidingAgg _),
    "streaming_sessionize" -> (streamingSessionize _),
    "streaming_ingest" -> (streamingIngest _),
    "streaming_lexical" -> (streamingLexical _),
    "streaming_dedup_exact" -> (streamingDedupExact _),
    "streaming_minhash" -> (streamingMinhash _),
    "streaming_neardup_cosine" -> (streamingNeardupCosine _),
    "streaming_asof_join" -> (streamingAsofJoin _),
    "streaming_range_join" -> (streamingRangeJoin _),
    "streaming_dsir" -> (streamingDsir _),
    "streaming_tfidf" -> (streamingTfIdf _),
    "streaming_quality" -> (streamingQuality _),
    "streaming_bpe" -> (streamingBpe _),
    "streaming_normalize" -> (streamingNormalize _),
    "streaming_project" -> (streamingProject _)
  )

  val oracle: Map[String, String] = Map(
    // the streaming plans must reproduce their batch twins' oracles
    "streaming_tumbling_agg" -> EventQueries.oracle("events_tumbling_agg"),
    "streaming_sliding_agg" -> EventQueries.oracle("events_sliding_agg"),
    "streaming_sessionize" -> EventQueries.oracle("events_sessionize"),
    "streaming_ingest" ->
      """SELECT vec_id AS id, label::BIGINT AS label
        |FROM embeddings ORDER BY id ASC""".stripMargin,
    // follower mirror = the mutation algebra over the source of record:
    // window-3's upsert (+1000) wins over everything (it re-inserts even
    // previously deleted ids); window-2's delete removes %9=4 unless
    // re-upserted; window-2's upsert (+100) colors %7=2 survivors
    "streaming_changes" ->
      """WITH f AS (
        |  SELECT vec_id,
        |         CASE WHEN vec_id % 11 = 6 THEN label + 1000
        |              WHEN vec_id % 7 = 2 THEN label + 100
        |              ELSE label END AS label,
        |         (vec_id % 9 = 4 AND vec_id % 11 <> 6) AS gone
        |  FROM embeddings)
        |SELECT vec_id AS id, label::BIGINT AS label
        |FROM f WHERE NOT gone ORDER BY id ASC""".stripMargin,
    // streamed corpus = embeddings JOIN documents, like the facade rows
    "streaming_lexical" -> Queries.oracle("bm25_search").replace(
      "FROM documents)",
      "FROM documents JOIN embeddings ON vec_id = doc_id)"),
    "streaming_dedup_exact" -> PipelineQueries.oracle("dedup_exact"),
    "streaming_minhash" -> PipelineQueries.oracle("dedup_minhash_lsh"),
    "streaming_dedup_substr" -> PipelineQueries.oracle("dedup_substr_spans"),
    "streaming_dsir" -> PipelineQueries.oracle("pipeline_dsir_weights"),
    "streaming_tfidf" -> CurationQueries.oracle("text_hashed_tfidf"),
    "streaming_quality" -> PipelineQueries.oracle("pipeline_quality_score"),
    "streaming_bpe" -> CurationQueries.oracle("text_bpe_tokens"),
    "streaming_normalize" -> PipelineQueries.oracle("text_normalize"),
    "streaming_project" -> CurationQueries.oracle("embedding_project"),
    "streaming_neardup_cosine" -> PipelineQueries.oracle("neardup_cosine"),
    "streaming_asof_join" -> EventQueries.oracle("events_asof_join"),
    "streaming_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS iv_id, epoch_us(ts) AS s FROM events
        |  WHERE event_type = 'error' AND value > 50),
        |ev AS (
        |  SELECT event_id, epoch_us(ts) AS u FROM events
        |  WHERE event_type = 'click' AND user_id < 30)
        |SELECT ev.event_id, iv.iv_id
        |FROM ev JOIN iv ON iv.s <= ev.u AND ev.u < iv.s + 300000000
        |ORDER BY ev.event_id ASC, iv.iv_id ASC""".stripMargin
  )
}
