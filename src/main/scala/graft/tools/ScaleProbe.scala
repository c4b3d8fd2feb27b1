package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point scale curve for the paths whose 100 TB story rests on
  * plan shape (round-8 verdict, ask 5): testdata stops at sf0.1, so this
  * probe synthesizes n = 50k/500k/5M vectors (20k/200k/2M docs for the
  * text paths) and measures bulk load, IVF build (assign+write under a
  * constant model) + probe, the two-large-sides k-NN join, ExactSubstr
  * span removal (production hash) and MinHash+LSH at each point,
  * asserting near-linear scaling: consecutive time ratios must stay
  * within `SLACK`× the row ratio (sublinear always passes — small points
  * are fixed-overhead dominated). Prints a markdown table for
  * BASELINE.md and exits non-zero on a violation.
  *
  * Scales override via args: `ScaleProbe 50000,500000,5000000
  * 20000,200000,2000000`.
  */
object ScaleProbe {
  private val Slack = 1.5
  // per-vector bytes the probe holds live (128d float cache + shuffle +
  // working copies), for the heap floor below
  private val dimBytes = 128L * 4

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Deterministic synthetic corpus: 20 hash-drawn words per doc; every
    * 17th doc carries a shared 75-char suffix (ExactSubstr work — the
    * span repeats n/17 times) and every (100k+1)th doc copies its left
    * neighbor's words (MinHash work — n/100 exact-dup pairs, so the
    * candidate set stays linear in n, never quadratic).
    */
  private def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = typedlit((0 until 64).map(i => f"word$i%02d"))
    val gid = when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val words = (0 until 20).map(w => element_at(vocab,
      (pmod(xxhash64(gid, lit(w)), lit(64)) + 1).cast("int")))
    val base = concat_ws(" ", words: _*)
    val shared = lit("the quick brown fox jumps over the lazy dog " +
      "again and again in every corpus")
    spark.range(n).select(col("id"),
      when(pmod(col("id"), lit(17)) === 0, concat_ws(" ", base, shared))
        .otherwise(base).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val vecScales = args.headOption.getOrElse("50000,500000,5000000")
      .split(",").map(_.trim.toLong).toSeq
    val docScales = args.drop(1).headOption.getOrElse("20000,200000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    require(vecScales.size == docScales.size, "scale lists must align")
    // local-mode heap gate: spark.driver.memory set after JVM start has
    // NO effect in local mode (round-9 advice) — the fork's -Xmx is what
    // counts (build.sbt forwards SPARK_DRIVER_MEM). The round-9 curve's
    // 5M point ran in the default 8g and spilled; the probe now refuses
    // to produce a silently memory-degraded point instead.
    val heap = Runtime.getRuntime.maxMemory
    val needed = vecScales.max * dimBytes * 2 + (4L << 30)
    require(heap >= needed,
      f"heap ${heap / (1L << 30)}%d GiB < ${needed / (1L << 30)}%d GiB " +
        f"needed for ${vecScales.max}%,d vectors without spilling — " +
        "rerun with SPARK_DRIVER_MEM=<N>g (build.sbt forwards it to -Xmx)")
    System.err.println(s"[scale] heap ${heap / (1L << 30)} GiB " +
      s"(needed floor ${needed / (1L << 30)} GiB)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // a big heap GCs rarely, so the ContextCleaner never reclaims
      // finished stages' shuffle files — across a multi-point run they
      // accumulate to >100 GB, fill the disk, AND evict the page cache
      // that shuffle reads depend on (measured: 3× slower joins, then
      // ENOSPC at the 8M-doc point). Periodic GC keeps the dead-shuffle
      // footprint at one point's live set; see also the System.gc()
      // between points below.
      .config("spark.cleaner.periodicGC.interval", "120s")
      // zstd shuffle blocks: the gram shuffles are framing-heavy rows
      // around an incompressible 8-byte hash — zstd keeps the top
      // point's total shuffle under the kernel's dirty-page writeback
      // throttle (vm.dirty_ratio: 20% of RAM on this box), which is the
      // single-box cliff that turns a linear plan superlinear in
      // wall-clock. The standard production setting for exactly this.
      .config("spark.io.compression.codec", "zstd")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 128
    val tmp = sys.props("java.io.tmpdir")
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def rm(p: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(p), true)

    // (path, n, seconds) per measured point, in run order
    val rows = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()

    def runPoint(nVec: Long, nDoc: Long, discard: Boolean): Unit = {
      val tag = if (discard) "warm" else s"n=$nVec"
      System.err.println(s"[scale] --- point $tag (docs=$nDoc)")
      // shuffle partitions sized to the POINT, not fixed at core count —
      // the brief's rule ("size shuffle partitions so partitions fit in
      // executor memory"): the substr path shuffles ~1 gram/char
      // (~40 B × ~120 chars/doc), and at 6M docs a fixed 32 partitions
      // puts ~1 GB into every task's sort — multi-pass spills turned a
      // linear plan superlinear in wall-clock. ~250 MB/task keeps every
      // sort single-pass at any point size.
      val parts = math.max(cpus.toInt,
        (nDoc * 120L * 40 / (250L << 20)).toInt)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      System.err.println(s"[scale] shuffle partitions = $parts")
      val vecs = graft.Bench.synthVectors(spark, nVec, dim).cache()
      vecs.count()
      val docs = synthDocs(spark, nDoc).cache()
      docs.count()
      val q0 = vecs.where(col("id") === 0).select("vec")
        .collect()(0).getSeq[Float](0).toArray
      // each timed path starts with DRAINED writeback: at the top points
      // every path writes/spills gigabytes, and without the drain a
      // path's clock pays the PREVIOUS path's dirty pages (the same
      // discipline Bench.scala applies to its memory tier)
      def sync(): Unit =
        try { new ProcessBuilder("sync").start().waitFor(); () }
        catch { case scala.util.control.NonFatal(_) => () }
      def rec(name: String, sec: Double, n: Long): Unit = {
        System.err.println(f"[scale] $name%-16s n=$n%-8d ${sec}%8.2f s")
        if (!discard) rows += ((name, n, sec))
      }

      // 1. bulk load: the engine's deferred write path, fresh store
      val storeDir = s"$tmp/scaleprobe_store"
      rm(storeDir)
      val db = graft.GraftDB.open(spark, storeDir, dim = dim, metric = "l2")
      val input = vecs.select(col("id"), col("vec").as("vector"), col("label"))
      sync()
      rec("bulk_load", time {
        db.insertBatch(input, collectStats = false)
      }, nVec)
      rm(storeDir) // free its gigabytes before the next write-heavy path

      // 2. IVF build: assign + partitioned write under a model trained on
      // a CONSTANT-size sample (so the timed cost is the linear part)
      val model = graft.index.IVF.train(
        vecs.sample(withReplacement = false,
          math.min(1.0, 20000.0 / nVec), 42L), "vec", k = 32, maxIter = 10)
      val ivfDir = s"$tmp/scaleprobe_ivf"
      rm(ivfDir)
      sync()
      rec("ivf_build", time {
        graft.index.IVF.writeLayout(
          graft.index.IVF.assign(vecs, "vec", model), ivfDir)
      }, nVec)
      val layout = spark.read.parquet(ivfDir)
      rec("ivf_probe4", time {
        graft.index.IVF.search(layout, "vec", "id", model, q0,
          k = 10, nprobe = 4).collect()
      }, nVec)

      // 3. two-large-sides k-NN join: 1k queries routed through the cells
      val qdf = vecs.where(col("id") < 1000)
        .select(col("id").as("qid"), col("vec").as("qv"))
      sync()
      rec("knn_join_1k", time {
        // 1k queries × nprobe=2 cells is a ~1 MB exploded side: the
        // caller KNOWS it's broadcastable, so it says so (AQE dropped
        // the broadcast at the 5M point — a measured 3× cliff)
        graft.query.Search.knnJoinIvf(layout, "vec", "id", qdf, "qid",
          "qv", k = 10, model, nprobe = 2, reuseLayoutCol = true,
          broadcastQueries = true)
          .write.format("noop").mode("overwrite").save()
      }, nVec)

      // 4. ExactSubstr span removal at the production hash
      sync()
      rec("substr_dedup", time {
        graft.dedup.Dedup.removeDuplicateSpans(docs, "id", "text",
          minLen = 30)
          .write.format("noop").mode("overwrite").save()
      }, nDoc)

      // 5. MinHash+LSH near-dup pairs
      sync()
      rec("minhash_lsh", time {
        graft.dedup.Dedup.minhashLsh(docs, "id", "text",
          numHashes = 16, rowsPerBand = 4)
          .write.format("noop").mode("overwrite").save()
      }, nDoc)

      vecs.unpersist(); docs.unpersist()
      rm(ivfDir)
      // drop the point's dead shuffle files NOW (the cleaner acts on GC):
      // the next point must start with a clean disk and page cache
      System.gc()
      Thread.sleep(3000)
    }

    // one discarded pass at the smallest point absorbs JIT/codegen, so
    // every measured point pays the same (small) fixed overheads
    runPoint(vecScales.head, docScales.head, discard = true)
    vecScales.zip(docScales).foreach { case (nv, nd) =>
      runPoint(nv, nd, discard = false)
    }

    // ------------------------------------------------- table + assertion
    val byPath = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val sb = new StringBuilder
    sb.append("| path | n | sec | rows/s | time ratio | row ratio | linear? |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    var violations = List.empty[String]
    byPath.toSeq.sortBy(t => rows.indexWhere(_._1 == t._1)).foreach {
      case (path, pts) =>
        pts.zipWithIndex.foreach { case ((_, n, sec), i) =>
          val (tr, rr, ok) = if (i == 0) (Double.NaN, Double.NaN, true) else {
            val (_, pn, ps) = pts(i - 1)
            val tRatio = sec / math.max(ps, 0.05)
            val rRatio = n.toDouble / pn
            (tRatio, rRatio, tRatio <= Slack * rRatio)
          }
          if (!ok) violations ::=
            f"$path at n=$n: time ratio $tr%.1f > $Slack x row ratio $rr%.1f"
          val trS = if (tr.isNaN) "-" else f"$tr%.2f"
          val rrS = if (rr.isNaN) "-" else f"$rr%.1f"
          val okS = if (tr.isNaN) "-" else if (ok) "yes" else "NO"
          sb.append(f"| $path | $n | $sec%.2f | ${n / sec}%,.0f " +
            s"| $trS | $rrS | $okS |\n")
        }
    }
    println(sb.toString)
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[scale] VIOLATION: $v"))
      spark.stop()
      sys.exit(1)
    }
    println(s"[scale] PASS: every consecutive time ratio within " +
      s"${Slack}x its row ratio")
    spark.stop()
  }
}
