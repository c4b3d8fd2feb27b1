package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order clustered compaction: row-set preservation through the
  * rewrite, the file-level clustering geometry the layout exists for
  * (small per-file bounding boxes ⇒ multi-column min/max pruning), and
  * the loud refusals.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scratch(name: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_zorder_$name"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  // 20k rows, two uniform doubles decorrelated from insert order (id
  // hashes) — the adversarial layout for single-column clustering
  private lazy val data = spark.range(20000).select(col("id"),
    (pmod(xxhash64(col("id")), lit(100000L)).cast("double") / 1e5).as("a"),
    (pmod(xxhash64(col("id") + 7), lit(100000L)).cast("double") / 1e5).as("b"))

  /** Per-file bounding boxes of (a, b) in a segment directory. */
  private def fileBoxes(dir: String): Array[(Double, Double, Double, Double)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))

  test("z-order compaction preserves the live row set (incl. deletes)") {
    val root = scratch("rows")
    val store = new SnapshotStore(spark, root)
    store.insert(data.where(col("id") < 10000))
    store.insert(data.where(col("id") >= 10000))
    store.delete(data.where(col("id") % 7 === 0).select("id"))
    val before = store.read().select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val v = store.compactZOrder(Seq("a", "b"), bits = 8, targetFiles = 16)
    val after = store.read().select("id", "a", "b").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(after.toSeq === before.toSeq)
    val m = store.manifest().get
    assert(m.version === v && m.segments.size === 1 && m.deletes.isEmpty)
  }

  test("clustering geometry: small per-file boxes, multi-column pruning") {
    val root = scratch("geom")
    val store = new SnapshotStore(spark, root)
    store.insert(data)
    store.compactZOrder(Seq("a", "b"), bits = 8, targetFiles = 16)
    val segDir = store.manifest().get.segments.head.path
    val boxes = fileBoxes(segDir)
    assert(boxes.length >= 12, s"expected ~16 files, got ${boxes.length}")
    // each file's (a,b) bounding box must cover a small fraction of the
    // unit domain — insert-order files cover ~all of it (area ≈ 1.0)
    val areas = boxes.map { case (a0, a1, b0, b1) =>
      (a1 - a0) * (b1 - b0) }
    val avgArea = areas.sum / areas.length
    assert(avgArea < 0.30, s"avg file box area $avgArea — not clustered")
    // min/max pruning of a box predicate: files whose box misses
    // [0.1,0.2]×[0.3,0.4] can be skipped; the z-layout must prune most
    val (qa0, qa1, qb0, qb1) = (0.1, 0.2, 0.3, 0.4)
    val hit = boxes.count { case (a0, a1, b0, b1) =>
      a1 >= qa0 && a0 <= qa1 && b1 >= qb0 && b0 <= qb1 }
    assert(hit <= boxes.length / 2,
      s"box query still touches $hit/${boxes.length} files")
    // and an unclustered twin for contrast: same data, plain compact
    val root2 = scratch("geom_plain")
    val store2 = new SnapshotStore(spark, root2)
    store2.insert(data.repartition(16))
    store2.compact()
    val boxes2 = fileBoxes(store2.manifest().get.segments.head.path)
    if (boxes2.length >= 4) {
      val avg2 = boxes2.map { case (a0, a1, b0, b1) =>
        (a1 - a0) * (b1 - b0) }.sum / boxes2.length
      assert(avgArea < avg2 / 2,
        s"z-order avg box $avgArea not smaller than plain $avg2")
    }
  }

  test("zColumn validates and interleaves deterministically") {
    val z1 = ZOrder.zColumn(data, Seq("a", "b"), bits = 8)
    val z2 = ZOrder.zColumn(data, Seq("a", "b"), bits = 8)
    val s1 = data.select(z1.as("z")).orderBy("z").limit(100).collect()
      .map(_.getLong(0)).toSeq
    val s2 = data.select(z2.as("z")).orderBy("z").limit(100).collect()
      .map(_.getLong(0)).toSeq
    assert(s1 === s2)
    // bounds: 2 cols × 8 bits → z < 2^16
    val zmax = data.select(max(z1)).collect()(0).getLong(0)
    assert(zmax >= 0L && zmax < (1L << 16))
    intercept[IllegalArgumentException] {
      ZOrder.zColumn(data, Seq.empty, bits = 8)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zColumn(data, Seq("a", "b"), bits = 32)
    }
  }

  test("indexed stores are refused loudly") {
    val root = scratch("refuse")
    val store = new SnapshotStore(spark, root)
    val vecs = spark.range(500).select(col("id"),
      array((0 until 8).map(i =>
        (pmod(xxhash64(col("id") + i), lit(1000L)).cast("double") / 1000.0)
          .cast("float")): _*)
        .as("vector"),
      (col("id") % 10).cast("double").as("a"))
    store.insert(vecs)
    store.compactIndexed("vector", nlist = 4)
    val e = intercept[IllegalArgumentException] {
      store.compactZOrder(Seq("a"))
    }
    assert(e.getMessage.contains("indexed"))
  }
}
