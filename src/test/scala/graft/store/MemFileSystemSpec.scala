package graft.store

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftDB, SparkTestSession}

/** The heap-resident `graftmem:` filesystem: the FS-contract pieces the
  * store stack relies on (exclusive-create CAS, atomic subtree rename,
  * into-directory rename, recursive delete, listing), then the full
  * store verb chain living entirely in byte arrays — the reference's
  * in-process memory blob store behind Hadoop's interface.
  */
class MemFileSystemSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs() = {
    MemFileSystem.register(spark.sparkContext.hadoopConfiguration)
    new Path("graftmem:/").getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  private def write(f: Path, s: String, overwrite: Boolean = true): Unit = {
    val out = fs().create(f, overwrite)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def read(f: Path): String = {
    val in = fs().open(f)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      buf.toString("UTF-8")
    } finally in.close()
  }

  test("create/open/list/rename/delete hold the store's FS contract") {
    MemFileSystem.clear()
    val f = fs()
    write(new Path("graftmem:/a/b/one.txt"), "one")
    write(new Path("graftmem:/a/b/two.txt"), "two")
    assert(read(new Path("graftmem:/a/b/one.txt")) == "one")
    // implicit parents list as dirs; children enumerate exactly once
    val names = f.listStatus(new Path("graftmem:/a/b")).map(_.getPath.getName).sorted
    assert(names.toSeq == Seq("one.txt", "two.txt"))
    assert(f.getFileStatus(new Path("graftmem:/a")).isDirectory)
    // positioned read (parquet's access pattern)
    val in = f.open(new Path("graftmem:/a/b/one.txt"))
    val b = new Array[Byte](2)
    in.readFully(1L, b)
    assert(new String(b) == "ne")
    in.close()
    // exclusive create is a CAS: second writer loses at close
    write(new Path("graftmem:/a/MANIFEST-1"), "v1", overwrite = false)
    intercept[FileAlreadyExistsException] {
      write(new Path("graftmem:/a/MANIFEST-1"), "v1b", overwrite = false)
    }
    assert(read(new Path("graftmem:/a/MANIFEST-1")) == "v1")
    // subtree rename (the committer's job-finalize move)
    assert(f.rename(new Path("graftmem:/a/b"), new Path("graftmem:/a/c")))
    assert(read(new Path("graftmem:/a/c/two.txt")) == "two")
    assert(!f.exists(new Path("graftmem:/a/b")))
    // rename onto an existing directory moves INTO it (HDFS semantics)
    f.mkdirs(new Path("graftmem:/dest"))
    assert(f.rename(new Path("graftmem:/a/c"), new Path("graftmem:/dest")))
    assert(read(new Path("graftmem:/dest/c/one.txt")) == "one")
    // non-recursive delete of a non-empty dir refuses loudly
    intercept[java.io.IOException] {
      f.delete(new Path("graftmem:/dest"), false)
    }
    assert(f.delete(new Path("graftmem:/dest"), true))
    assert(!f.exists(new Path("graftmem:/dest/c/one.txt")))
  }

  test("the full store verb chain runs in heap, no disk IO") {
    MemFileSystem.clear()
    val root = "graftmem:/stores/mem-chain"
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() * 2 - 1)
    }
    def records(ids: Range) =
      ids.map(i => (i.toLong, vec(i), i % 4)).toDF("id", "vector", "label")
    MemFileSystem.register(spark.sparkContext.hadoopConfiguration)
    val db = GraftDB.open(spark, root, dim = 8, metric = "l2",
      schema = Map("label" -> "int"))
    db.insertBatch(records(0 until 120))
    db.insertBatch(records(120 until 200))
    db.delete((0L until 200L by 17).toSeq)
    db.upsert(records(10 until 20).withColumn("label", lit(9)))
    val expect = (0L until 200L).toSet -- (0L until 200L by 17).toSet ++
      (10L until 20L).toSet
    def ids(): Set[Long] = db.read().select("id").as[Long].collect().toSet
    assert(ids() == expect)
    db.compact()
    assert(ids() == expect)
    val top = db.search(vec(3), 5).collect().map(_.getLong(0))
    assert(top.length == 5 && top.forall(expect.contains))
    db.vacuum(keepVersions = 1)
    assert(ids() == expect)
    // the bytes live in the process map — and only there
    assert(MemFileSystem.usedBytes() > 0)
    assert(!new java.io.File("/stores/mem-chain").exists())
    MemFileSystem.clear()
    assert(MemFileSystem.usedBytes() == 0)
  }
}
