package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.types.Metric

/** Recall + list-balance audit of the serving layout under the r12
  * driver-local IVF trainer, on the BENCH's own fixture shape (synth 10k
  * rows / 128d, nlist=64, search nprobe=8 — the 10k-latency headline):
  * the layout change may only make the headline faster if recall@10 holds.
  *
  * Usage: runMain graft.tools.RecallProbe
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 50000L
    val dim = 128
    val synth = graft.Bench.synthVectors(spark, n, dim).cache()
    synth.count()
    val sub10k = synth.where(col("id") < 10000)
    val replica = graft.serve.LocalReplica.fromDataFrame(
      sub10k, "vec", "id", Metric.L2, nlist = 64)
    val brute = graft.serve.LocalReplica.fromDataFrame(
      sub10k, "vec", "id", Metric.L2)
    val queries = synth.where(col("id") < 100)
      .select(col("id"), col("vec")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    var hit = 0
    var tot = 0
    queries.foreach { q =>
      val exact = brute.search(q, 10).map(_.id).toSet
      val approx = replica.search(q, 10, nprobe = 8).map(_.id).toSet
      hit += exact.intersect(approx).size
      tot += exact.size
    }
    println(f"[recall] recall@10 nprobe=8/64 over ${queries.length} " +
      f"queries: ${hit.toDouble / tot}%.4f")
    // list balance of the replica layout
    val sizes = replica.listSizes
    if (sizes.nonEmpty) {
      val sorted = sizes.sorted
      println(s"[recall] lists=${sizes.length} min=${sorted.head} " +
        s"p50=${sorted(sorted.length / 2)} max=${sorted.last} " +
        s"empty=${sizes.count(_ == 0)}")
    }
    // same audit at the 50k scale the local_knn row serves (nlist=256)
    val replica50k = graft.serve.LocalReplica.fromDataFrame(
      synth, "vec", "id", Metric.L2, nlist = 256)
    val brute50k = graft.serve.LocalReplica.fromDataFrame(
      synth, "vec", "id", Metric.L2)
    var hit2 = 0
    var tot2 = 0
    queries.foreach { q =>
      val exact = brute50k.search(q, 10).map(_.id).toSet
      val approx = replica50k.search(q, 10, nprobe = 16).map(_.id).toSet
      hit2 += exact.intersect(approx).size
      tot2 += exact.size
    }
    println(f"[recall] 50k recall@10 nprobe=16/256: ${hit2.toDouble / tot2}%.4f")
    val sizes2 = replica50k.listSizes
    if (sizes2.nonEmpty) {
      val sorted = sizes2.sorted
      println(s"[recall] 50k lists=${sizes2.length} min=${sorted.head} " +
        s"p50=${sorted(sorted.length / 2)} max=${sorted.last} " +
        s"empty=${sizes2.count(_ == 0)}")
    }
    // ---- model-level trainer A/B: MLlib k-means|| vs the r12 local
    // trainer, same data, same k — which fraction of the true top-10's
    // cells do the 8 probed cells cover?
    def modelRecall(model: graft.index.IVF.Model, tag: String,
        nprobes: Seq[Int] = Seq(8)): Unit = {
      val rows = sub10k.select(col("id"), col("vec")).collect()
      val vecs = rows.map(_.getSeq[Float](1).toArray)
      val assignOf = vecs.map(v => model.probes(v, 1).head)
      var hit = 0
      var tot = 0
      var probedRows = 0L
      val listSz = new Array[Int](model.k)
      assignOf.foreach(c => listSz(c) += 1)
      val exactAll = queries.map { q =>
        vecs.zipWithIndex
          .map { case (v, i) =>
            (graft.functions.DistanceKernels.l2sqFF(v, q), rows(i).getLong(0), i)
          }
          .sortBy(t => (t._1, t._2)).take(10)
      }
      nprobes.foreach { np =>
        hit = 0; tot = 0; probedRows = 0L
        queries.zip(exactAll).foreach { case (q, exact) =>
          val probes = model.probes(q, np).toSet
          probes.foreach(c => probedRows += listSz(c))
          exact.foreach { case (_, _, i) =>
            if (probes.contains(assignOf(i))) hit += 1
          }
          tot += 10
        }
        println(f"[recall] $tag nprobe=$np/${model.k}: recall@10 " +
          f"${hit.toDouble / tot}%.4f; avg probed rows/query " +
          f"${probedRows / queries.length}")
      }
    }
    val mllib = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val feats = sub10k.select(array_to_vector(col("vec")).as("features"))
      val km = new KMeans().setK(64).setSeed(42L).setMaxIter(10)
      graft.index.IVF.Model(
        km.fit(feats).clusterCenters.map(_.toArray.map(_.toFloat)))
    }
    modelRecall(mllib, "mllib", Seq(4, 8, 12, 16))
    val local = graft.index.IVF.train(sub10k.select(col("vec")), "vec",
      k = 64, maxIter = 10)
    modelRecall(local, "local", Seq(4, 8, 12, 16, 18, 24))
    // partially-converged local variants
    Seq(0, 1, 2, 5).foreach { it =>
      val m = graft.index.IVF.train(sub10k.select(col("vec")), "vec",
        k = 64, maxIter = it)
      modelRecall(m, s"local-iter$it", Seq(8, 16))
    }
    spark.stop()
  }
}
