package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The packed float32 blob layout: round-trip fidelity and that every
  * distance expression computes identical results on either physical
  * layout (array<float> vs binary), in both interpreted eval and
  * whole-stage codegen.
  */
class PackedVectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecs: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1.0f, 2.5f, -3.25f, 0.125f),
    2L -> Array(-0.5f, 0.0f, 7.75f, 2.0f),
    3L -> Array(Float.MinPositiveValue, 1e30f, -1e-30f, 42.0f))

  test("pack/unpack kernel round-trip is bit-exact") {
    vecs.foreach { case (_, v) =>
      val packed = DistanceKernels.floatsToBytes(v)
      assert(packed.length === v.length * 4)
      val back = DistanceKernels.bytesToFloats(packed)
      assert(back.map(java.lang.Float.floatToRawIntBits).toSeq ===
        v.map(java.lang.Float.floatToRawIntBits).toSeq)
    }
    // blob is little-endian regardless of platform: 1.0f = 0x3f800000
    val one = DistanceKernels.floatsToBytes(Array(1.0f))
    assert(one.toSeq === Seq[Byte](0, 0, -128, 63))
  }

  test("pack/unpack expressions round-trip through a DataFrame") {
    val df = vecs.toDF("id", "v")
    val back = df.select($"id", vec_unpack_f32(vec_pack_f32($"v")).as("v2"))
      .orderBy("id").collect()
    vecs.zip(back).foreach { case ((_, v), row) =>
      assert(row.getSeq[Float](1) === v.toSeq)
    }
    assert(intercept[Exception](
      df.select(vec_unpack_f32($"id")).collect()
    ).getMessage.toLowerCase.contains("binary"))
  }

  test("distance expressions agree across layouts (codegen path)") {
    val df = vecs.toDF("id", "v")
      .withColumn("p", vec_pack_f32($"v"))
      .cache()
    val q = Array(0.5f, -1.0f, 2.0f, 3.0f)
    val plain = df.select($"id",
      vec_l2sq($"v", lit(q)).as("l2"),
      vec_dot($"v", lit(q)).as("dot"),
      vec_cos($"v", lit(q)).as("cos"),
      vec_norm($"v").as("nrm")).orderBy("id").collect()
    val packed = df.select($"id",
      vec_l2sq($"p", lit(q)).as("l2"),
      vec_dot($"p", lit(q)).as("dot"),
      vec_cos($"p", lit(q)).as("cos"),
      vec_norm($"p").as("nrm")).orderBy("id").collect()
    // mixed: packed row side, packed CONSTANT side too
    val qPacked = DistanceKernels.floatsToBytes(q)
    val mixed = df.select($"id",
      vec_l2sq($"p", lit(qPacked)).as("l2")).orderBy("id").collect()
    plain.zip(packed).foreach { case (a, b) =>
      assert(a.getDouble(1) === b.getDouble(1))
      assert(a.getDouble(2) === b.getDouble(2))
      assert(a.getDouble(3) === b.getDouble(3))
      assert(a.getDouble(4) === b.getDouble(4))
    }
    plain.zip(mixed).foreach { case (a, b) =>
      assert(a.getDouble(1) === b.getDouble(1))
    }
    // non-constant right side, both packed
    val pair = df.select(vec_l2sq($"p", $"p").as("z")).collect()
    pair.foreach(r => assert(r.getDouble(0) === 0.0))
    df.unpersist()
  }

  test("vec_l2sq_multi accepts packed input") {
    val df = vecs.toDF("id", "v").withColumn("p", vec_pack_f32($"v"))
    val qs = Array(Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f, 1.0f))
    val a = df.select(vec_l2sq_multi($"v", qs).as("d")).orderBy($"d").collect()
    val b = df.select(vec_l2sq_multi($"p", qs).as("d")).orderBy($"d").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Double](0) === y.getSeq[Double](0))
    }
  }
}
