package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal column plumbing: schema contract, determinism, and shape
  * invariants (the decode kernels are deterministic stubs by design). */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("asset table has the (binary payload, typed meta) schema") {
    val df = graft.pipeline.Multimodal.assets(spark, sfDir)
    assert(df.schema("payload").dataType === BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq === Seq("mime", "n_bytes", "origin"))
    assert(df.count() === 500)
  }

  test("decode emits positive dimensions and is deterministic") {
    val a = run("p14_multimodal_decode").collect()
    val b = run("p14_multimodal_decode").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getAs[Int]("width") > 0 && r.getAs[Int]("height") > 0))
  }

  test("resize plan never exceeds the max dimension and preserves aspect") {
    val rows = run("p15_multimodal_resize").collect()
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 256 && oh <= 256)
      assert(ow <= w && oh <= h)
    }
  }

  test("frame sampling slices only video assets, ≤10 frames") {
    val df = run("p16_multimodal_frames")
    assert(df.count() > 0)
    assert(df.filter(col("n_sampled") > 10).count() === 0)
  }

  test("feature extraction yields fixed-dim vectors in [-1, 1]") {
    // array form is API-only (the declared query emits a scalar digest so
    // the driver's pandas compare can sort it)
    val df = graft.pipeline.Multimodal.featuresRaw(spark, sfDir)
    assert(df.filter(size(col("features")) =!= 16).count() === 0)
    val flat = df.select(explode(col("features")).as("v"))
    assert(flat.filter(col("v") < -1.0 || col("v") > 1.0).count() === 0)
  }

  test("pluggable mapPartitions decode equals the SQL decode path") {
    val viaKernel = graft.pipeline.Multimodal.decodePartitioned(spark, sfDir)
      .toDF().select("asset_id", "mime", "n_bytes", "width", "height", "channels")
    val viaSql = run("p14_multimodal_decode")
    assert(viaKernel.exceptAll(viaSql).count() === 0)
    assert(viaSql.exceptAll(viaKernel).count() === 0)
    // and a swapped kernel flows through the same plumbing
    val fixed = graft.pipeline.Multimodal
      .decodePartitioned(spark, sfDir, (_, _) => (640, 480, 1)).collect()
    assert(fixed.forall(d => d.width === 640 && d.height === 480 && d.channels === 1))
  }

  test("declared frame/feature queries emit scalar digests, no arrays") {
    Seq("p16_multimodal_frames", "p17_multimodal_features").foreach { n =>
      val schema = run(n).schema
      assert(!schema.exists(_.dataType.isInstanceOf[ArrayType]),
        s"$n must emit only scalar columns for the driver compare")
    }
    // and the array forms stay available to API consumers
    assert(graft.pipeline.Multimodal.frameSampleRaw(spark, sfDir)
      .schema("frame_hashes").dataType.isInstanceOf[ArrayType])
  }
}
