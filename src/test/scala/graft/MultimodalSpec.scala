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

  test("imageKernel decodes a real PNG fixture; everything else rides the stub") {
    import graft.pipeline.Multimodal
    // a real 13×7 RGB PNG, produced by the JDK's own encoder
    val img = new java.awt.image.BufferedImage(
      13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xFF8800)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    assert(Multimodal.imageKernel(png, "image/png") === ((13, 7, 3)))
    // totality: corrupt image payloads and non-image mimes fall back to
    // the deterministic stub instead of throwing
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.imageKernel(junk, "image/png") ===
      Multimodal.stubKernel(junk, "image/png"))
    assert(Multimodal.imageKernel(png, "audio/wav") ===
      Multimodal.stubKernel(png, "audio/wav"))
  }

  test("decodeAssets with the real image kernel keeps the DecodedAsset contract on a mixed frame") {
    import graft.pipeline.Multimodal
    import org.apache.spark.sql.functions.{col, length, lit, struct}
    val img = new java.awt.image.BufferedImage(
      31, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val textBytes = "an audio payload stand-in".getBytes("UTF-8")
    val df = spark.createDataFrame(Seq(
        (1L, png, "image/png", "synth"),
        (2L, textBytes, "audio/wav", "synth")))
      .toDF("asset_id", "payload", "mime", "origin")
      .select(col("asset_id"), col("payload"),
        struct(col("mime"), length(col("payload")).cast("long").as("n_bytes"),
          col("origin")).as("meta"))
    val out = Multimodal.decodeAssets(df, Multimodal.imageKernel)
      .collect().sortBy(_.asset_id)
    assert(out.length === 2)
    assert((out(0).width, out(0).height, out(0).channels) === ((31, 17, 3)))
    assert(out(0).mime === "image/png" && out(0).n_bytes === png.length.toLong)
    val (sw, sh, sc) = Multimodal.stubKernel(textBytes, "audio/wav")
    assert((out(1).width, out(1).height, out(1).channels) === ((sw, sh, sc)))
  }

  test("audioKernel decodes a real WAV fixture; non-audio payloads yield zeroed dims") {
    import graft.pipeline.Multimodal
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    // a real 1 kHz-ish PCM WAV: 800 frames of 16-bit mono at 8 kHz,
    // written by the JDK's own encoder
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](800 * 2)
    (0 until 800).foreach { i =>
      val v = (math.sin(i * 0.5) * 1000).toInt
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 800),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(Multimodal.audioKernel(wav, "audio/wav") === Some((8000, 800L, 1)))
    assert(Multimodal.audioKernel(wav, "video/mp4") === None)
    assert(Multimodal.audioKernel("junk".getBytes, "audio/wav") === None)
    // the Dataset arm keeps undecodable rows with zeroed dims
    import org.apache.spark.sql.functions.{col, length, struct}
    val df = spark.createDataFrame(Seq(
        (1L, wav, "audio/wav", "synth"),
        (2L, "text payload".getBytes("UTF-8"), "audio/wav", "synth")))
      .toDF("asset_id", "payload", "mime", "origin")
      .select(col("asset_id"), col("payload"),
        struct(col("mime"), length(col("payload")).cast("long").as("n_bytes"),
          col("origin")).as("meta"))
    val out = Multimodal.decodeAudioAssets(df).collect().sortBy(_.asset_id)
    assert(out(0).sample_rate === 8000 && out(0).n_frames === 800L &&
      out(0).channels === 1)
    assert(out(1).sample_rate === 0 && out(1).n_frames === 0L &&
      out(1).channels === 0)
  }

  test("framesKernel decodes a real 3-frame GIF; adversarial bytes fall back, never throw") {
    import graft.pipeline.Multimodal
    // a real animated GIF written by the JDK's own sequence writer
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { k =>
      val img = new java.awt.image.BufferedImage(
        8, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(k, 1, 0x40C080 + k * 0x202020) // a different pixel per frame
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = baos.toByteArray
    val decoded = Multimodal.framesKernel(gif, "image/gif")
    assert(decoded.isDefined)
    val (n, hashes) = decoded.get
    assert(n === 3 && hashes.length === 3)
    assert(hashes.distinct.length === 3, "distinct frames must digest distinctly")
    assert(Multimodal.framesKernel(gif, "image/gif") === decoded, "must be deterministic")
    // out-of-scope mimes and adversarial bytes: None, never a throw
    assert(Multimodal.framesKernel(gif, "image/png") === None)
    assert(Multimodal.framesKernel("junk".getBytes("UTF-8"), "video/mp4") === None)
    assert(Multimodal.framesKernel(gif.take(20), "image/gif").isEmpty ||
      Multimodal.framesKernel(gif.take(20), "image/gif").get._1 >= 0)
    // imageKernel on truncated image bytes (RuntimeException territory for
    // imageio readers) must ride the stub, not kill the task
    assert(Multimodal.imageKernel(gif.take(20), "image/gif") ===
      Multimodal.stubKernel(gif.take(20), "image/gif"))
  }

  test("decodeFrameAssets: stub fallback is bit-equal to the declared stub pipeline; real GIF rows decode") {
    import graft.pipeline.Multimodal
    // fallback path over the corpus's video-mime assets ≡ frameSampleRaw
    val videoAssets = graft.pipeline.Multimodal.assets(spark, sfDir)
      .filter(col("meta.mime") === "video/mp4")
    val api = Multimodal.decodeFrameAssets(videoAssets)
      .toDF().select(col("asset_id"), col("n_frames"), col("frame_hashes"))
    val sqlArm = Multimodal.frameSampleRaw(spark, sfDir)
      .select(col("asset_id"), col("n_frames"), col("frame_hashes"))
    assert(api.count() > 0)
    assert(api.exceptAll(sqlArm).count() === 0 &&
      sqlArm.exceptAll(api).count() === 0)
    // a real GIF row through the same Dataset arm decodes for real
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 2).foreach { k =>
      val img = new java.awt.image.BufferedImage(
        6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(k, k, 0xFFFFFF)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = baos.toByteArray
    val df = spark.createDataFrame(Seq((7L, gif, "image/gif", "synth")))
      .toDF("asset_id", "payload", "mime", "origin")
      .select(col("asset_id"), col("payload"),
        struct(col("mime"), length(col("payload")).cast("long").as("n_bytes"),
          col("origin")).as("meta"))
    val out = Multimodal.decodeFrameAssets(df).collect()
    assert(out.length === 1 && out(0).n_frames === 2 &&
      out(0).frame_hashes.length === 2)
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
