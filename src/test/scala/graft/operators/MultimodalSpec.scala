package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def items(n: Int) = {
    val sp = spark; import sp.implicits._
    (1 to n).map(i => Multimodal.MediaItem(i.toLong, "img", s"src${i % 3}",
      Array.tabulate(16 + i)(j => ((i * 31 + j) % 251).toByte))).toDS()
  }

  test("feature extraction is deterministic and partitioning-invariant") {
    val a = Multimodal.extractFeatures(items(20).repartition(1)).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(items(20).repartition(7)).collect().sortBy(_.media_id)
    assert(a.map(_.checksum).toSeq === b.map(_.checksum).toSeq)
    assert(a.map(_.features.toSeq).toSeq === b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length === Multimodal.StubCodec.Dim))
  }

  test("frame sampling covers the payload exactly once") {
    val frames = Multimodal.sampleFrames(items(5), 4).collect()
    assert(frames.length === 20)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq === Seq(0, 1, 2, 3))
      assert(fs.map(_.n_bytes).sum === 16 + id) // spans partition the payload
    }
  }

  test("m02 pipeline runs over testdata documents") {
    val df = Multimodal.m02_media_features(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq === Seq("kind", "source", "n_items", "total_bytes", "f0_sum", "min_checksum"))
    // the stub (text), BOTH real decoders (PNG even ids, BMP odd ids), and
    // the planted corrupt sample (every 67th id — ids 0/134/… PNG,
    // 67/201/… BMP) quarantined under ;undecoded
    assert(rows.map(_.getString(0)).toSet === Set("text", "image/png",
      "image/bmp", "image/png;undecoded", "image/bmp;undecoded"))
    // all surviving image payloads decoded: f0 = width = 16 per image
    rows.filter(r => r.getString(0).startsWith("image/") &&
        !r.getString(0).endsWith(";undecoded")).foreach { r =>
      assert(r.getAs[Long]("f0_sum") === 16L * r.getAs[Long]("n_items"))
    }
    // the corrupt sample is exactly the ids divisible by 67 (500 docs → 8)
    assert(rows.filter(_.getString(0).endsWith(";undecoded"))
      .map(_.getAs[Long]("n_items")).sum === 8L)
    // deterministic under re-run
    val again = Multimodal.m02_media_features(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("ImageCodec decodes real PNG and BMP with exact pixel-derived features") {
    // 4x3 solid red
    val red = Array.fill(12)(0xff0000)
    for (payload <- Seq(ImageCodec.encodePng(4, 3, red), ImageCodec.encodeBmp(4, 3, red))) {
      val img = ImageCodec.decode(payload)
      assert(img.isDefined)
      val f = ImageCodec.features(img.get)
      // [w, h, meanR, meanG, meanB, dark, mid, bright]; red luma = 2126*255/10000 = 54 → dark
      assert(f.toSeq === Seq(4L, 3L, 255L, 0L, 0L, 12L, 0L, 0L))
    }
    // gradient: half black, half white → dark/bright tercile split
    val bw = Array.tabulate(16)(i => if (i < 8) 0x000000 else 0xffffff)
    val f2 = ImageCodec.features(ImageCodec.decode(ImageCodec.encodePng(4, 4, bw)).get)
    assert(f2.toSeq === Seq(4L, 4L, 127L, 127L, 127L, 8L, 0L, 8L))
  }

  test("undecodable image payload falls back to the stub (total pipeline)") {
    val sp = spark; import sp.implicits._
    val broken = Seq(
      Multimodal.MediaItem(1L, "image/png", "s", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaItem(2L, "image/png", "s",
        ImageCodec.encodePng(2, 2, Array(0x102030, 0x405060, 0x708090, 0xa0b0c0)))).toDS()
    val out = Multimodal.extractFeatures(broken).collect().sortBy(_.media_id)
    assert(out(0).features.toSeq === Multimodal.StubCodec.decode(Array[Byte](1, 2, 3, 4)).toSeq)
    // container-based fallback values are quarantined under a tagged kind
    assert(out(0).kind === "image/png;undecoded")
    assert(out(1).features(0) === 2L && out(1).features(1) === 2L) // real decode
    assert(out(1).kind === "image/png")
  }

  test("image features are encoder-invariant: PNG and BMP of same pixels agree") {
    val rgb = Array.tabulate(64)(i => (i * 997) & 0xffffff)
    val fPng = ImageCodec.features(ImageCodec.decode(ImageCodec.encodePng(8, 8, rgb)).get)
    val fBmp = ImageCodec.features(ImageCodec.decode(ImageCodec.encodeBmp(8, 8, rgb)).get)
    assert(fPng.toSeq === fBmp.toSeq)
  }

  test("animated GIF round-trips every grayscale frame exactly") {
    val frames = (0 until 5).map(f => Array.tabulate(64)(i => (f * 37 + i * 3) % 256))
    val gif = ImageCodec.encodeGif(8, 8, frames)
    val decoded = ImageCodec.decodeFrames(gif)
    assert(decoded.isDefined && decoded.get.length === 5)
    decoded.get.zip(frames).foreach { case (img, want) =>
      val got = (0 until 64).map(i => img.getRGB(i % 8, i / 8) & 0xff)
      assert(got === want.toSeq)
    }
    // a still PNG is a 1-frame container through the same reader
    assert(ImageCodec.decodeFrames(ImageCodec.encodePng(2, 2,
      Array(1, 2, 3, 4))).get.length === 1)
  }

  test("frame sampling decodes real GIF frames with uniform temporal picks") {
    val sp = spark; import sp.implicits._
    // 7 frames, each a distinct solid gray — identity survives the sampler
    val gray = (f: Int) => Array.fill(16)(f * 30)
    val gif = ImageCodec.encodeGif(4, 4, (0 until 7).map(gray))
    val items = Seq(Multimodal.MediaItem(9L, "image/gif", "s", gif)).toDS()
    val out = Multimodal.sampleFrames(items, 4).collect().sortBy(_.frame_idx)
    // uniform rule i*total/n over 7 frames: indices 0,1,3,5
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1, 3, 5))
    assert(out.forall(_.n_bytes === 16)) // decoded pixel count, not container bytes
    val expect = out.map { fr =>
      val img = ImageCodec.decodeFrames(gif).get(fr.frame_idx)
      ImageCodec.pixelChecksum(img)
    }
    assert(out.map(_.checksum).toSeq === expect.toSeq)
    // short clip (2 frames < n=4): all frames kept, no padding rows
    val short = Seq(Multimodal.MediaItem(10L, "image/gif", "s",
      ImageCodec.encodeGif(4, 4, (0 until 2).map(gray)))).toDS()
    assert(Multimodal.sampleFrames(short, 4).collect()
      .map(_.frame_idx).sorted.toSeq === Seq(0, 1))
  }

  test("WAV round-trips PCM16 samples exactly through the JDK codec") {
    val samples = Array.tabulate(500)(i => ((i * 131 - 250 * 131) % 32768).toShort)
    val wav = AudioCodec.encodeWav(8000, samples)
    val clip = AudioCodec.decode(wav)
    assert(clip.isDefined)
    assert(clip.get.sampleRate === 8000 && clip.get.channels === 1)
    assert(clip.get.samples.toSeq === samples.toSeq)
  }

  test("AudioCodec features are exact on a hand-computed signal") {
    val clip = AudioCodec.AudioClip(8000, 1, Array[Short](0, 16384, -16384, 32767))
    // [rate, ch, frames, durMs, meanAbs, peak, zeroCross, meanSquare]
    assert(AudioCodec.features(clip).toSeq ===
      Seq(8000L, 1L, 4L, 0L, 16383L, 32767L, 2L, 402636800L))
  }

  test("undecodable audio payload falls back to the stub (total pipeline)") {
    val sp = spark; import sp.implicits._
    val garbage = Array[Byte](9, 8, 7, 6, 5)
    val real = AudioCodec.encodeWav(8000, Array[Short](100, -100, 100, -100))
    val ds = Seq(
      Multimodal.MediaItem(1L, "audio/wav", "s", garbage),
      Multimodal.MediaItem(2L, "audio/wav", "s", real)).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out(0).features.toSeq === Multimodal.StubCodec.decode(garbage).toSeq)
    assert(out(0).kind === "audio/wav;undecoded") // quarantined, never mixed
    assert(out(1).features.toSeq === Seq(8000L, 1L, 4L, 0L, 100L, 100L, 3L, 10000L))
    assert(out(1).kind === "audio/wav")
  }

  test("m04 pipeline: real WAV decode over testdata, exact frame accounting") {
    val df = Multimodal.m04_audio_features(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.columns.toSeq ===
      Seq("kind", "n_items", "total_bytes", "frames_sum", "zero_cross_sum", "peak_max"))
    assert(rows.map(_.getString(0)).toSet ===
      Set("text", "audio/wav", "audio/wav;undecoded"))
    val audio = rows.find(_.getString(0) == "audio/wav").get
    // every SURVIVING clip decoded: frames_sum must equal the synthesized
    // sample counts Σ(400 + (doc_id % 7) * 100) over the non-corrupted ids
    // (every 67th id is planted corrupt) — provable only via real decode
    val sp = spark
    val expected = graft.Tables.documents(sp, "/root/testdata/sf0.001")
      .where(org.apache.spark.sql.functions.expr("doc_id % 67 != 0"))
      .select(org.apache.spark.sql.functions.expr("sum(400 + (doc_id % 7) * 100)"))
      .head().getLong(0)
    assert(audio.getAs[Long]("frames_sum") === expected)
    assert(audio.getAs[Long]("peak_max") > 0 && audio.getAs[Long]("peak_max") <= 32767)
    val again = Multimodal.m04_audio_features(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("m03 pipeline: real GIF frames + stub byte-spans, partitioning-invariant") {
    val a = Multimodal.m03_frame_sample(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    assert(a.map(_.getInt(0)).toSeq === a.map(_.getInt(0)).toSeq.sorted)
    // GIF clips have 2-6 frames sampled to ≤4 source indices 0..5; stub
    // spans contribute only 0..3 — so indices beyond 3 prove real decode
    assert(a.map(_.getInt(0)).max > 3)
    val again = Multimodal.m03_frame_sample(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
