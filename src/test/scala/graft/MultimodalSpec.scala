package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing edge cases (the oracle covers the happy path). */
class MultimodalSpec extends SparkSpec {

  test("frame sampling survives empty payloads (no negative-bound sequence)") {
    import spark.implicits._
    val d = Seq((1L, "some text payload that spans frames"), (2L, ""))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("n_frames", expr("CAST((length(payload) + 15) DIV 16 AS INT)"))
      .withColumn("sampled", Multimodal.sampledFrames)
      .select(col("doc_id"), col("n_frames"), size(col("sampled")).as("n_sampled"))
      .orderBy("doc_id").collect()
    assert(d(0).getAs[Int]("n_sampled") >= 1)
    assert(d(1).getAs[Int]("n_frames") === 0)
    assert(d(1).getAs[Int]("n_sampled") === 0)
  }

  test("q_multimodal_audio_meta: real RIFF layout, and the SQL parse matches a JVM byte-level reference (r8)") {
    import graft.operators.Multimodal
    val blobs = spark.read.parquet(Multimodal.stageAudioBlobs(spark, sf))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("wav")).toMap
    def le32(b: Array[Byte], off: Int): Long =
      (3 to 0 by -1).foldLeft(0L)((a, i) => (a << 8) | (b(off + i) & 0xffL))
    def le16(b: Array[Byte], off: Int): Long =
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)
    for ((id, wav) <- blobs) {
      assert(new String(wav.take(4), "US-ASCII") === "RIFF", s"doc $id RIFF magic")
      assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE", s"doc $id WAVE tag")
      assert(new String(wav.slice(12, 16), "US-ASCII") === "fmt ", s"doc $id fmt chunk")
      assert(new String(wav.slice(36, 40), "US-ASCII") === "data", s"doc $id data chunk")
      assert(le32(wav, 4) === wav.length - 8L, s"doc $id RIFF size field")
      assert(le16(wav, 20) === 1L, s"doc $id PCM format tag")
    }
    val out = SparkEntry.queries("q_multimodal_audio_meta")(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val wav = blobs(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("fmt") === "wav")
      assert(r.getAs[Long]("channels") === le16(wav, 22))
      assert(r.getAs[Long]("sample_rate") === le32(wav, 24))
      assert(r.getAs[Long]("byte_rate") === le32(wav, 28))
      assert(r.getAs[Long]("block_align") === le16(wav, 32))
      assert(r.getAs[Long]("bits") === le16(wav, 34))
      assert(r.getAs[Boolean]("consistent"), s"doc ${r.getAs[Long]("doc_id")} header inconsistent")
      assert(r.getAs[Long]("duration_us") ===
        le32(wav, 40) * 1000000L / le32(wav, 28))
      assert(r.getAs[Long]("n_bytes") === wav.length.toLong)
    }
  }

  test("q_multimodal_image_meta: real magic bytes, and the SQL parse matches a JVM byte-level reference") {
    import graft.operators.Multimodal
    val blobs = spark.read.parquet(Multimodal.stageImageBlobs(spark, sf))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("img")).toMap
    // an independent third implementation of both headers
    def be32(b: Array[Byte], off: Int): Long =
      (0 until 4).foldLeft(0L)((a, i) => (a << 8) | (b(off + i) & 0xffL))
    def le32(b: Array[Byte], off: Int): Long =
      (3 to 0 by -1).foldLeft(0L)((a, i) => (a << 8) | (b(off + i) & 0xffL))
    def le16(b: Array[Byte], off: Int): Long =
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)
    val pngSig = Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    for ((id, img) <- blobs) {
      if (id % 2 == 0) {
        assert(img.take(8).map(_ & 0xff).toSeq === pngSig, s"doc $id PNG signature")
        assert(new String(img.slice(12, 16), "US-ASCII") === "IHDR", s"doc $id IHDR tag")
      } else {
        assert(img(0) === 'B'.toByte && img(1) === 'M'.toByte, s"doc $id BM magic")
        assert(le32(img, 2) === img.length.toLong, s"doc $id BMP size field")
      }
    }
    val out = SparkEntry.queries("q_multimodal_image_meta")(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val img = blobs(r.getLong(0))
      val (w, h, dep) =
        if (r.getString(1) == "png") (be32(img, 16), be32(img, 20), (img(24) & 0xff).toLong)
        else (le32(img, 18), le32(img, 22), le16(img, 28))
      assert(r.getString(1) === (if (r.getLong(0) % 2 == 0) "png" else "bmp"))
      assert(r.getLong(2) === w, s"width of doc ${r.getLong(0)}")
      assert(r.getLong(3) === h, s"height of doc ${r.getLong(0)}")
      assert(r.getLong(4) === dep, s"depth of doc ${r.getLong(0)}")
      assert(r.getLong(5) === img.length.toLong)
    }
  }
}
