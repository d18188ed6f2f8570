package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.functions.VectorExprs
import graft.sources.Tables

/** B10 (multimodal half) — multimodal columns (SURVEY.md §2 B10):
  * binary payload columns with typed metadata, a batch-shaped decode /
  * feature-extract stage, and the text⋈vector multimodal join.
  *
  * The decode stage models the image/audio path: media arrives as an
  * opaque BINARY column; decode/feature-extract runs as a typed
  * `mapPartitions` over `Dataset[MediaPayload]` (per-partition setup —
  * here a MessageDigest, in production the codec context — amortized
  * across the batch, executor-side, no driver involvement). The codec
  * call itself is a clearly-marked deterministic STUB (no image libs in
  * this environment); the Spark-side plumbing — schema, encoders,
  * partitioning, batch shape — is real and oracle-checked, because the
  * stub's outputs are pure functions of the payload bytes.
  *
  * 100 TB posture: decode is embarrassingly parallel (narrow map, no
  * shuffle); the multimodal join shuffles on the equi-key once and
  * aggregates with map-side partials. Binary payloads stay columnar in
  * parquet and are never collected.
  */
object Multimodal {

  /** Opaque media payload + typed metadata (the multimodal column). */
  case class MediaPayload(doc_id: Long, lang: String, payload: Array[Byte])

  /** Decoded media features. */
  case class MediaFeatures(doc_id: Long, lang: String, width: Long,
      height: Long, n_bytes: Long, checksum: String)

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * pure function of the payload bytes so the pipeline around it is
    * oracle-checkable; swap body for a real codec (e.g. JNI image lib)
    * without touching the Spark plumbing. */
  private def decodeStub(p: MediaPayload, md: java.security.MessageDigest): MediaFeatures = {
    val n = p.payload.length.toLong
    val sum = md.digest(p.payload).map(b => f"$b%02x").mkString
    MediaFeatures(p.doc_id, p.lang,
      width = 32L + n % 32L, height = 32L + (n * 7L) % 32L,
      n_bytes = n, checksum = sum)
  }

  /** Batch decode over the binary column: typed mapPartitions with
    * per-partition codec setup. */
  def decodeFeatures(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(p => decodeStub(p, md))
    }.toDF()
  }

  /** Every-4th 16-byte frame of `payload` (expects `n_frames` already
    * derived). Guarded for empty payloads: `sequence(0, -1, 4)` throws
    * in Spark (negative bound, positive step), so n_frames = 0 yields
    * an empty sample array instead of killing the job. */
  private[graft] def sampledFrames: org.apache.spark.sql.Column = expr(
    "CASE WHEN n_frames > 0 THEN " +
      "transform(sequence(0, n_frames - 1, 4), i -> CAST(substring(payload, i * 16 + 1, 16) AS STRING)) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END")

  /** Deterministic image blobs staged from the documents fixture: even
    * doc_ids become minimal-but-well-formed PNGs (8-byte signature +
    * IHDR chunk, big-endian dims), odd doc_ids become BMPs (BM header
    * + BITMAPINFOHEADER, little-endian dims), each with a 16-byte
    * md5-derived payload. Dimensions/depths are pure functions of
    * doc_id, so the parse twin is oracle-checkable without DuckDB ever
    * touching blob internals. Built entirely in SQL (hex-string concat
    * → unhex) — staging is itself a narrow codegen map. */
  private[graft] def stageImageBlobs(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "documents_img", "documents") { staged =>
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      def le4(c: org.apache.spark.sql.Column) = {
        val be = be4(c)
        concat(substring(be, 7, 2), substring(be, 5, 2),
          substring(be, 3, 2), substring(be, 1, 2))
      }
      def le2(c: org.apache.spark.sql.Column) = {
        val be = lpad(hex(c), 4, "0")
        concat(substring(be, 3, 2), substring(be, 1, 2))
      }
      val d = Tables(s, sfDir, "documents")
        .withColumn("w", (lit(16) + col("doc_id") * 37 % 1009).cast("long"))
        .withColumn("h", (lit(16) + col("doc_id") * 101 % 737).cast("long"))
        .withColumn("png_depth",
          when((col("doc_id") / 2).cast("long") % 2 === 0, 8L).otherwise(16L))
        .withColumn("bmp_bpp",
          when((col("doc_id") / 2).cast("long") % 2 === 0, 8L).otherwise(24L))
        .withColumn("filler", upper(md5(col("doc_id").cast("string"))))
      // PNG: sig(8) len=13(4) 'IHDR'(4) w(4) h(4) depth(1) color=6(1)
      // comp(1) filter(1) interlace(1) crc(4, unchecked) payload(16) = 49 B
      val pngHex = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        be4(col("w")), be4(col("h")), lpad(hex(col("png_depth")), 2, "0"),
        lit("06" + "00" + "00" + "00" + "DEADBEEF"), col("filler"))
      // BMP: 'BM'(2) size=70 LE(4) reserved(4) offset=54 LE(4) then
      // BITMAPINFOHEADER: hdrsize=40 LE(4) w LE(4) h LE(4) planes=1(2)
      // bpp LE(2) + 24 zero bytes, payload(16) = 70 B
      val bmpHex = concat(lit("424D"), le4(lit(70L)), lit("00000000"),
        le4(lit(54L)), le4(lit(40L)), le4(col("w")), le4(col("h")),
        lit("0100"), le2(col("bmp_bpp")), lit("00" * 24), col("filler"))
      d.select(col("doc_id"),
          unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(bmpHex)).as("img"))
        .repartition(4).write.mode("overwrite").parquet(staged)
    }

  /** Stage canonical 44-byte-header WAV blobs (PCM), one per doc, all
    * fields derived from doc_id formulas (the audio twin of
    * [[stageImageBlobs]]): RIFF/WAVE/fmt/data chunks little-endian,
    * 16-byte md5 payload, 60 bytes total. Every derived field
    * (blockAlign, byteRate) is written CONSISTENTLY so the parser's
    * consistency check is meaningful. */
  private[graft] def stageAudioBlobs(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "documents_wav", "documents") { staged =>
      def le4(c: org.apache.spark.sql.Column) = {
        val be = lpad(hex(c), 8, "0")
        concat(substring(be, 7, 2), substring(be, 5, 2),
          substring(be, 3, 2), substring(be, 1, 2))
      }
      def le2(c: org.apache.spark.sql.Column) = {
        val be = lpad(hex(c), 4, "0")
        concat(substring(be, 3, 2), substring(be, 1, 2))
      }
      val d = Tables(s, sfDir, "documents")
        .withColumn("ch", (lit(1L) + col("doc_id") % 2).cast("long"))
        .withColumn("rate", (lit(8000L) + col("doc_id") * 441 % 36000).cast("long"))
        .withColumn("bits",
          (lit(8L) * (lit(1L) + (col("doc_id") / 2).cast("long") % 2)).cast("long"))
        .withColumn("block", (col("ch") * expr("bits DIV 8")).cast("long"))
        .withColumn("brate", (col("rate") * col("block")).cast("long"))
        .withColumn("filler", upper(md5(col("doc_id").cast("string"))))
      // RIFF(4) size=52 LE(4) WAVE(4) | fmt (4) sub1=16 LE(4) tag=1
      // LE(2) ch LE(2) rate LE(4) byteRate LE(4) block LE(2) bits
      // LE(2) | data(4) size=16 LE(4) payload(16) = 60 B
      val wavHex = concat(lit("52494646"), le4(lit(52L)), lit("57415645"),
        lit("666D7420"), le4(lit(16L)), le2(lit(1L)), le2(col("ch")),
        le4(col("rate")), le4(col("brate")), le2(col("block")),
        le2(col("bits")), lit("64617461"), le4(lit(16L)), col("filler"))
      d.select(col("doc_id"), unhex(wavHex).as("wav"))
        .repartition(4).write.mode("overwrite").parquet(staged)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_audio_meta" -> { (s, dir) =>
      // Audio twin of q_multimodal_image_meta (r8): WAV/RIFF header
      // parsed by pure byte arithmetic off the staged binary column —
      // channels, sample rate, bit depth, block align, byte rate, and
      // a derived duration, all little-endian fixed-offset hex-slice +
      // radix conversions in narrow codegen (scan speed; no audio
      // library, no UDF). The parser also VALIDATES internal header
      // consistency (blockAlign = channels·bits/8, byteRate =
      // rate·blockAlign) — the real-world corrupt-header gate. The
      // oracle recomputes expected metadata from the staging formulas:
      // any endianness/offset disagreement between builder and parser
      // breaks the hash.
      val b = s.read.parquet(stageAudioBlobs(s, dir))
      val hx = hex(col("wav"))
      def le4Long(start: Int) =
        conv(concat(substring(hx, start + 6, 2), substring(hx, start + 4, 2),
          substring(hx, start + 2, 2), substring(hx, start, 2)), 16, 10).cast("long")
      def le2Long(start: Int) =
        conv(concat(substring(hx, start + 2, 2), substring(hx, start, 2)), 16, 10)
          .cast("long")
      val isWav = substring(hx, 1, 8) === "52494646" &&
        substring(hx, 17, 8) === "57415645"
      val parsed = b.select(col("doc_id"),
        when(isWav, "wav").otherwise("unknown").as("fmt"),
        le2Long(45).as("channels"), le4Long(49).as("sample_rate"),
        le4Long(57).as("byte_rate"), le2Long(65).as("block_align"),
        le2Long(69).as("bits"), le4Long(81).as("data_bytes"),
        length(col("wav")).cast("long").as("n_bytes"))
      ordered(parsed.select(col("doc_id"), col("fmt"), col("channels"),
        col("sample_rate"), col("bits"), col("block_align"), col("byte_rate"),
        // integral DIV, not `/`: column `/` is double division, and
        // floor(IEEE quotient) can disagree with true integer division
        // at near-integer quotients
        expr("data_bytes * 1000000 DIV byte_rate").cast("long").as("duration_us"),
        (col("block_align") === col("channels") * expr("bits DIV 8") &&
          col("byte_rate") === col("sample_rate") * col("block_align"))
          .as("consistent"),
        col("n_bytes")))
    },
    "q_multimodal_dedup" -> { (s, dir) =>
      // Exact binary dedup (added r9) — the standard FIRST multimodal
      // curation step: identical media removed by content hash before
      // any decode (the same image arrives under many URLs/mirrors).
      // The crawl here is the staged image blobs plus a deterministic
      // MIRROR of the same payloads under shifted doc_ids, so every
      // payload occurs exactly twice and the original id must survive
      // — structure the oracle checks without touching blob bytes.
      // Group key = md5 of the blob hex, computed executor-side at
      // scan speed; if the binary grouping ever mis-keyed (collision
      // handling, byte-order, null padding), copy counts would break.
      // 100 TB posture: the exact-dedup shape — ONE hash agg keyed on
      // a 16-byte digest, map-side partials, nothing pairwise; blobs
      // never leave the executors (the digest does).
      val imgs = s.read.parquet(stageImageBlobs(s, dir))
        .select(col("doc_id"), col("img"))
      val crawl = imgs.union(
        imgs.select((col("doc_id") + lit(100000L)).as("doc_id"), col("img")))
      ordered(crawl.groupBy(md5(hex(col("img"))).as("ck"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies")))
    },
    "q_multimodal_image_meta" -> { (s, dir) =>
      // REAL codec for the multimodal path (r7): pure byte-arithmetic
      // image-header parse — PNG IHDR (big-endian) and BMP
      // BITMAPINFOHEADER (little-endian) dimensions/depth read
      // straight off the staged binary column. No image library, no
      // UDF: the blob is hex-encoded once (codegen) and fields are
      // fixed-offset hex-slice + radix conversions — all narrow
      // codegen ops, so at 100 TB this runs at scan speed like any
      // other projection. The oracle recomputes the expected metadata
      // from the doc_id formulas the staging used — a single flipped
      // byte order or off-by-one offset in EITHER the builder or the
      // parser breaks the hash match.
      val b = s.read.parquet(stageImageBlobs(s, dir))
      val hx = hex(col("img"))
      val isPng = substring(hx, 1, 16) === "89504E470D0A1A0A"
      def beLong(start: Int, len: Int) =
        conv(substring(hx, start, len), 16, 10).cast("long")
      def le4Long(start: Int) =
        conv(concat(substring(hx, start + 6, 2), substring(hx, start + 4, 2),
          substring(hx, start + 2, 2), substring(hx, start, 2)), 16, 10).cast("long")
      def le2Long(start: Int) =
        conv(concat(substring(hx, start + 2, 2), substring(hx, start, 2)), 16, 10)
          .cast("long")
      ordered(b.select(col("doc_id"),
        when(isPng, "png").when(substring(hx, 1, 4) === "424D", "bmp")
          .otherwise("unknown").as("fmt"),
        when(isPng, beLong(33, 8)).otherwise(le4Long(37)).as("width"),
        when(isPng, beLong(41, 8)).otherwise(le4Long(45)).as("height"),
        when(isPng, beLong(49, 2)).otherwise(le2Long(57)).as("depth"),
        length(col("img")).cast("long").as("n_bytes")))
    },
    "q_multimodal_features" -> { (s, dir) =>
      // text bytes stand in for the media blob (same plumbing)
      val payloads = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          encode(col("text"), "UTF-8").as("payload"))
      ordered(decodeFeatures(payloads))
    },
    "q_multimodal_frames" -> { (s, dir) =>
      // Frame sampling over the binary payload: fixed 16-byte frames,
      // every 4th frame sampled (stepped sequence — no index lambdas),
      // rolled into a sample digest. The video/audio analog: bounded
      // per-row work, narrow map, frames never leave the executor.
      // Oracle-exact because the payload is the doc's UTF-8 bytes
      // (frames decode losslessly for this ASCII corpus; a real codec
      // would replace the decode, not the plumbing).
      val d = Tables(s, dir, "documents")
      val r = d
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("n_frames", expr("CAST((length(payload) + 15) DIV 16 AS INT)"))
        .withColumn("sampled", sampledFrames)
      ordered(r.select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        size(col("sampled")).as("n_sampled"),
        md5(concat_ws("", col("sampled"))).as("sample_hash")))
    },
    "q_multimodal_join" -> { (s, dir) =>
      // text ⋈ vector modality on doc_id = vec_id; per-lang vector stats
      VectorExprs.register(s)
      val d = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val q = e.filter(col("vec_id") === lit(0L)).select(col("v").as("qv"))
      val joined = d.join(e, col("doc_id") === col("vec_id"))
        .crossJoin(broadcast(q))
        .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
        .withColumn("c", Similarity.cosine(col("v"), col("qv")))
      ordered(joined.groupBy(col("lang")).agg(
        count(lit(1)).as("n_vecs"),
        davg(col("nrm")).as("avg_norm"),
        davg(col("c")).as("avg_cos"),
        round(max(col("c")), 4).as("max_cos"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars")))
    }
  )

  private val cosJq =
    "list_sum(list_transform(range(1,65), i -> CAST(j.embedding[i] AS DOUBLE) * q.embedding[i])) / " +
      "(sqrt(list_sum(list_transform(range(1,65), i -> CAST(j.embedding[i] AS DOUBLE) * j.embedding[i]))) * " +
      "sqrt(list_sum(list_transform(range(1,65), i -> CAST(q.embedding[i] AS DOUBLE) * q.embedding[i]))))"

  def oracle: Map[String, String] = Map(
    "q_multimodal_audio_meta" ->
      // expected metadata from the staging formulas (the Spark side
      // must reproduce these by PARSING its own staged WAV headers)
      ("""WITH f AS (
        |  SELECT doc_id,
        |    1 + doc_id % 2 AS ch,
        |    8000 + (doc_id * 441) % 36000 AS rate,
        |    8 * (1 + (doc_id // 2) % 2) AS bits
        |  FROM documents)
        |SELECT doc_id, 'wav' AS fmt,
        |  CAST(ch AS BIGINT) AS channels,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(bits AS BIGINT) AS bits,
        |  CAST(ch * (bits // 8) AS BIGINT) AS block_align,
        |  CAST(rate * ch * (bits // 8) AS BIGINT) AS byte_rate,
        |  CAST(16 * 1000000 // (rate * ch * (bits // 8)) AS BIGINT) AS duration_us,
        |  TRUE AS consistent,
        |  CAST(60 AS BIGINT) AS n_bytes
        |FROM f""".stripMargin +
        orderByAll("doc_id", "fmt", "channels", "sample_rate", "bits",
          "block_align", "byte_rate", "duration_us", "consistent", "n_bytes")),
    "q_multimodal_dedup" ->
      // the planted mirror structure: every payload exactly twice,
      // the original (lower) id survives — blob identity itself is
      // exercised on the Spark side, where the bytes live
      ("""SELECT doc_id AS keep_id, CAST(2 AS BIGINT) AS n_copies
        |FROM documents""".stripMargin +
        orderByAll("keep_id", "n_copies")),
    "q_multimodal_image_meta" ->
      // the expected metadata from the staging formulas — the Spark
      // side must reproduce these by PARSING the blobs it built, so
      // builder and parser must agree byte-for-byte on both endiannesses
      ("""SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
        |  CAST(16 + (doc_id * 37) % 1009 AS BIGINT) AS width,
        |  CAST(16 + (doc_id * 101) % 737 AS BIGINT) AS height,
        |  CAST(CASE WHEN (doc_id // 2) % 2 = 0 THEN 8
        |       WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS BIGINT) AS depth,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 49 ELSE 70 END AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin +
        orderByAll("doc_id", "fmt", "width", "height", "depth", "n_bytes")),
    "q_multimodal_frames" ->
      ("""WITH r AS (
        |  SELECT doc_id,
        |    (octet_length(CAST(text AS BLOB)) + 15) // 16 AS n_frames,
        |    list_transform(range(0, (octet_length(CAST(text AS BLOB)) + 15) // 16, 4),
        |      i -> text[i * 16 + 1 : i * 16 + 16]) AS sampled
        |  FROM documents)
        |SELECT doc_id, n_frames, len(sampled) AS n_sampled,
        |  md5(list_aggregate(sampled, 'string_agg', '')) AS sample_hash
        |FROM r""".stripMargin +
        orderByAll("doc_id", "n_frames", "n_sampled", "sample_hash")),
    "q_multimodal_features" ->
      ("""SELECT doc_id, lang,
        |  32 + octet_length(CAST(text AS BLOB)) % 32 AS width,
        |  32 + (octet_length(CAST(text AS BLOB)) * 7) % 32 AS height,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin +
        orderByAll("doc_id", "lang", "width", "height", "n_bytes", "checksum")),
    "q_multimodal_join" ->
      (s"""WITH j AS (
        |  SELECT d.lang, d.n_chars, e.embedding,
        |    sqrt(list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE) * e.embedding[i]))) AS nrm
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |per AS (SELECT j.lang, j.n_chars, j.nrm, $cosJq AS c
        |        FROM (SELECT lang, n_chars, embedding, nrm FROM j) j, q)
        |SELECT lang, COUNT(*) AS n_vecs,
        |  CAST(CAST(SUM(CAST(nrm AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_norm,
        |  CAST(CAST(SUM(CAST(c AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_cos,
        |  ROUND(MAX(c), 4) AS max_cos,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM per GROUP BY lang""".stripMargin +
        orderByAll("lang", "n_vecs", "avg_norm", "avg_cos", "max_cos", "avg_chars"))
  )
}
