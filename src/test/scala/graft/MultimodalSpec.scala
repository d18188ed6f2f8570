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
}
