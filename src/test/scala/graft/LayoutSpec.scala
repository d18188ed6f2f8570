package graft

import org.apache.spark.sql.functions._

/** Layout-key math proven over the FULL domain, not fixture samples:
  * the Hilbert walk's two defining laws on the complete 256×256 grid. */
class LayoutSpec extends SparkSpec {

  test("hilbert index is a bijection on the 256x256 grid with the adjacency law (r8)") {
    import spark.implicits._
    val grid = spark.range(65536).select(
      (col("id") % 256).as("hx"), (col("id") / 256).cast("long").as("hy"),
      lit(0L).as("hd"))
    val d = graft.operators.Scans.hilbertIndex(grid)
      .select(col("hd"), col("hx").as("fx"), col("hy").as("fy"))
      .collect()
    // bijection: every cell gets a distinct d covering [0, 65536)
    val ds = d.map(_.getLong(0))
    assert(ds.length === 65536)
    assert(ds.min === 0L && ds.max === 65535L && ds.distinct.length === 65536,
      "hilbert walk is not a bijection")
    // adjacency: consecutive d land on grid-adjacent cells — the
    // locality law that distinguishes Hilbert from Z (which jumps).
    // Recover each d's ORIGINAL cell and walk the curve in order.
    val byD = new Array[(Long, Long)](65536)
    val grid2 = spark.range(65536).select(
      (col("id") % 256).as("x0"), (col("id") / 256).cast("long").as("y0"))
      .withColumn("hx", col("x0")).withColumn("hy", col("y0"))
      .withColumn("hd", lit(0L))
    graft.operators.Scans.hilbertIndex(grid2)
      .select(col("hd"), col("x0"), col("y0")).collect()
      .foreach(r => byD(r.getLong(0).toInt) = (r.getLong(1), r.getLong(2)))
    for (i <- 1 until 65536) {
      val (ax, ay) = byD(i - 1); val (bx, by) = byD(i)
      assert(math.abs(ax - bx) + math.abs(ay - by) === 1,
        s"curve jumps at d=$i: ($ax,$ay) -> ($bx,$by)")
    }
  }
}
