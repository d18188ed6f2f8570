package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers — SURVEY.md §2 determinism rules / §7.4.
  *
  * The driver hash-compares our parquet output against a DuckDB oracle
  * (BASELINE.json:2), so every oracle-checked query must be bit-stable
  * across engines AND across partition orders:
  *
  *  - Money/quantity aggregates are computed exactly in DECIMAL(18,4)
  *    (double SUM is partition-order-dependent in Spark) and then cast
  *    to DOUBLE for a stable output schema. The decimal value is exact;
  *    Spark's decimal→double cast is correctly rounded, but DuckDB's
  *    CAST(DECIMAL AS DOUBLE) goes through int128 scaling and can be
  *    1 ulp off once the sum exceeds ~2^53/10^4 (seen at sf0.1) — so
  *    every oracle decimal→double cast MUST take the VARCHAR hop:
  *    CAST(CAST(dec AS VARCHAR) AS DOUBLE) (strtod is correctly
  *    rounded; a no-op on values the direct cast already got right).
  *  - Derived stats (avg/stddev/corr) are computed from exact decimal
  *    sums with the SAME double-arithmetic formula on both sides.
  *  - Every query ends with a total order over all output columns in
  *    name-sorted order (the driver sorts columns by name, then hashes
  *    values in row order).
  */
object Det {
  val Money: DecimalType = DecimalType(18, 4)

  /** Cast a double column to exact 4-dp decimal before aggregation. */
  def money(c: Column): Column = c.cast(Money)

  /** Exact decimal sum, emitted as double. */
  def dsum(c: Column): Column = sum(money(c)).cast("double")

  /** Exact decimal-sum-based average, emitted as double.
    * Mirror in oracle SQL as CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
    * DOUBLE) / COUNT(*): double/long division is IEEE-identical. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Total order over all output columns, name-sorted, nulls first
    * (mirror with explicit NULLS FIRST in the oracle's ORDER BY). */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.sorted.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)

  /** ORDER BY clause matching [[ordered]] for DuckDB oracle SQL. */
  def orderByAll(cols: String*): String =
    cols.sorted.map(c => s"$c ASC NULLS FIRST").mkString(" ORDER BY ", ", ", "")

  /** ONE-JOB multiset equality — the witness primitive behind every
    * `equals_full_recompute`-style exactness flag (r19, optimization
    * guide §1.2/§2.4: fewer passes).
    *
    * Semantically identical to the two-sided
    * `a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0`
    * check it replaces: Spark rewrites EACH exceptAll into exactly
    * this ±1 union-aggregate (RewriteExceptAll) plus a replicate-rows
    * Generate, so the old pattern evaluated BOTH input subtrees twice
    * across two separate jobs. Here the union-aggregate runs once —
    * any group with a non-zero signed residue disproves equality —
    * and `isEmpty` short-circuits at the first offending row.
    * NULL / NaN / -0.0 grouping semantics match the set-op rewrite
    * (aggregate-key equality). Columns are matched BY NAME (`b` is
    * re-projected to `a`'s column order); positional `union` then
    * applies the same widening coercion EXCEPT ALL would. */
  def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toIndexedSeq
    a.select(cols.map(col): _*).withColumn("_ms_sgn", lit(1L))
      .union(b.select(cols.map(col): _*).withColumn("_ms_sgn", lit(-1L)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("_ms_sgn")).as("_ms_d"))
      .filter(col("_ms_d") =!= 0L)
      .isEmpty
  }
}
