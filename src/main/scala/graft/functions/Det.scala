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
}
