package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Typed Column API over the native expressions in [[VectorExprs]] —
  * the user-facing surface (no `call_function` strings, no Catalyst
  * imports). Call [[VectorFunctions.register]] (or
  * `VectorExprs.register`) once per session before evaluating. */
object VectorFunctions {

  def register(spark: SparkSession): Unit = VectorExprs.register(spark)

  /** Cosine similarity of two ARRAY<DOUBLE> columns (codegen). */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Euclidean distance of two ARRAY<DOUBLE> columns (codegen). */
  def euclideanDist(a: Column, b: Column): Column =
    call_function("euclidean_dist", a, b)

  /** k-hash MinHash signature of an ARRAY<STRING> set → ARRAY<BIGINT>. */
  def minhashSig(set: Column, numHashes: Int = 64): Column =
    call_function("minhash_sig", set, lit(numHashes))

  /** 64-bit SimHash fingerprint of an ARRAY<STRING> set → BIGINT. */
  def simhash(set: Column): Column =
    call_function("simhash64", set)

  /** Sign-random-projection LSH band keys of an ARRAY<DOUBLE> vector
    * → ARRAY<BIGINT> (one packed key per table). */
  def srpSig(vec: Column, tables: Int = 32, bits: Int = 6): Column =
    call_function("srp_sig", vec, lit(tables), lit(bits))

  /** Distinct word n-grams of an ARRAY<STRING> token column. */
  def wordShingles(tokens: Column, n: Int = 3): Column =
    call_function("word_shingles", tokens, lit(n))

  /** Prefix of a shingle set under the fixed global order, sized for
    * a Jaccard ≥ num/den similarity join (prefix filtering). */
  def prefixShingles(shingles: Column, num: Int = 4, den: Int = 5): Column =
    call_function("prefix_shingles", shingles, lit(num), lit(den))
}
