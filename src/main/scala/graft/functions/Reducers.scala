package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Reduce-UDF surface (SURVEY §2.10) — the Spark analog of the reference's
  * pluggable `reduce_func` contract (reference `scripts/reducer.py:100`,
  * dispatch `master.py:26-42`): a typed `Aggregator[IN, BUF, OUT]` turned
  * into a `UserDefinedFunction` via `functions.udaf`, usable from the
  * DataFrame API (`agg(f(col))`) and — once registered — from SQL.
  *
  * Unlike the reference's untyped dict-in/dict-out contract (which ran on a
  * single reducer VM over fully-materialized groups), an Aggregator is
  * distributive by construction: Catalyst plans it as partial buffers on
  * the map side merged at the exchange, exactly like a built-in aggregate —
  * a user-plugged reducer scales the same way `count` does.
  */
object Reducers {

  /** The reference's wordcount reducer (`scripts/wordcount_reduce.py:8-9`):
    * sum the group's emitted 1s. Spark's partial aggregation supersedes the
    * reference's ship-every-1 shuffle (SURVEY quirk Q5) automatically.
    */
  object SumValues extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(buf: Long, v: Long): Long = buf + v
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(buf: Long): Long = buf
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[SumValues]] as a DataFrame-usable aggregate function. */
  val sumValues: UserDefinedFunction = udaf(SumValues)

  /** Register a reduce UDF for SQL use (`SELECT name(col) ... GROUP BY`),
    * mirroring the reference's name→function registry.
    */
  def register(spark: SparkSession, name: String, f: UserDefinedFunction): Unit =
    spark.udf.register(name, f)
}
