package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks.
  *
  * AQE (on by default in `EngineSession`) already splits skewed JOIN
  * partitions at runtime; these helpers cover the case AQE can't fix:
  * an AGGREGATION whose per-key state is large (posting lists, distinct
  * sets) concentrating a hot key's entire input on one task.
  *
  * The salt key is derived from the VALUE (`hash(value) % salts`), not a
  * random number — same result on every run/partitioning, and duplicate
  * values land in the same salt bucket so phase 1 already deduplicates.
  */
object Skew {

  /** Two-phase `collect_set`: phase 1 collects per (key, salt) — bounding
    * any single task's state to ~1/salts of a hot key's values, deduped
    * within the bucket — phase 2 merges the ≤ `salts` partial sets per key.
    * Result is value-identical to `sort_array(collect_set(value))`.
    */
  def saltedCollectSet(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("value"))
      .withColumn("salt", pmod(hash(col("value")), lit(salts)))
      .groupBy(col("key"), col("salt"))
      .agg(collect_set(col("value")).as("partial"))
      .groupBy(col("key"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("partial"))))).as("values"))

  /** Two-phase exact distinct count per key, same bounding argument:
    * phase 1 counts distinct within (key, salt) — exact because equal
    * values share a salt — phase 2 sums the per-salt counts.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("value"))
      .withColumn("salt", pmod(hash(col("value")), lit(salts)))
      .groupBy(col("key"), col("salt"))
      .agg(count_distinct(col("value")).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n_distinct"))
}
