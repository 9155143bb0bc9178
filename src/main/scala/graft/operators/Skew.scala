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

  /** Hybrid form of [[saltedCollectSet]]: only keys whose row count exceeds
    * `hotThreshold` are salted; the long tail of rare keys takes salt 0, so
    * phase 1 produces ONE group per cold key and phase 2 merges a single
    * already-sorted-sized partial — near the single-phase plan's cost —
    * while hot keys still get the 1/`salts` per-task state bound.
    *
    * Detection is a per-key count — the wordcount plan: fixed-size state,
    * map-side partial aggregation, a few longs per distinct key on the
    * wire. The hot set is bounded by construction (≤ totalRows /
    * hotThreshold keys can exceed the threshold), so the broadcast is safe
    * at any corpus size. Which keys get flagged only routes rows between
    * two value-identical physical paths — the RESULT is threshold- and
    * detection-independent, so an approximate (sampled) count is a valid
    * drop-in at larger scales.
    *
    * Result is value-identical to `sort_array(collect_set(value))`.
    */
  def saltedCollectSetHybrid(df: DataFrame, key: Column, value: Column,
      salts: Int = 16, hotThreshold: Long = 100000): DataFrame = {
    val kv = df.select(key.as("key"), value.as("value"))
    val hot = kv.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > hotThreshold).select(col("key"))
    // Null-safe routing key: a plain equi-join can never match a NULL key,
    // so a hot all-null group would silently take salt 0 and recreate the
    // single-task state pile-up this operator exists to bound.
    val hotFlag = broadcast(hot.withColumnRenamed("key", "hot_key")
      .withColumn("is_hot", lit(true)))
    kv.join(hotFlag, col("key") <=> col("hot_key"), "left")
      .drop("hot_key")
      .withColumn("salt", when(col("is_hot"),
        pmod(hash(col("value")), lit(salts))).otherwise(lit(0)))
      .groupBy(col("key"), col("salt"))
      .agg(collect_set(col("value")).as("partial"))
      .groupBy(col("key"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("partial"))))).as("values"))
  }

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
