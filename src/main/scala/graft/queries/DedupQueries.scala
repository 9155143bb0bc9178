package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` / `embeddings` — the operators a
  * training-data pipeline needs at 100 TB, each designed around a LINEAR
  * candidate-generation step (group-by / bucket-join), never an unblocked
  * O(n²) self-join:
  *
  *  - exact:   hash-groupBy on md5(text)
  *  - minhash: md5-based k-min signatures → signature-group canonical
  *  - simhash: 32-bit hex-digit majority sketch → exact-group canonical +
  *             banded (4×8-bit) candidate pairs within Hamming ≤ 3
  *  - n-gram Jaccard: 3-token shingle bucket-join candidates → exact Jaccard
  *  - embedding: cosine nearest neighbor inside a coarse partition (label =
  *             a given IVF-style assignment), not across the full corpus
  *
  * All hashing is md5 (identical in Spark and DuckDB), so even the sketch
  * operators are oracle-checkable. At real scale the banded self-joins would
  * additionally cap bucket sizes (drop degenerate hot buckets); the shape of
  * the plan — explode → distinct → hash shuffle on bucket key — is the one
  * that survives 1000 executors.
  */
object DedupQueries {

  private val K = 8      // minhash signature length
  private val BITS = 32  // simhash width (one bit per md5 hex digit)

  /** 3-token shingles of a token-array column (empty when < 3 tokens). */
  private def shingles(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Distinct (doc_id, shingle) pairs. */
  private def shingleTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(shingles(tokens(col("text")))).as("sh"))
      .distinct()

  /** Distinct (doc_id, token) pairs. */
  private def tokenTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .distinct()

  /** Per-doc 32-bit simhash as a LONG (majority vote per md5 hex digit,
    * digit >= '8' = set bit, ties round up; bit j of the sketch is the
    * 2^(31-j) bit so `lpad(bin(sig), 32, '0')` reproduces the canonical
    * '1'/'0' string form bit-for-bit).
    *
    * Integer form matters at scale: hamming distance between two sketches
    * is one codegen'd `bit_count(a ^ b)` instead of 32 substring compares,
    * and band keys are shift/mask arithmetic instead of string slicing.
    */
  private def simhashTable(s: SparkSession, dir: String): DataFrame = {
    val sums = (0 until BITS).map(j =>
      sum(when(substring(md5(col("w")), j + 1, 1) >= "8", 1).otherwise(0)).as(s"s$j")) :+
      count(lit(1)).as("n")
    val sigInt = (0 until BITS).map(j =>
      when(col(s"s$j") * 2 >= col("n"), lit(1L << (31 - j))).otherwise(lit(0L))).reduce(_ + _)
    tokenTable(s, dir)
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sigInt.cast("long").as("sig"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup: canonical doc per identical text ----
    "dedup_exact" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
      val w = Window.partitionBy(col("text_hash"))
      d.select(col("doc_id"), col("text_hash"),
          min(col("doc_id")).over(w).as("canon_id"),
          count(lit(1)).over(w).as("n_copies"))
        .orderBy("doc_id")
    }),

    // ---- MinHash (k=8, md5-derived) signature-group dedup ----
    "dedup_minhash" -> ((s, dir) => {
      val mins = (0 until K).map(i =>
        min(md5(concat(lit(s"$i:"), col("w")))).as(s"h$i"))
      val sig = tokenTable(s, dir)
        .groupBy("doc_id")
        .agg(mins.head, mins.tail: _*)
        .select(col("doc_id"),
          md5(concat_ws("|", (0 until K).map(i => col(s"h$i")): _*)).as("sig"))
      val w = Window.partitionBy(col("sig"))
      sig.select(col("doc_id"), col("sig"),
          min(col("doc_id")).over(w).as("canon_id"),
          count(lit(1)).over(w).as("group_size"))
        .orderBy("doc_id")
    }),

    // ---- SimHash sketch: per-doc 32-bit signature + exact-group canon ----
    "dedup_simhash" -> ((s, dir) => {
      val w = Window.partitionBy(col("simhash"))
      simhashTable(s, dir)
        .select(col("doc_id"), lpad(bin(col("sig")), 32, "0").as("simhash"),
          min(col("doc_id")).over(w).as("canon_id"),
          count(lit(1)).over(w).as("group_size"))
        .orderBy("doc_id")
    }),

    // ---- SimHash near-dup pairs: 4×8-bit LSH bands, Hamming in [1,3] ----
    // (Hamming 0 groups are covered by dedup_simhash; banding guarantees
    // recall for Hamming ≤ 3 by pigeonhole.) ONE self-join on the exploded
    // (band_idx, band_value) key — both join children are the identical
    // subplan hash-partitioned the same way, so Spark plans a ReusedExchange
    // instead of recomputing the signature aggregation per band; the
    // Hamming ≤ 3 filter runs BEFORE the pair-dedup so the distinct only
    // shuffles survivors, not the full candidate explosion.
    "dedup_simhash_pairs" -> ((s, dir) => {
      val bands = simhashTable(s, dir)
        .select(col("doc_id"), col("sig"),
          posexplode(array((0 until 4).map(b =>
            shiftright(col("sig"), 8 * (3 - b)).bitwiseAND(lit(255L))): _*)))
        .toDF("doc_id", "sig", "band", "bval")
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
        .filter(col("hamming").between(1, 3))
        .dropDuplicates("d1", "d2")
        .orderBy("d1", "d2")
    }),

    // ---- n-gram Jaccard near-dup pairs (shingle-bucket candidates) ----
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val sh = shingleTable(s, dir)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      inter
        .join(sz.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sz.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .select(col("d1"), col("d2"),
          (col("inter") / (col("n1") + col("n2") - col("inter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.2)
        .orderBy("d1", "d2")
    }),

    // ---- embedding near-dup: cosine nearest neighbor within coarse cell ----
    "dedup_embedding" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      val sim = cosine(col("a.v"), col("b.v"))
      val pairs = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("a.label").as("label"),
          col("b.vec_id").as("nn_id"), sim.as("sim"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("nn_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("nn_id"))
        .orderBy("vec_id")
    })
  )

  // ===== DuckDB oracles (same md5-based hashing, same fold order) =====

  private def tokSqlRel =
    s"SELECT DISTINCT doc_id, unnest(${tokensSql("text")}) AS w FROM documents"

  private def shSqlRel =
    """SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |FROM (SELECT doc_id, """.stripMargin + tokensSql("text") + " AS t FROM documents)"

  private def simhashSqlRel: String = {
    val sums = (0 until BITS).map(j =>
      s"SUM(CASE WHEN substring(md5(w), ${j + 1}, 1) >= '8' THEN 1 ELSE 0 END) AS s$j").mkString(", ")
    val bits = (0 until BITS).map(j =>
      s"(CASE WHEN 2*s$j >= n THEN '1' ELSE '0' END)").mkString(" || ")
    s"""SELECT doc_id, $bits AS simhash FROM (
       |  SELECT doc_id, count(*) AS n, $sums FROM ($tokSqlRel) GROUP BY doc_id)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS text_hash,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon_id,
        |  CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_minhash" -> {
      val mins = (0 until K).map(i => s"min(md5('$i:' || w)) AS h$i").mkString(", ")
      val sigExpr = (0 until K).map(i => s"h$i").mkString(" || '|' || ")
      s"""WITH sigs AS (
         |  SELECT doc_id, md5($sigExpr) AS sig FROM (
         |    SELECT doc_id, $mins FROM ($tokSqlRel) GROUP BY doc_id))
         |SELECT doc_id, sig,
         |  MIN(doc_id) OVER (PARTITION BY sig) AS canon_id,
         |  CAST(COUNT(*) OVER (PARTITION BY sig) AS BIGINT) AS group_size
         |FROM sigs ORDER BY doc_id""".stripMargin
    },

    "dedup_simhash" ->
      s"""WITH sigs AS ($simhashSqlRel)
         |SELECT doc_id, simhash,
         |  MIN(doc_id) OVER (PARTITION BY simhash) AS canon_id,
         |  CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS group_size
         |FROM sigs ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" -> {
      val ham = (0 until BITS).map(j =>
        s"(CASE WHEN substring(a.simhash,${j + 1},1) <> substring(b.simhash,${j + 1},1) THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH sigs AS ($simhashSqlRel),
         |bands AS (SELECT doc_id, simhash, substr(simhash,1,8) b1, substr(simhash,9,8) b2,
         |                 substr(simhash,17,8) b3, substr(simhash,25,8) b4 FROM sigs)
         |SELECT d1, d2, hamming FROM (
         |  SELECT DISTINCT a.doc_id d1, b.doc_id d2, CAST($ham AS INT) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.doc_id < b.doc_id AND (a.b1=b.b1 OR a.b2=b.b2 OR a.b3=b.b3 OR a.b4=b.b4))
         |WHERE hamming BETWEEN 1 AND 3 ORDER BY d1, d2""".stripMargin
    },

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($shSqlRel),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id d1, b.doc_id d2, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, inter / (x.n + y.n - inter) AS jaccard
         |FROM inter JOIN sz x ON d1 = x.doc_id JOIN sz y ON d2 = y.doc_id
         |WHERE inter / (x.n + y.n - inter) >= 0.2
         |ORDER BY d1, d2""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sims AS (
         |  SELECT a.vec_id, a.label, b.vec_id AS nn_id,
         |    ${cosineSql("a.v", "b.v")} AS sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
         |SELECT vec_id, label, nn_id FROM (
         |  SELECT vec_id, label, nn_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rn
         |  FROM sims) WHERE rn = 1 ORDER BY vec_id""".stripMargin
  )
}
