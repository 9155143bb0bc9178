package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal metadata extraction as a verifiable query: binary payload →
  * (byte_len, sha256, stub-decoded dimensions). The Spark side goes through
  * the REAL typed `mapPartitions` path ([[Multimodal.extractFeatures]]);
  * the oracle mirrors the deterministic stub formula in SQL, so the whole
  * plumbing — binary encoding, Dataset round-trip, partition-wise execution
  * — is value-checked.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables(s, dir, "documents"))
      Multimodal.extractFeatures(s, media).toDF().orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
        |  CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height,
        |  3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
