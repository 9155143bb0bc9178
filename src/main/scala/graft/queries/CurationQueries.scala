package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the steps between "raw crawl" and "training
  * batch" that a 100 TB pipeline runs after dedup/quality/scrub:
  *
  *  - `doc_chunks`: sliding-window chunking (fixed token window, fixed
  *    stride, tail kept) — the canonical pre-tokenization shaping step.
  *    Pure per-row array arithmetic: embarrassingly parallel, no shuffle
  *    at all until a downstream op needs one.
  *  - `curation_topk`: top-N documents per language stratum by quality
  *    score, through the SAME map-side [[graft.functions.TopK]] aggregator
  *    as the ANN queries — per-stratum curation is the other place a
  *    naive `Window.partitionBy(stratum)` funnels every scored row into
  *    #strata tasks, and the aggregator form prunes to N per (stratum,
  *    partition) before the exchange.
  *  - `embedding_quantize`: per-vector symmetric int8 quantization
  *    (scale = max|x|/127) — the storage-side transform that turns a
  *    100 TB float corpus into a 25 TB int8 one. Per-row deterministic
  *    arithmetic only (no cross-row float aggregation, which would be
  *    summation-order-dependent and break the exact oracle compare); the
  *    quantized vector is emitted as an md5 over its comma-joined form so
  *    the driver's scalar compare can hash it.
  */
object CurationQueries {

  private val ChunkSize = 32   // tokens per chunk
  private val Stride = 24      // chunk start interval (overlap = 8)
  private val TopN = 3         // docs kept per language stratum

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sliding-window chunking ----
    // Chunk count is the standard 1 + ceil((n - window)/stride) for
    // n > window, else 1: windows stop once one reaches the end of the
    // document — the naive ceil(n/stride) emits a final chunk that is a
    // strict SUBSET of its predecessor whenever n mod stride lands inside
    // the previous window's tail, double-counting tail tokens in the
    // training batches. The token array is bound ONCE via the
    // single-element transform (shingles3's pattern): HOF lambdas
    // re-evaluate embedded non-lambda subexpressions per element, so
    // inlining tokens(...) would re-tokenize the document once per chunk.
    "doc_chunks" -> ((s, dir) => {
      val chunks = element_at(transform(array(tokens(col("text"))), tv =>
        when(size(tv) > 0,
          transform(
            sequence(lit(0),
              when(size(tv) <= ChunkSize, lit(0))
                .otherwise(ceil((size(tv) - ChunkSize) / lit(Stride.toDouble)).cast("int"))),
            i => struct(
              concat_ws(" ", slice(tv, i * Stride + 1, lit(ChunkSize))).as("chunk"),
              least(lit(ChunkSize), size(tv) - i * Stride).as("n_tokens"))))
          .otherwise(array().cast("array<struct<chunk:string,n_tokens:int>>"))), 1)
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(chunks))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
          col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
        .orderBy("doc_id", "chunk_id")
    }),

    // ---- per-stratum top-N curation via the map-side TopK aggregator ----
    // Tokenless documents have NULL quality (0/0) and are excluded before
    // ranking — curation semantics, and it keeps the typed aggregator's
    // primitive Double input total.
    "curation_topk" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopK(TopN))
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          TextAnalysisQueries.qualityExpr(col("text")).as("quality"))
        .filter(col("quality").isNotNull)
        .groupBy("lang")
        .agg(topk(col("quality"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("doc_id"), col("col.sim").as("quality"))
        .orderBy("lang", "rank")
    }),

    // ---- symmetric int8 quantization of the embedding column ----
    // scale is computed in its own projection step and referenced as a
    // column: embedding it in the quantize lambda would re-run the
    // array_max scan once per element (the HOF re-evaluation rule).
    // round() is half-away-from-zero on both engines; the int cast
    // happens after round so it is exact. All-zero vectors quantize to
    // zeros with scale 0 (the x/0 = Inf path is guarded out, mirrored).
    "embedding_quantize" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), v.as("v"))
        .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
        .withColumn("scale", col("maxabs") / lit(127.0))
        .select(col("vec_id"), col("label"), size(col("v")).as("n_dims"),
          col("scale"),
          md5(concat_ws(",", transform(col("v"), x =>
            when(col("maxabs") === 0.0, lit(0))
              .otherwise(round(x / col("scale")).cast("int"))
              .cast("string")))).as("qhash"))
        .orderBy("vec_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "doc_chunks" -> {
      val tv = tokensSql("text")
      val nChunks = s"""CASE WHEN len(tv) = 0 THEN 0
         |  WHEN len(tv) <= $ChunkSize THEN 1
         |  ELSE 1 + CAST(ceil((len(tv) - $ChunkSize) / ${Stride.toDouble}) AS BIGINT) END"""
        .stripMargin
      s"""WITH t AS (SELECT doc_id, $tv AS tv FROM documents),
         |e AS (SELECT doc_id, tv, unnest(range($nChunks)) AS chunk_id
         |      FROM t)
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |  array_to_string(tv[chunk_id * $Stride + 1 : least(chunk_id * $Stride + $ChunkSize, len(tv))], ' ') AS chunk,
         |  CAST(least($ChunkSize, len(tv) - chunk_id * $Stride) AS INT) AS n_tokens
         |FROM e ORDER BY doc_id, chunk_id""".stripMargin
    },

    "curation_topk" ->
      s"""WITH scored AS (
         |  SELECT lang, doc_id, ${TextAnalysisQueries.qualitySqlExpr} AS quality
         |  FROM documents),
         |ranked AS (
         |  SELECT lang, doc_id, quality,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS INT) AS rank
         |  FROM scored WHERE quality IS NOT NULL)
         |SELECT lang, rank, doc_id, quality FROM ranked
         |WHERE rank <= $TopN ORDER BY lang, rank""".stripMargin,

    "embedding_quantize" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |m AS (SELECT vec_id, label, v,
         |        list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e)
         |SELECT vec_id, label, CAST(len(v) AS INT) AS n_dims,
         |  maxabs / 127.0 AS scale,
         |  md5(array_to_string(list_transform(v, x ->
         |    CAST(CASE WHEN maxabs = 0.0 THEN 0
         |              ELSE CAST(round(x / (maxabs / 127.0)) AS INT) END AS VARCHAR)), ',')) AS qhash
         |FROM m ORDER BY vec_id""".stripMargin
  )
}
