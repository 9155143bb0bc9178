package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression against its composed-builtin reference
  * form (zip_with + aggregate): bit-identical values, identical null
  * semantics, and codegen-compatible.
  */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("native dot is bit-identical to the HOF fold over real embedding pairs") {
    val e = Tables(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 50)
    val mismatches = pairs
      .select(dot(col("a.v"), col("b.v")).as("native"),
        dotHof(col("a.v"), col("b.v")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(mismatches.count() == 0)
  }

  test("native dist2 is bit-identical to the HOF fold over real embedding pairs") {
    val e = Tables(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 50)
    val mismatches = pairs
      .select(dist2(col("a.v"), col("b.v")).as("native"),
        dist2Hof(col("a.v"), col("b.v")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(mismatches.count() == 0)
    // null semantics: length mismatch -> NULL in both forms
    import spark.implicits._
    val mm = Seq((Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(dist2(col("a"), col("b")).as("native"),
        dist2Hof(col("a"), col("b")).as("hof")).head()
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("null semantics match zip_with padding: length mismatch / null element -> NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),          // 1*3 + 2*4 = 11
      (2L, Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0)),     // length mismatch -> NULL
      (3L, Seq(1.0), Seq[Double]())                // vs empty -> NULL
    ).toDF("id", "a", "b")
    val both = df.select(col("id"), dot(col("a"), col("b")).as("native"),
      dotHof(col("a"), col("b")).as("hof")).collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), if (r.isNullAt(1)) 0.0 else r.getDouble(1),
        r.isNullAt(2)))).toMap
    assert(both(1L) == ((false, 11.0, false)))
    assert(both(2L)._1 && both(2L)._3, "length mismatch must be NULL in both forms")
    assert(both(3L)._1 && both(3L)._3)

    // null element -> NULL (matches null propagation through the fold)
    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("id", "a", "b")
      .select(dot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("native"))
      .head()
    assert(withNull.isNullAt(0))
  }

  test("dot_product is registered on the SQL surface (GraftExtensions)") {
    val row = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(row.getDouble(0) == 11.0)
    assert(spark.sql("SELECT dot_product(array(1.0D), array(1.0D, 2.0D)) AS d")
      .head().isNullAt(0))
    // implicit casts: ARRAY<FLOAT> (the on-disk embedding type) and integer
    // literals coerce like they did through the HOF composition
    spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
      .createOrReplaceTempView("emb_raw")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS d FROM emb_raw ORDER BY vec_id LIMIT 1")
      .head().getDouble(1)
    assert(viaSql > 0.0)
    assert(spark.sql("SELECT dot_product(array(1, 2), array(3, 4)) AS d").head().getDouble(0) == 11.0)
  }

  test("native arg_min_dist2 is bit-identical to the HOF argmin over real vectors") {
    import spark.implicits._
    // centroid list: 7 real embeddings (odd count, distinct cids, cid
    // order shuffled by the join) against every corpus vector
    val e = Tables(spark, Sf0001, "embeddings")
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = e.filter(col("vec_id") < 7)
      .select(((col("vec_id") * 3) % 7).cast("int").as("cid"), col("v").as("c"))
      .agg(collect_list(struct(col("cid"), col("c"))).as("cents"))
    val mism = e.crossJoin(broadcast(cents))
      .select(argMinDist2(col("v"), col("cents")).as("n"),
        argMinDist2Hof(col("v"), col("cents")).as("h"))
      .filter(not(col("n") <=> col("h")))
    assert(mism.count() == 0)

    // exact-tie break toward the smaller cid, degenerate inputs -> NULL
    val dup = Seq((Seq(1.0, 2.0), Seq((3, Seq(0.0, 0.0)), (1, Seq(1.0, 2.0)), (2, Seq(1.0, 2.0)))))
      .toDF("v", "cents")
      .select(argMinDist2(col("v"),
        col("cents").cast("array<struct<cid:int,c:array<double>>>")).as("b"))
      .head().getStruct(0)
    assert(dup.getDouble(0) == 0.0 && dup.getInt(1) == 1)
    val empty = Seq((Seq(1.0), Seq.empty[(Int, Seq[Double])])).toDF("v", "cents")
      .select(argMinDist2(col("v"),
        col("cents").cast("array<struct<cid:int,c:array<double>>>")).as("b"))
      .head()
    assert(empty.isNullAt(0))
  }

  test("cosine stays inside whole-stage codegen (no interpreted HOF in the plan)") {
    val e = Tables(spark, Sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val scored = e.select(cosine(col("v"), col("v")).as("c"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("dot_product"), plan)
    assert(!plan.contains("aggregate(zip_with"), s"HOF leaked into the hot path:\n$plan")
  }
}
