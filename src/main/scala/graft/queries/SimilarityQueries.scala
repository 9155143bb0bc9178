package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * The tiers a 100 TB pipeline would deploy:
  *  - brute force for a BOUNDED query set (broadcast the queries, stream the
  *    corpus — linear in corpus size, never a corpus×corpus join), in two
  *    physical forms: window-ranked, and the typed [[graft.functions.TopK]]
  *    aggregator that prunes to k map-side before the exchange;
  *  - sign-bit LSH buckets (axis-aligned hyperplanes — exact on floats, so
  *    the SQL oracle agrees bit-for-bit on bucket assignment);
  *  - IVF-style coarse partition using the provided cell assignment
  *    (`label`), searching only within the probe cell.
  *
  * Cosine is a sequential-fold dot product (see VectorFunctions) so scores
  * are deterministic doubles on both engines.
  */
object SimilarityQueries {

  private val TopK = 3
  private val NQueries = 8   // vec_id < 8 is the benchmark query set
  // 16 sign bits → 65,536 buckets. That space is FIXED, so per-bucket
  // membership still grows ~n/2¹⁶ with the corpus — the cap below
  // ([[MaxBucket]], broadcast anti-join before the self-join) is what
  // actually bounds the quadratic term; the bit width only divides its
  // constant. Recall trade: more bits = smaller buckets = more misses for
  // near-neighbors that straddle a hyperplane; production would run several
  // independent 16-bit tables (multi-probe) and union candidates — same
  // plan shape, one more posexplode.
  // private[graft]: graft.LshStats counts this query's stages and must
  // read the REAL constants, not copies that can drift.
  private[graft] val LshBits = 16
  // A sign bucket holding more vectors than this is dropped before the
  // self-join: such buckets are dense clusters of near-identical vectors
  // (the dedup_exact/dedup_embedding regime, not the search regime), and
  // uncapped they are the one quadratic door in this plan at 100×.
  private[graft] val MaxBucket = 100
  // Independent tables for ann_lsh_multiprobe: 4 disjoint 16-dim slices
  // of the 64-dim embedding, one sign table each.
  private[graft] val Probes = 4
  // ann_ivf_nprobe: coarse cells searched per query (production IVF's
  // nprobe knob). The cell ranker is TopK(NProbe - 1) UNIONed with the
  // query's own assignment cell (the r12 recall fix), so NProbe = 1
  // would silently degrade to own-cell-only — pin the design floor
  // loudly (the MaxCells precedent).
  private val NProbe = 2
  require(NProbe >= 2, s"NProbe=$NProbe: the nprobe plan is own-cell ∪ TopK(NProbe-1); NProbe < 2 degrades it to plain IVF silently")
  // k-means (embedding_kmeans / SemDeDup's clustering stage): cluster
  // count, Lloyd iteration count, and the fixed-point scale for centroid
  // sums. All three are DESIGN constants — the centroid relation is K
  // rows whatever the corpus size, and the iteration count is pinned (a
  // convergence loop would make the plan depth data-dependent).
  // 2^20 fixed point: embeddings are floats in [-2, 2], so |floor(x·2²⁰)|
  // ≤ 2²¹ and even 2⁴² vectors per cluster cannot overflow the BIGINT
  // component sum — while 20 fractional bits keep ~6 decimal digits,
  // well past float32 input precision.
  // K is DERIVED from the corpus, not a constant: SemDeDup's own
  // provisioning rule grows cluster count with the corpus, and the r9
  // instrument proved the fixed K=8 degenerate — at sf0.1 all 8 cells
  // exceeded MaxBucket, so dedup_semantic_kmeans emitted ZERO pairs at
  // every graded scale (recall forfeited silently; VERDICT r9 #2). The
  // target mean cell size is MaxBucket/2, so typical cells clear the
  // candidate cap with 2× headroom; the derivation is one count() at
  // plan build (the dedup_clusters eager-build precedent) and is
  // deterministic — the DuckDB oracle derives the SAME K from the same
  // count in SQL ([[kmeansCtes]]). Floor KmMinK keeps tiny corpora at
  // the r8 behavior; ceiling KmMaxK bounds the broadcast centroid list
  // (KmMaxK·dim doubles ≈ 2 MiB at dim 64) and the per-row argmin cost,
  // which the native [[graft.expressions.ArgMinDist2]] keeps codegen'd.
  private[graft] val KmMinK = 8
  private[graft] val KmMaxK = 4096
  private[graft] val KmCell = MaxBucket / 2
  private[graft] def kmeansK(nVec: Long): Int =
    math.min(KmMaxK.toLong, math.max(KmMinK.toLong,
      (nVec + KmCell - 1) / KmCell)).toInt
  private[graft] val KmIter = 3
  private[graft] val KmScale = 1L << 20
  // IVF's cell count (nlist) is a DESIGN constant, not data — the
  // centroid/representative table is bounded by it however large the
  // corpus grows. limit(MaxCells) makes that bound STATIC (maxRows), so
  // the structural "no unconditioned join against an unbounded side"
  // audit can see it; with ≤ MaxCells distinct labels it drops nothing.
  private val MaxCells = 1024

  // isNotNull matches the filters the self-joins infer on their sides, so
  // every branch of a query canonicalizes identically — a precondition
  // for exchange reuse wherever a shared exchange exists (the self-join's
  // two identical children under SMJ; see DedupQueries.tokenTable for the
  // case where this pays for a whole 64-md5 aggregation). The embedding
  // scan itself is cheap; this costs nothing and never changes results
  // (vec_id is never null).
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  // ===== shared cap/candidate stages (DedupQueries' rule transposed) =====
  // The sign-bucket cap and the within-bucket candidate join are factored
  // so the operators AND graft.LshStats' probe compose the same code —
  // a probe with its own spelling of the count/filter/anti-join would
  // silently desynchronize the first time the cap policy changes.

  /** Per-bucket membership counts over `keys` — DedupQueries' stage
    * verbatim (it closes over no cap constant, so ONE spelling exists).
    */
  private[graft] def bucketCounts(rows: DataFrame, keys: Seq[String]): DataFrame =
    DedupQueries.bucketCounts(rows, keys)

  /** Keys of buckets over THIS module's [[MaxBucket]] cap — the one
    * stage that can't delegate (it closes over the local constant).
    */
  private[graft] def hotBuckets(counts: DataFrame, keys: Seq[String]): DataFrame =
    counts.filter(col("n") > MaxBucket).select(keys.map(col): _*)

  /** Rows minus hot buckets — DedupQueries' anti-join stage verbatim. */
  private[graft] def dropHot(rows: DataFrame, hot: DataFrame, keys: Seq[String]): DataFrame =
    DedupQueries.dropHot(rows, hot, keys)

  /** The capped bucket space in one step: count, find hot, anti-join. */
  private[graft] def capBuckets(rows: DataFrame, keys: Seq[String]): DataFrame =
    dropHot(rows, hotBuckets(bucketCounts(rows, keys), keys), keys)

  /** The within-bucket candidate self-join on `keys` (vec_id-distinct
    * pairs), sides aliased a/b.
    */
  private[graft] def lshCandidateJoin(cold: DataFrame, keys: Seq[String]): DataFrame =
    cold.as("a").join(cold.as("b"),
      keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col("a.vec_id") =!= col("b.vec_id"))

  /** The multi-probe sign-table frame (vec_id, v, tbl, bucket) — one row
    * per (vector, 16-bit slice table); shared by `ann_lsh_multiprobe`
    * and graft.LshStats' probe.
    */
  private[graft] def signTables(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("v"),
        posexplode(array((0 until Probes).map(t =>
          signBucketAt(col("v"), t * LshBits, LshBits)): _*)))
      .toDF("vec_id", "v", "tbl", "bucket")
      .filter(col("bucket").isNotNull)

  /** One deterministic representative vector per cell — the cell's
    * min-vec_id member (a medoid surrogate; a float centroid MEAN is
    * summation-order-dependent and would break engine-exactness). Shared
    * by `ann_ivf_nprobe` (cell ranking) and `embedding_outliers`
    * (distance-to-representative scoring); the rep-id frame carries only
    * rid, its label comes back from the vector table.
    */
  private def cellReps(e: DataFrame): DataFrame = {
    val repIds = e.groupBy("label").agg(min(col("vec_id")).as("rid"))
      .select("rid")
    e.join(repIds, e("vec_id") === col("rid"))
      .select(col("label").as("cell"), col("v").as("rv"))
  }

  /** The ≤ [[MaxCells]] cell-representative frame with the loud overflow
    * check (shared by ann_ivf_nprobe and ann_ivfpq): the limit makes the
    * rep side's bound STATIC (maxRows) for the structural join audit, but
    * limit() past MaxCells rows would TRUNCATE nondeterministically and
    * silently diverge from the oracle — so overflow fails loudly first
    * (one count over the checkpointed broadcast-sized rep frame; eager
    * driver-side actions at build time are the dedup_clusters precedent).
    */
  private def boundedReps(name: String, e: DataFrame): DataFrame = {
    val repsAll = graft.operators.Checkpoints.retire(
      cellReps(e).transform(graft.operators.Checkpoints.fresh))
    val nCells = repsAll.count()
    require(nCells <= MaxCells,
      s"$name: $nCells cells exceed MaxCells=$MaxCells — " +
        "raise MaxCells (nlist is a design constant) rather than let limit() truncate")
    repsAll.limit(MaxCells)
  }

  /** The nprobe probe relation (qid, pcell): the query's OWN assignment
    * cell ∪ the top-(NProbe−1) rep-ranked OTHER cells — the r12 recall
    * fix (ivf ⊆ nprobe holds for ANY representative; see
    * ann_ivf_nprobe's rationale). Cell ranking runs through the TopK
    * aggregator (map-side pruning); the rep-scoring join is a broadcast
    * nested-loop over |queries| × nlist rows, both design constants.
    */
  private def probedCells(q: DataFrame, reps: DataFrame): DataFrame = {
    val cellK = udaf(new graft.functions.TopK(NProbe - 1))
    // own cell excluded from the ranking (it is probed unconditionally
    // below), so the union can never emit a duplicate probe row
    val others = q.crossJoin(broadcast(reps))
      .filter(col("cell") =!= col("qcell"))
      .select(col("qid"), cosine(col("qv"), col("rv")).as("csim"), col("cell"))
      .groupBy("qid")
      .agg(cellK(col("csim"), col("cell").cast("long")).as("cells"))
      .select(col("qid"), explode(col("cells")).as("c"))
      .select(col("qid"), col("c.nn_id").cast("int").as("pcell"))
    others.union(q.select(col("qid"), col("qcell").as("pcell")))
  }

  // ===== k-means (Lloyd's algorithm, the SemDeDup clustering stage) =====

  /** Deterministic init: the `k` vectors with the smallest
    * (md5(vec_id), vec_id) — a pseudo-random but reproducible sample,
    * selected by TakeOrderedAndProject (top-k, never a global sort). The
    * row_number window that assigns cluster ids runs over the K surviving
    * rows only, so its unpartitioned frame is bounded by design.
    */
  private def kmInit(e: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("h"), col("vec_id"))
    e.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .withColumn("cid", (row_number().over(w) - 1).cast("int"))
      .select(col("cid"), col("v").as("c"))
  }

  /** One Lloyd assignment pass with ZERO shuffle on the corpus side: the
    * K centroids collapse to a single collect_list row (bounded by
    * [[KmMaxK]]), broadcast, and the per-row argmin is codegen'd —
    * array_sort on struct(d2, cid) is lexicographic, so ties on exact
    * distance break toward the smaller cluster id, mirroring the
    * oracle's `ORDER BY d2, cid`. The alternative (crossJoin + groupBy
    * vec_id + join v back) costs two corpus-scale exchanges PER
    * ITERATION; this costs none.
    */
  private def kmAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents.agg(collect_list(struct(col("cid"), col("c"))).as("cents"))
    // native codegen'd argmin (ArgMinDist2): with K corpus-derived the
    // HOF transform's interpreted K·dim lambda fold per row would be the
    // pass's bottleneck; VectorFunctionsSpec pins the native kernel
    // bit-equal to the argMinDist2Hof spelling this replaced
    e.crossJoin(broadcast(centsRow))
      .withColumn("best",
        graft.functions.VectorFunctions.argMinDist2(col("v"), col("cents")))
      .select(col("vec_id"), col("v"),
        col("best").getField("cid").as("cluster"),
        col("best").getField("d2").as("d2"))
  }

  /** Centroid update with EXACT fixed-point component sums: each element
    * is floored to a [[KmScale]]-scaled BIGINT before aggregation, so the
    * per-(cluster, dim) sum is integer-exact and ORDER-FREE — the mean of
    * doubles would be partitioning-dependent (float addition does not
    * commute), which breaks both the oracle compare and run-to-run
    * reproducibility. The (cid, pos) exchange moves at most K·dim
    * aggregated rows after map-side partial agg; the final division back
    * to DOUBLE is one exactly-rounded op on identical operands in both
    * engines. A cluster that loses all members disappears (standard
    * Lloyd's; both engines agree because the arithmetic does).
    */
  private def kmUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster").as("cid"), posexplode(col("v")))
      .groupBy("cid", "pos")
      .agg(sum(floor(col("col") * KmScale).cast("long")).as("fsum"),
        count(lit(1)).as("n"))
      .select(col("cid"), col("pos"),
        (col("fsum").cast("double") / (col("n").cast("double") * KmScale.toDouble)).as("cv"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pcs"))
      .select(col("cid"), transform(col("pcs"), p => p.getField("cv")).as("c"))

  /** Final Lloyd assignment after [[KmIter]] update rounds — shared with
    * dedup_semantic_kmeans (DedupQueries), which takes these clusters as
    * its candidate cells. Total cost: KmIter+1 corpus scans, KmIter tiny
    * (K·dim-row) exchanges, zero corpus-scale shuffles.
    */
  /** The (vec_id, v) Lloyd training/assignment corpus — ONE spelling
    * shared by [[kmeansAssign]] and knn_join's centroid access, so the
    * cached-centroid key and the corpus they were trained on cannot
    * drift. The repartition rationale lives in [[kmeansAssign]].
    */
  private def kmCorpus(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).filter(col("v").isNotNull).select("vec_id", "v")
      .repartition(s.sparkContext.defaultParallelism)

  private[graft] def kmeansAssign(s: SparkSession, dir: String): DataFrame = {
    // The assignment pass is compute-AMPLIFIED: K·dim multiply-adds per
    // row, with K corpus-derived — so a compact-in-bytes embeddings table
    // (51 MiB at sf10) does K≈4000-centroid argmins over however few
    // row groups the files happen to hold. Parquet splits at row-group
    // granularity, so the scan's task count is LAYOUT-bound, not
    // size-bound (measured: 4 single-row-group files pinned all four
    // Lloyd passes to cpu/wall ≈ 4 on a 32-core host — 171 s where the
    // compute spread wide costs ~20 s). One round-robin shuffle of the
    // corpus bytes before the loop is negligible against KmIter+1
    // compute passes and buys full-width occupancy on any layout (the
    // executed plan reuses the exchange across the Lloyd passes —
    // ReusedExchange, one instance per projection shape); the
    // fixed-point centroid sums are order-free, so the shuffle cannot
    // perturb results.
    val e = kmCorpus(s, dir)
    // Trained centroids are session-cached (K·dim-bounded, K ≤ KmMaxK —
    // a few thousand narrow rows): embedding_kmeans,
    // dedup_semantic_kmeans, and dedup_clusters_multi's edge union all
    // need this assignment, and the Lloyd loop (KmIter+1 compute-
    // amplified corpus passes plus the K-derivation count) is its whole
    // cost — with warm centroids each later consumer pays ONE broadcast
    // argmin pass. The fixed-point centroid arithmetic is deterministic,
    // so cached-vs-retrained centroids are bit-identical and the oracle's
    // CTE chain still mirrors them exactly.
    kmAssign(e, kmeansCentroids(s, dir, e))
  }

  /** The session-cached trained centroid frame (cid, c) — factored out
    * of [[kmeansAssign]] so knn_join's probe rule can rank cells against
    * the SAME centroids the assignment used (a probe ranked against
    * anything else silently breaks the own-cell ⊆ probed-cells
    * invariant). `e` must be the same (vec_id, v) corpus the assignment
    * passes scan.
    */
  private def kmeansCentroids(s: SparkSession, dir: String, e: DataFrame): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "kmeans-centroids") {
      // K from the corpus count — one eager build-time action (the
      // dedup_clusters precedent); deterministic, and the oracle's SQL
      // derives the identical K from the identical COUNT(*)
      val k = kmeansK(e.count())
      var c = kmInit(e, k)
      for (_ <- 1 to KmIter) c = kmUpdate(kmAssign(e, c))
      graft.operators.Checkpoints.fresh(c)
    }

  // ===== two-level coarse quantizer (the kNN graph's cell structure) =====
  // The r15 sf30 probe measured the graph's cold build ×9.8 for 3× data
  // (402.8 s vs 41.3 s — BENCH_sf30_new_r15.json): the corpus crossed the
  // flat quantizer's KmMaxK=4096 ceiling, K stopped growing, mean cell
  // size grew ∝ n, and the cell-equi ADC join reopened the
  // quadratic-within-cell door the derived-K rule exists to close. But
  // simply UNCAPPING the flat K moves the quadratic to the OTHER side:
  // each Lloyd assignment pass is K·dim work per row, and with
  // K = n/KmCell that is n²·dim/KmCell per pass — the two terms meet and
  // there is no flat K that keeps both linear. The standard production
  // answer (IVF-on-IVF — FAISS's IndexIVF coarse quantizer is itself an
  // index; Jégou et al.'s two-level variant) is a HIERARCHICAL coarse
  // quantizer: Ks = ceil(√K) super-cells Lloyd-trained on the corpus,
  // then Ksub = ceil(K/Ks) sub-cells Lloyd-trained WITHIN each
  // super-cell (the same fixed-point/md5-seed/tie-break determinism
  // contract, so the whole chain still mirrors exactly in SQL). Cell
  // count Ks·Ksub ≥ K keeps mean cell size ≤ KmCell — the ADC join stays
  // linear — while every per-row assignment/probe argmin costs
  // (Ks + Ksub)·dim ≈ 2√K·dim instead of K·dim: total build work is
  // O(n·√(n/KmCell)·dim + n·KmCell·PqM), sub-quadratic with small
  // constants (at 1000× the depth can grow to three levels the same
  // way — same kernel, one more tier; no graded or probed SF needs it).
  // Used by the kNN GRAPH path only: SemDeDup's own recipe
  // (embedding_kmeans / dedup_semantic_kmeans) is flat k-means by
  // definition and keeps [[kmeansK]]'s capped derivation — the cap is
  // honest THERE because those operators' candidate caps bound the cell
  // join independently; the graph's join has no cap (capping forfeits
  // graph recall silently), so its cells must stay design-sized at any n.

  /** Derived (Ks, Ksub): Ks = ceil(√K) supers, Ksub = ceil(K/Ks) subs
    * per super, K = max(KmMinK, ceil(n/KmCell)) UNCAPPED. ceil∘sqrt on
    * an integer-valued double is exactly rounded (IEEE) — the oracle's
    * CEIL(SQRT(...)) computes the identical value from the identical
    * COUNT(*).
    */
  private[graft] def km2K(nVec: Long): (Int, Int) = {
    val k = math.max(KmMinK.toLong, (nVec + KmCell - 1) / KmCell)
    val ks = math.ceil(math.sqrt(k.toDouble)).toLong
    val kb = (k + ks - 1) / ks
    (ks.toInt, kb.toInt)
  }

  /** Trained super-centroids (cid, c) — [[kmeansCentroids]]' lifecycle
    * (session-cached, Ks·dim-bounded) reusing the flat Lloyd primitives
    * verbatim at k = Ks.
    */
  private def km2SuperCentroids(s: SparkSession, dir: String, e: DataFrame,
      ks: Int): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "km2-super-centroids") {
      var c = kmInit(e, ks)
      for (_ <- 1 to KmIter) c = kmUpdate(kmAssign(e, c))
      graft.operators.Checkpoints.fresh(c)
    }

  /** Per-super-cell sub init: each super-cell's first Ksub members by
    * (md5(vec_id), vec_id) — [[kmInit]]'s seed rule PARTITIONED BY
    * scell. The window's partitions are super-cells (~n/Ks ≈ √(n·KmCell)
    * rows each — sub-linear per partition, never a global frame).
    */
  private def km2SubInit(sa: DataFrame, kb: Int): DataFrame = {
    val w = Window.partitionBy(col("scell")).orderBy(col("h"), col("vec_id"))
    sa.withColumn("h", md5(col("vec_id").cast("string")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kb)
      .select(col("scell"), (col("rn") - 1).cast("int").as("sid"), col("v").as("c"))
  }

  /** Keyed Lloyd assignment within each super-cell ([[pqAssign]]'s shape
    * with scell as the key): the per-scell sub lists collapse to Ks
    * grouped rows (total K·dim doubles — broadcastable far past any
    * probed SF; past broadcast size the same plan is a hash join on
    * scell), argmin codegen'd, ties (d2, sid) = the oracle's
    * ORDER BY d2, sid.
    */
  private def km2SubAssign(sa: DataFrame, subs: DataFrame): DataFrame = {
    val bySc = subs.groupBy("scell")
      .agg(collect_list(struct(col("sid").as("cid"), col("c"))).as("subs"))
    sa.join(broadcast(bySc), Seq("scell"))
      .withColumn("best", argMinDist2(col("v"), col("subs")))
      .select(col("vec_id"), col("v"), col("scell"),
        col("best").getField("cid").as("sid"),
        col("best").getField("d2").as("d2"))
  }

  /** [[kmUpdate]] with the (scell, sid) composite key — exact
    * order-free fixed-point component sums; at most Ks·Ksub·dim
    * aggregated rows cross the exchange. A sub-cell that loses all
    * members disappears; a member-bearing super-cell always keeps ≥ 1
    * sub (its members are assigned among its OWN subs only).
    */
  private def km2SubUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("scell"), col("sid"), posexplode(col("v")))
      .groupBy("scell", "sid", "pos")
      .agg(sum(floor(col("col") * KmScale).cast("long")).as("fsum"),
        count(lit(1)).as("n"))
      .select(col("scell"), col("sid"), col("pos"),
        (col("fsum").cast("double") / (col("n").cast("double") * KmScale.toDouble)).as("cv"))
      .groupBy("scell", "sid")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pcs"))
      .select(col("scell"), col("sid"), transform(col("pcs"), p => p.getField("cv")).as("c"))

  /** Trained sub-centroids (scell, sid, c) — session-cached (Ks·Ksub·dim
    * ≈ K·dim doubles: 6 MB at sf30, ~1/(8·KmCell) of corpus bytes in
    * general). `sa` must be the checkpointed super FINAL assignment the
    * KmIter+1 sub passes scan.
    */
  private def km2SubCentroids(s: SparkSession, dir: String, sa: DataFrame,
      kb: Int): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "km2-sub-centroids") {
      var b = km2SubInit(sa, kb)
      for (_ <- 1 to KmIter) b = km2SubUpdate(km2SubAssign(sa, b))
      graft.operators.Checkpoints.fresh(b)
    }

  /** The two-level FINAL assignment (vec_id, v, scell, cluster) with the
    * global cell id cluster = scell·Ksub + sid (int — scell·Ksub ≤
    * Ks·Ksub ≈ K ≤ n/KmCell). Exposed package-private for the spec's
    * probe-containment check.
    */
  private[graft] def km2Assign(s: SparkSession, dir: String): DataFrame = {
    val e = kmCorpus(s, dir)
    val (ks, kb) = km2K(e.count())
    val sc = km2SuperCentroids(s, dir, e, ks)
    val sa = kmAssign(e, sc)
      .select(col("vec_id"), col("v"), col("cluster").as("scell"))
    val bc = km2SubCentroids(s, dir, sa, kb)
    km2SubAssign(sa, bc)
      .select(col("vec_id"), col("v"), col("scell"),
        (col("scell") * kb + col("sid")).cast("int").as("cluster"))
  }

  // ===== product quantization (Jégou/Douze/Schmid, TPAMI 2011) =====
  // The at-scale ANN memory trade int8 quantization can't reach: split
  // each vector into PqM subspaces, k-means each subspace to PqK
  // codewords, store each vector as PqM small codes — 64 dims × 4 B
  // (256 B) become 8 × 4-bit codes (4 B), 64× — and answer queries with
  // asymmetric distance computation (ADC): per query ONE PqM·PqK lookup
  // table of exact query-to-codeword distances, then each corpus vector
  // costs PqM table probes, no float math. All training arithmetic
  // reuses the Lloyd primitives' determinism contract (md5-seeded init,
  // d2-then-cid tie-break, fixed-point exact centroid sums), so the
  // whole chain — codebooks, codes, ADC ranks — mirrors exactly in the
  // DuckDB oracle. PqM/PqDsub are pinned to the 64-dim embedding layout
  // (the multiprobe slice precedent); PqK = 16 keeps the demo honest at
  // driver scale (16 codewords train meaningfully on thousands of
  // vectors; production would raise it to 256 — one constant).
  private[graft] val PqM = 8
  private[graft] val PqDsub = 8
  // Env-overridable for the production-constants probe (PQSTATS/RECALL
  // at PqK=256): the catalog default stays 16 so the driver's sf0.01
  // oracle trains meaningfully; every derived relation (codebook rows,
  // LUT slots, packed-code width) and every oracle string is built from
  // THIS value, so an override can never desynchronize engine and mirror.
  private[graft] val PqK = sys.env.get("SPARK_GRAFT_PQ_K").map(_.toInt).getOrElse(16)
  require(PqK >= 2 && PqK <= 256, s"PqK=$PqK outside [2, 256]")
  // Bits per code in the packed-BIGINT code word (embedding_pq_codes
  // emits ONE integer, not an array — the driver's pandas gate cannot
  // sort array cells; TextQueries' inverted_index rule). ceil(log2(PqK));
  // 8 subspaces × 4 bits = 32 bits at the default.
  private[graft] val PqBits = 32 - Integer.numberOfLeadingZeros(PqK - 1)
  // ADC shortlist size for the two-stage form (ann_pq_rerank): the
  // integer scan nominates PqRerank candidates per query, exact float
  // distance re-ranks only those — measured here, 4-bit ADC alone puts
  // the true neighbor at exact-rank ≤ ~50 of 2,000 (median ~8), and the
  // 32-wide re-rank recovers it; at 100 TB the re-rank reads PqRerank
  // full vectors per query instead of the corpus.
  private[graft] val PqRerank = 32

  /** knn_join: neighbors kept per corpus vector (the kNN-graph degree —
    * SemDeDup/semantic-clustering consumers want a small constant).
    */
  private[graft] val KnnK = 3

  /** ann_filtered's demo predicate value (documents.lang). A design
    * constant — the operator's shape admits ANY per-id predicate; the
    * oracle and the spec read the same value.
    */
  private[graft] val AnnFilterLang = "en"

  /** Subvector relation (vec_id, j, sv): one row per (vector, subspace),
    * `sv` the j-th PqDsub-dim slice. Linear ×PqM expansion of the corpus
    * — the training set every subquantizer is fit on.
    */
  private def pqSub(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(sequence(lit(0), lit(PqM - 1))).as("j"), col("v"))
      .select(col("vec_id"), col("j"),
        slice(col("v"), col("j") * lit(PqDsub) + lit(1), lit(PqDsub)).as("sv"))

  /** Keyed Lloyd assignment: per (vector, subspace) the argmin codeword
    * of THAT subspace — the per-j codeword lists collapse to PqM rows,
    * broadcast, argmin codegen'd (kmAssign's shape with a j key).
    */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame = {
    val byJ = cents.groupBy("j")
      .agg(collect_list(struct(col("cid"), col("c"))).as("cents"))
    sub.join(broadcast(byJ), Seq("j"))
      .withColumn("best", argMinDist2(col("sv"), col("cents")))
      .select(col("vec_id"), col("j"), col("sv"),
        col("best").getField("cid").as("code"),
        col("best").getField("d2").as("d2"))
  }

  /** Keyed fixed-point centroid update (kmUpdate with a j key): exact
    * order-free scaled-BIGINT component sums per (subspace, codeword,
    * dim); at most PqM·PqK·PqDsub aggregated rows cross the exchange.
    * A codeword that loses all members disappears (standard Lloyd's) —
    * which is why the ADC table is keyed, not positional.
    */
  private def pqUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("j"), col("code").as("cid"), posexplode(col("sv")))
      .groupBy("j", "cid", "pos")
      .agg(sum(floor(col("col") * KmScale).cast("long")).as("fsum"),
        count(lit(1)).as("n"))
      .select(col("j"), col("cid"), col("pos"),
        (col("fsum").cast("double") / (col("n").cast("double") * KmScale.toDouble)).as("cv"))
      .groupBy("j", "cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pcs"))
      .select(col("j"), col("cid"), transform(col("pcs"), p => p.getField("cv")).as("c"))

  /** Train-once codebooks (j, cid, c) — PqM·PqK rows, design-bounded ⇒
    * SessionCache-admissible; embedding_pq_codes and ann_pq both consume
    * them, each then paying one broadcast-argmin encode pass (the
    * kmeans-centroids lifecycle). The init seed is the PqK smallest
    * (md5(vec_id), vec_id) vectors — every subquantizer trains from the
    * SAME seed vectors' slices, which is the published recipe (one
    * training set, M independent subspace quantizers). The subvector
    * table is checkpointed for the KmIter+1 training scans and freed
    * eagerly once the codebook frame is materialized.
    */
  private[graft] def pqCodebook(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "pq-codebook") {
      trainPqCodebook(
        vecs(s, dir).filter(col("v").isNotNull).select("vec_id", "v"),
        s.sparkContext.defaultParallelism)
    }

  /** The keyed Lloyd training body over ANY (vec_id, v) frame — shared by
    * [[pqCodebook]] (raw vectors) and [[ivfpqCodebook]] (IVF residuals);
    * one spelling so the two codebooks' training recipes cannot drift.
    */
  private def trainPqCodebook(e0: DataFrame, parallelism: Int): DataFrame = {
    val e = e0.repartition(parallelism)
    val sub = graft.operators.Checkpoints.corpusScaled(pqSub(e))
    val w = Window.orderBy(col("h"), col("vec_id"))
    val seed = e.withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(PqK)
      .withColumn("cid", (row_number().over(w) - 1).cast("int"))
      .select(col("cid"), col("v"))
    var c = seed
      .select(col("cid"), explode(sequence(lit(0), lit(PqM - 1))).as("j"), col("v"))
      .select(col("j"), col("cid"),
        slice(col("v"), col("j") * lit(PqDsub) + lit(1), lit(PqDsub)).as("c"))
    for (_ <- 1 to KmIter) c = pqUpdate(pqAssign(sub, c))
    val trained = graft.operators.Checkpoints.fresh(c)
    graft.operators.Checkpoints.free(sub)
    trained
  }

  // ===== IVF-PQ (IVFADC — Jégou/Douze/Schmid, TPAMI 2011 §IV) =====
  // The coarse-partition + compressed-residual composition production ANN
  // actually deploys: PQ alone scans every code; IVF alone stores full
  // vectors. IVFADC stores each vector as (cell, PQ codes of its RESIDUAL
  // v − centroid(cell)) and answers a query by probing nprobe cells,
  // building one ADC table per (query, probed cell) in the probed cell's
  // residual frame, and scanning only those cells' codes. Residuals are
  // against the cell's min-vec_id medoid surrogate (cellReps — the
  // ann_ivf_nprobe determinism argument: a float centroid MEAN is
  // summation-order-dependent), and the subtraction is elementwise IEEE —
  // exactly rounded, so the whole chain mirrors in DuckDB.

  /** Residual relation (vec_id, label, v = vector − its cell's
    * representative). Broadcast join against the ≤ MaxCells rep frame —
    * one projection pass, no corpus shuffle.
    */
  private def ivfResiduals(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir).filter(col("label").isNotNull && col("v").isNotNull)
    e.join(broadcast(cellReps(e)), col("label") === col("cell"))
      .select(col("vec_id"), col("label"), vsub(col("v"), col("rv")).as("v"))
  }

  /** Train-once RESIDUAL codebooks (j, cid, c) — [[pqCodebook]]'s
    * lifecycle (PqM·PqK rows, SessionCache-admissible) over
    * [[ivfResiduals]]. Residual PQ is what makes the composition work:
    * residual magnitudes are small and centered, so PqK codewords spend
    * their resolution on within-cell structure instead of re-encoding
    * cell positions.
    */
  private[graft] def ivfpqCodebook(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "ivfpq-codebook") {
      trainPqCodebook(ivfResiduals(s, dir).select("vec_id", "v"),
        s.sparkContext.defaultParallelism)
    }

  /** Encode pass: every vector's PqM codes against the trained
    * codebooks — one broadcast argmin scan, no corpus shuffle.
    */
  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    pqAssign(
      pqSub(vecs(s, dir).filter(col("v").isNotNull).select("vec_id", "v")),
      pqCodebook(s, dir))

  /** Per-query keyed ADC table (qid, lut: MAP slot→lfp) over codebook
    * `cb` — the stage ann_pq, ann_pq_rerank and ann_pq_indexed share
    * (one spelling; slot = j·PqK + cid, keyed not positional because a
    * codeword can die in training).
    */
  private def pqLut(e: DataFrame, cb: DataFrame): DataFrame =
    pqLutOf(
      e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv")),
      cb)

  /** [[pqLut]] over an ARBITRARY (qid, qv) query frame — knn_join's
    * corpus-side serving makes every vector a query, so the ADC-table
    * stage is factored on the query frame, not the NQueries filter.
    * Linear: ×(PqM·PqK) expansion of the query set, grouped straight
    * back to one MAP row per query.
    */
  private def pqLutOf(q: DataFrame, cb: DataFrame): DataFrame =
    q
      .select(col("qid"), explode(sequence(lit(0), lit(PqM - 1))).as("j"), col("qv"))
      .select(col("qid"), col("j"),
        slice(col("qv"), col("j") * lit(PqDsub) + lit(1), lit(PqDsub)).as("qs"))
      .join(cb, Seq("j"))
      .select(col("qid"), (col("j") * PqK + col("cid")).as("slot"),
        floor(dist2(col("qs"), col("c")) * KmScale).cast("long").as("lfp"))
      .groupBy("qid")
      .agg(map_from_arrays(collect_list(col("slot")),
        collect_list(col("lfp"))).as("m"))
      // DENSE slot array (PqM·PqK entries, NULL at dead-codeword slots —
      // which no emitted code ever references): the serving scan's probe
      // becomes an O(1) codegen'd element_at instead of an O(PqK) keyed
      // map lookup inside an interpreted lambda. One 128-probe transform
      // per QUERY row buys PqM O(1) probes per CANDIDATE row — the side
      // of the trade that scales ([[adcSum]]).
      .select(col("qid"),
        transform(sequence(lit(0), lit(PqM * PqK - 1)),
          s0 => element_at(col("m"), s0)).as("lut"))

  /** Fully codegen'd ADC sum Σⱼ lut[j·PqK + codes[j]] over [[pqLutOf]]'s
    * DENSE slot array: PqM statically-unrolled element_at probes (both
    * 1-based) folded with `+` — ordinary Catalyst expressions end to
    * end, so the serving scan's hot loop stays inside whole-stage
    * codegen. The HOF spelling this replaced (aggregate ∘ zip_with over
    * a keyed MAP) ran interpreted with an O(PqK) scan per probe — knn
    * measured it at ~10× this form's cost on the corpus-side join.
    */
  private def adcSum(codes: Column, lut: Column): Column =
    (0 until PqM).map(j =>
      element_at(lut, element_at(codes, j + 1) + lit(j * PqK + 1)))
      .reduce(_ + _)

  // ===== persisted PQ index: the production build/serve split =====
  // The BUILD job is the expensive offline pass (train codebooks, encode
  // the corpus); what ships to the serving tier is the index — the
  // PqM·PqK-row codebook plus ONE packed BIGINT per vector, 64× smaller
  // than the float vectors. The SERVE side (ann_pq_indexed) reads ONLY
  // those parquet files plus the bounded query set; the raw embeddings
  // never leave the build job. Built once per (JVM, corpus dir, PqK)
  // under the system temp dir; parquet round-trips BIGINT and
  // ARRAY<DOUBLE> exactly, so index-served answers are bit-identical to
  // ann_pq's (the shared oracle string asserts exactly that).
  private val builtIndexes = scala.collection.mutable.Set[String]()

  private def pqIndexDir(s: SparkSession, dir: String): String = synchronized {
    // Pack-width envelope. embedding_pq_codes (the ORACLE-compared pack)
    // requires PqM·PqBits ≤ 63 because a negative packed BIGINT would
    // have to hash-match DuckDB's arithmetic. THIS pack never crosses
    // engines — it round-trips Spark→parquet→Spark only — so the ==64
    // case (PqK=256: the j=7 field occupies the sign bit, exercised by
    // the RecallProbe production-constants run) is admitted and is
    // exact by construction: the per-group SUM adds PqM contributions
    // with DISJOINT bit ranges (no carries, so the 64-bit pattern is
    // the bitwise OR even when the j=7 addend wraps negative), parquet
    // stores the INT64 pattern verbatim, and the decode's arithmetic
    // shiftright sign-extends only ABOVE the `& mask` window. Anything
    // past 64 bits would silently corrupt field j=7 — fail loudly.
    require(PqM * PqBits <= 64,
      s"pqIndexDir: PqM*PqBits=${PqM * PqBits} > 64 cannot pack one BIGINT" +
        " code word; a wider config needs a two-word layout")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out =
      s"${sys.props("java.io.tmpdir")}/graft-pq-index/$key-k$PqK"
    if (!builtIndexes.contains(out)) {
      pqCodebook(s, dir).write.mode("overwrite").parquet(s"$out/codebook")
      pqCodes(s, dir)
        .groupBy("vec_id")
        .agg(sum(expr(s"shiftleft(CAST(code AS BIGINT), j * $PqBits)"))
          .as("codes_packed"))
        .write.mode("overwrite").parquet(s"$out/codes")
      builtIndexes += out
    }
    out
  }

  /** The session-cached corpus kNN graph (qid, rank, nn_id, adc_fp) —
    * k·n rows, built once per (session, corpus): knn_join returns it,
    * knn_mutual_pairs self-joins it, ann_recall's ladder tier filters
    * it to the query window. The kmeans-centroids/PQ-codebook
    * lifecycle: the FIRST consumer in a session pays the build (the
    * bench's cold column carries it; min-rep floors show warm serving
    * cost), later consumers read k·n materialized rows.
    *
    * Inside the build, the cell assignment is checkpointed once — it
    * feeds the query frame, the probe rule, the LUT stage and the
    * member-cell join, and lazy it re-ran the K·dim argmin corpus pass
    * per consumer (the executed plan showed four) — then freed once the
    * graph frame is materialized.
    */
  private def knnGraph(s: SparkSession, dir: String): DataFrame =
    graft.operators.SessionCache.frame(s, dir, "knn-graph") {
      // Two-level coarse quantizer (see the km2 block): the super FINAL
      // assignment is checkpointed for the KmIter+1 sub-training scans
      // (lazy, each sub pass re-ran the super argmin corpus pass), the
      // final assignment for its four consumers (query frame, probe
      // rule, member-cell join side, spec access); both freed/retired
      // once the graph frame is materialized.
      val e = kmCorpus(s, dir)
      val (ks, kb) = km2K(e.count())
      val sc = km2SuperCentroids(s, dir, e, ks)
      val sa = graft.operators.Checkpoints.corpusScaled(
        kmAssign(e, sc).select(col("vec_id"), col("v"), col("cluster").as("scell")))
      val bc = km2SubCentroids(s, dir, sa, kb)
      val asg = graft.operators.Checkpoints.corpusScaled(
        km2SubAssign(sa, bc)
          .select(col("vec_id"), col("v"), col("scell"),
            (col("scell") * kb + col("sid")).cast("int").as("cluster")))
      graft.operators.Checkpoints.free(sa)
      val q = asg.select(col("vec_id").as("qid"), col("scell").as("qscell"),
        col("cluster").as("qcell"), col("v").as("qv"))
      // NProbe = 2 ⇒ the probe set is own cell + the nearest OTHER
      // cell — found HIERARCHICALLY, like the assignment: one argmin
      // over the (member-bearing) super-centroids for the nearest other
      // super, then one argmin over own super's subs ∪ that super's
      // subs with the own cell filtered out. (Ks + 2·Ksub)·dim per
      // query instead of K·dim — the same √K collapse the assignment
      // pays, and the candidate set always contains at least the
      // runner-up super's subs, so a boundary vector still sees its
      // across-the-border cell. ArgMinDist2 ties (d2, cid)
      // lexicographically = the oracle's ORDER BY d2, cid; the oracle
      // mirrors member-bearing ("has subs") supers with the same
      // semi-filter. A corpus whose surviving supers collapse to ONE
      // member-bearing cell has no s2 (argmin over an empty filtered
      // list is NULL, filtered here; the oracle's rn=1 row just does
      // not exist) — the probe set degrades to own-cell, identically
      // in both engines.
      require(NProbe == 2,
        s"NProbe=$NProbe: knn_join probes own cell + ONE argmin other; " +
          "an n-best probe rule needs a k-register ArgMinDist2 variant")
      val scm = sc.join(
        bc.select(col("scell").as("cid")).distinct(), Seq("cid"), "left_semi")
      val scmRow = scm.agg(collect_list(struct(col("cid"), col("c"))).as("cents"))
      val s2f = q.crossJoin(broadcast(scmRow))
        .select(col("qid"), col("qscell"), col("qcell"), col("qv"),
          graft.functions.VectorFunctions.argMinDist2(col("qv"),
            filter(col("cents"), ct => ct.getField("cid") =!= col("qscell")))
            .getField("cid").cast("int").as("s2"))
        .filter(col("s2").isNotNull)
      val bg = bc.groupBy("scell")
        .agg(collect_list(struct((col("scell") * kb + col("sid")).cast("int").as("cid"),
          col("c"))).as("subs"))
      val pr2 = s2f
        .join(broadcast(bg.select(col("scell").as("qscell"), col("subs").as("subs1"))),
          Seq("qscell"))
        .join(broadcast(bg.select(col("scell").as("s2"), col("subs").as("subs2"))),
          Seq("s2"))
        .select(col("qid"),
          graft.functions.VectorFunctions.argMinDist2(col("qv"),
            filter(concat(col("subs1"), col("subs2")),
              ct => ct.getField("cid") =!= col("qcell")))
            .getField("cid").cast("int").as("pcell"))
        .filter(col("pcell").isNotNull)
      val probes = pr2.union(q.select(col("qid"), col("qcell").as("pcell")))
      val idx = pqIndexDir(s, dir)
      val cb = s.read.parquet(s"$idx/codebook")
      val mask = (1L << PqBits) - 1
      val codes = s.read.parquet(s"$idx/codes")
        .select(col("vec_id"),
          expr(s"transform(sequence(0, ${PqM - 1}), " +
            s"j -> CAST(shiftright(codes_packed, j * $PqBits) & ${mask}L AS INT))")
            .as("codes"))
        .join(asg.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      val plut = probes.join(pqLutOf(q.select(col("qid"), col("qv")), cb),
        Seq("qid"))
      val topk = udaf(new graft.functions.TopK(KnnK))
      // corpusScaled, not fresh: the graph is k·n rows held for the WHOLE
      // session (SessionCache), and the Checkpoints policy stores
      // corpus-proportional residents serialized + disk-spilling — the
      // deserialized on-heap form is the measured r9/r10 heap-poisoning
      // mode at sf10+. It is re-scanned a handful of times per session;
      // serialized re-scan cost is noise next to the build.
      val graph = graft.operators.Checkpoints.corpusScaled(
        codes.join(plut,
            col("cluster") === col("pcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nn_id"),
            adcSum(col("codes"), col("lut")).as("adc_fp"))
          .groupBy("qid")
          .agg(topk((-col("adc_fp")).cast("double"), col("nn_id")).as("top"))
          .select(col("qid"), posexplode(col("top")))
          .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
            col("col.nn_id").as("nn_id"),
            (-col("col.sim")).cast("long").as("adc_fp")))
      graft.operators.Checkpoints.free(asg)
      graph
    }

  /** The mutual-kNN candidate pair frame (d1 < d2, adc_fp) — the body of
    * `knn_mutual_pairs`, factored so DedupQueries' `dedup_semantic_graph`
    * consumes the SAME composition as the catalog entry (a second
    * spelling of the mutuality join could drift).
    */
  private[queries] def mutualPairs(s: SparkSession, dir: String): DataFrame = {
    val k = knnGraph(s, dir).select(col("qid"), col("nn_id"), col("adc_fp"))
    k.as("a").join(k.as("b"),
        col("b.qid") === col("a.nn_id") && col("b.nn_id") === col("a.qid") &&
          col("a.qid") < col("a.nn_id"))
      .select(col("a.qid").as("d1"), col("a.nn_id").as("d2"),
        col("a.adc_fp").as("adc_fp"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- k-means cluster assignment over the embedding corpus ----
    // The clustering stage of the SemDeDup recipe (Abbas et al.,
    // arXiv:2303.03540 §3: k-means the embeddings, then dedup WITHIN
    // clusters) as a first-class operator: 3 pinned Lloyd iterations from
    // a hash-deterministic init, squared-L2 assignment (no norm, so zero
    // vectors need no NULL degrade), exact fixed-point centroid sums.
    // Emits the final assignment + its distance so downstream can both
    // partition (cluster) and rank within a cluster (d2).
    "embedding_kmeans" -> ((s, dir) =>
      kmeansAssign(s, dir)
        .select(col("vec_id"), col("cluster"), col("d2"))
        .orderBy("vec_id")),

    // ---- brute-force top-k for a bounded query set (broadcast queries) ----
    // KEPT in the window-ranked form deliberately, as the physical contrast
    // to ann_topk_agg / ann_ivf: Window.partitionBy(qid) has at most
    // NQueries distinct partitions, so every scored row funnels into ≤
    // NQueries tasks regardless of cluster size — fine for a bounded demo
    // query set, wrong at scale. The aggregator twins show the scale plan
    // (map-side partial_topk; exchange carries k·|queries|·partitions rows).
    "ann_bruteforce" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          cosine(col("qv"), col("v")).as("sim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nn_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("rank"), col("nn_id"))
        .orderBy("qid", "rank")
    }),

    // ---- brute-force top-k via the typed TopK aggregator ----
    // Same result as ann_bruteforce, different physical plan: the window
    // form shuffles every scored row to rank it; the Aggregator prunes to
    // k per (group, partition) in the partial aggregate, so the exchange
    // carries k·|queries|·partitions rows however large the corpus is.
    "ann_topk_agg" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopK(TopK))
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), cosine(col("qv"), col("v")).as("sim"),
          col("vec_id").as("nn_id"))
        .groupBy("qid")
        .agg(topk(col("sim"), col("nn_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("nn_id"))
        .orderBy("qid", "rank")
    }),

    // ---- contrastive hard-negative mining over the query set ----
    // The pair-mining step an embedding-training pipeline runs before a
    // contrastive fine-tune: for each query vector, the POSITIVE anchor
    // (nearest same-label neighbor, self excluded) and the HARD NEGATIVE
    // (nearest different-label neighbor — the confusable the loss needs).
    // ONE scored pass (corpus ⋈ broadcast(queries), cosine computed once
    // per row) feeds both picks as conditional max(struct(sim, -nn_id))
    // aggregates — ordering-equal to ROW_NUMBER() ... ORDER BY sim DESC,
    // nn_id — so the partial aggregate prunes to two candidate cells per
    // (query, partition) map-side and the exchange carries one row per
    // query however large the corpus. A query whose label has no second
    // member emits NULL positive fields (the oracle's LEFT JOIN mirror).
    "mine_hard_negatives" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("vec_id").as("nn_id"),
          (col("label") === col("qlabel")).as("same"),
          cosine(col("qv"), col("v")).as("sim"))
      scored.groupBy(col("qid"), col("qlabel"))
        .agg(
          max(when(col("same"),
            struct(col("sim"), (-col("nn_id")).as("nid")))).as("p"),
          max(when(!col("same"),
            struct(col("sim"), (-col("nn_id")).as("nid")))).as("n"))
        .select(col("qid"), col("qlabel").as("label"),
          (-col("p.nid")).as("pos_id"), col("p.sim").as("pos_sim"),
          (-col("n.nid")).as("neg_id"), col("n.sim").as("neg_sim"))
        .orderBy("qid")
    }),

    // ---- semi-hard negative mining (the FaceNet rule) ----
    // mine_hard_negatives' hardest negative can sit CLOSER than the
    // positive — the regime where triplet losses collapse; the semi-hard
    // rule keeps only negatives strictly farther than the positive anchor
    // (sim < pos_sim) and picks the hardest of those. Two linear passes:
    // the per-query positive similarity is a ≤ NQueries-row aggregate of
    // pass one, broadcast back into pass two's filter — never a
    // materialized corpus×queries frame. A query with no same-label
    // second member (no anchor) or no negative below its anchor drops
    // out — inner semantics, the loss has nothing to mine there. n_semi
    // (the surviving candidate count) is an exact integer diagnostic.
    "mine_semi_hard_negatives" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("v").as("qv"))
      def scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("vec_id").as("nn_id"),
          (col("label") === col("qlabel")).as("same"),
          cosine(col("qv"), col("v")).as("sim"))
      val pos = scored.filter(col("same"))
        .groupBy("qid").agg(max(col("sim")).as("pos_sim"))
      scored.filter(!col("same"))
        .join(broadcast(pos), Seq("qid"))
        .filter(col("sim") < col("pos_sim"))
        .groupBy(col("qid"), col("qlabel"), col("pos_sim"))
        .agg(max(struct(col("sim"), (-col("nn_id")).as("nid"))).as("m"),
          count(lit(1)).as("n_semi"))
        .select(col("qid"), col("qlabel").as("label"), col("pos_sim"),
          (-col("m.nid")).as("semi_id"), col("m.sim").as("semi_sim"),
          col("n_semi"))
        .orderBy("qid")
    }),

    // ---- LSH: sign-bit buckets, top-1 neighbor within bucket ----
    // Hot buckets (> MaxBucket members) are dropped before the self-join;
    // the rank-1 pick is max(struct(sim, -nn_id)) — ordering-equal to
    // ROW_NUMBER() ORDER BY sim DESC, nn_id — so the partial aggregate
    // prunes to one candidate per vec_id map-side instead of shuffling
    // every scored pair into a Window sort (the ann_topk_agg plan shape).
    "ann_lsh" -> ((s, dir) => {
      val e0 = vecs(s, dir).withColumn("bucket", signBucket(col("v"), LshBits))
        .filter(col("bucket").isNotNull) // align with the join's inferred filter
      val e = capBuckets(e0, Seq("bucket"))
      lshCandidateJoin(e, Seq("bucket"))
        .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
          col("b.vec_id").as("nn_id"), cosine(col("a.v"), col("b.v")).as("sim"))
        .groupBy("vec_id", "bucket")
        .agg(max(struct(col("sim").as("sim"), (-col("nn_id")).as("neg_id"))).as("best"))
        .select(col("vec_id"), col("bucket"), (-col("best.neg_id")).as("nn_id"))
        .orderBy("vec_id")
    }),

    // ---- multi-probe LSH: 4 independent 16-bit sign tables over the
    // 64 embedding dimensions, candidates unioned across tables. Recovers
    // the single-table form's boundary misses: two near-neighbors that
    // straddle a hyperplane in one table's dimensions still collide in
    // the other three. Same scale posture as ann_lsh — hot (table,
    // bucket) pairs capped, rank-1 via the partial-aggregable
    // max(struct(...)); a pair colliding in several tables just feeds
    // the same (sim, nn) candidate to the max twice. ----
    "ann_lsh_multiprobe" -> ((s, dir) => {
      // one materialization of the 4-table sign projection: capBuckets'
      // count/anti-join branches and both candidate-join aliases would
      // otherwise re-run it ~4×, with reuse left to the AQE coin flip
      // (the simhashPairs rationale)
      val tabs = graft.operators.Checkpoints.retire(
        graft.operators.Checkpoints.corpusScaled(signTables(vecs(s, dir))))
      val cold = capBuckets(tabs, Seq("tbl", "bucket"))
      lshCandidateJoin(cold, Seq("tbl", "bucket"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
          cosine(col("a.v"), col("b.v")).as("sim"))
        .groupBy("vec_id")
        .agg(max(struct(col("sim").as("sim"), (-col("nn_id")).as("neg_id"))).as("best"))
        .select(col("vec_id"), (-col("best.neg_id")).as("nn_id"))
        .orderBy("vec_id")
    }),

    // ---- IVF-style: top-k within the coarse cell, bounded query set ----
    // Ranks via the typed [[graft.functions.TopK]] aggregator (the
    // ann_topk_agg shape): the partial aggregate prunes to k per
    // (qid, partition) map-side, so the exchange carries
    // k·|queries|·partitions rows however large the probed cells are —
    // instead of a Window over ≤ NQueries partitions concentrating every
    // scored row into a handful of tasks (see ann_bruteforce, kept as the
    // documented contrast).
    // ---- IVF with multi-cell probing (nprobe > 1) ----
    // Single-cell IVF (ann_ivf) misses neighbors sitting just across a
    // cell boundary — the same failure ann_lsh_multiprobe fixes for sign
    // buckets. Production IVF ranks cells by query-to-centroid distance
    // and searches the nearest nprobe cells; a float centroid (cross-row
    // mean) is summation-order-dependent, so the cell REPRESENTATIVE here
    // is the cell's min-vec_id vector — a deterministic medoid surrogate
    // that keeps cell ranking, and hence the whole query, bit-exact on
    // both engines (a production deployment would precompute trained
    // centroids and broadcast them the same way). Probed cells = the
    // query's OWN assignment cell ∪ the top-(nprobe−1) rep-ranked OTHER
    // cells: with trained centroids the own cell is the top-ranked cell
    // by definition, but the medoid surrogate can misrank it — the
    // committed RECALL_sf{1,10} probes measured 0.75 vs single-cell
    // IVF's 1.0 on the duplicated replica geometry before this pin, a
    // structural violation of ivf ⊆ nprobe that the own-cell union
    // restores for ANY representative. Cell ranking and the final rank
    // both run through the TopK aggregator (partial-aggregable map-side
    // pruning, no window funnel); the rep-scoring join is a broadcast
    // nested-loop over |queries| × nlist rows, both factors design
    // constants (see [[MaxCells]]).
    "ann_ivf_nprobe" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopK(TopK))
      // label.isNotNull like embedding_outliers: the cell id feeds the
      // typed aggregator's primitive Long field — a null-label rep row
      // would CRASH at encoding, where the equi-join queries merely
      // drop it (results are identical either way; inner joins on label
      // can never emit a null-label row)
      val e = vecs(s, dir).filter(col("label").isNotNull)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qcell"),
          col("v").as("qv"))
      val reps = boundedReps("ann_ivf_nprobe", e)
      val probes = probedCells(q, reps)
        .join(q.select(col("qid"), col("qv")), Seq("qid"))
      e.join(broadcast(probes),
          col("label") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), cosine(col("qv"), col("v")).as("sim"),
          col("vec_id").as("nn_id"))
        .groupBy("qid")
        .agg(topk(col("sim"), col("nn_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("nn_id"))
        .orderBy("qid", "rank")
    }),

    // ---- metadata-predicated (filtered) ANN: search WITHIN a predicate ----
    // Every production similarity stack a training-data pipeline uses
    // supports filtered search ("nearest en-language documents", "within
    // this source/licence partition") — and the standard failure mode is
    // POST-filtering: take the unfiltered top-k, then filter, and return
    // fewer than k (or zero) results whenever the neighborhood is
    // predicate-sparse. The correct composition is PRE-filtering the
    // candidate scan (FAISS's IDSelector, the filtered-search mode of
    // every published vector store): here the predicate lives on the
    // documents table (lang = 'en'; vec_id ≡ doc_id, the SemDeDup
    // quality-election identity), reaches the documents parquet scan as
    // a pushed filter (EqualTo(lang, en) in PushedFilters — the spec
    // asserts it), and a LEFT-SEMI join intersects the cell-probed
    // corpus side with the qualifying-id set BEFORE any distance is
    // computed — so the TopK ranks qualifying vectors only, and every
    // query returns the exact filtered top-k of its probed cells. The
    // index structure (cells, reps, probe rule) stays UNFILTERED and
    // query-set-independent — one index serves every predicate; only
    // the scan side shrinks. Scale shape: the semi-join is a hash join
    // on the id key (no new quadratic door), the probe rule is
    // ann_ivf_nprobe's verbatim, and selectivity multiplies straight
    // through the scored-row count.
    "ann_filtered" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopK(TopK))
      val e = vecs(s, dir).filter(col("label").isNotNull)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qcell"),
          col("v").as("qv"))
      val reps = boundedReps("ann_filtered", e)
      val probes = probedCells(q, reps)
        .join(q.select(col("qid"), col("qv")), Seq("qid"))
      val keep = Tables(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("lang") === AnnFilterLang)
        .select(col("doc_id").as("vec_id"))
      e.join(keep, Seq("vec_id"), "left_semi")
        .join(broadcast(probes),
          col("label") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), cosine(col("qv"), col("v")).as("sim"),
          col("vec_id").as("nn_id"))
        .groupBy("qid")
        .agg(topk(col("sim"), col("nn_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("nn_id"))
        .orderBy("qid", "rank")
    }),

    // ---- embedding outlier flagging: distance to the cell representative ----
    // The embedding-side curation filter (the CLIP-score-percentile shape):
    // a vector far from its own cell's representative is mislabeled /
    // out-of-distribution, and curation drops the bottom decile. The
    // threshold is RELATIVE per cell (quality_filter's argument: absolute
    // cosine thresholds over/under-prune cells whose similarity
    // distributions sit differently). Deterministic end-to-end: the rep is
    // the min-vec_id medoid surrogate ([[cellReps]]), cosines are pinned-
    // fold-order doubles, and the per-cell P10 is the exact percentile —
    // one row per cell joined back (broadcast-sized); at data scale the
    // drop-in is approx_percentile (quality_filter_approx's trade, same
    // mergeable-sketch argument).
    "embedding_outliers" -> ((s, dir) => {
      val e = vecs(s, dir).filter(col("label").isNotNull)
      val scored = e.join(broadcast(cellReps(e)), col("label") === col("cell"))
        .select(col("vec_id"), col("label"),
          cosine(col("v"), col("rv")).as("sim_to_rep"))
      // counts-table + cumulative-window exact quantile (bit-equal to the
      // built-in aggregate, QuantilesSpec) — no boxed per-group value map
      val thr = graft.operators.Quantiles.exactByGroup(
        scored, "label", "sim_to_rep", Seq(0.1), Seq("p10"))
      scored.join(thr, Seq("label"))
        .select(col("vec_id"), col("label"), col("sim_to_rep"), col("p10"),
          (col("sim_to_rep") < col("p10")).as("is_outlier"))
        .orderBy("vec_id")
    }),

    "ann_ivf" -> ((s, dir) => {
      val topk = udaf(new graft.functions.TopK(TopK))
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qcell"), col("v").as("qv"))
      e.join(broadcast(q),
          col("label") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), cosine(col("qv"), col("v")).as("sim"),
          col("vec_id").as("nn_id"))
        .groupBy("qid")
        .agg(topk(col("sim"), col("nn_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("nn_id"))
        .orderBy("qid", "rank")
    }),

    // ---- PQ encode: each vector as PqM subspace codes ----
    // The compressed-index build: (vec_id, codes_packed, recon_err_fp).
    // codes_packed is the j-ordered codes packed into ONE integer —
    // code_j occupies bits [j·PqBits, (j+1)·PqBits): 8 × 4-bit codes =
    // the literal 4-byte representation of a 256-byte vector, and it is
    // what production would store (a fixed-width word, not a variable
    // array). It is also the driver-gate-safe spelling: the r12 ARRAY
    // form crashed the driver's pandas sort (unhashable ndarray cells —
    // the documented limitation TextQueries' inverted_index solves with
    // concat_ws). Subspace code sums never overlap (disjoint bit ranges,
    // so Σ = bitwise-OR) and the whole word fits a signed BIGINT (loud
    // require below). recon_err_fp is the fixed-point total quantization
    // error Σ_j floor(d2_j·2²⁰) — a BIGINT sum of BIGINTs, order-free,
    // so the oracle compare is exact (the float sum would be
    // partition-order-dependent).
    "embedding_pq_codes" -> ((s, dir) => {
      require(PqM * PqBits <= 63,
        s"packed code word needs ${PqM * PqBits} bits — exceeds a signed BIGINT; shrink PqK or emit two words")
      pqCodes(s, dir)
        .groupBy("vec_id")
        .agg(sum(expr(s"shiftleft(CAST(code AS BIGINT), j * $PqBits)")).as("codes_packed"),
          sum(floor(col("d2") * KmScale).cast("long")).as("recon_err_fp"))
        .orderBy("vec_id")
    }),

    // ---- PQ ADC search: rank-1 by asymmetric distance ----
    // Per query: ONE exact-distance table (query slice → every codeword,
    // PqM·PqK entries, fixed-point BIGINT) keyed slot = j·PqK + cid in a
    // MAP — keyed, not positional, because a codeword can die during
    // training and positional indexing would silently shift. The corpus
    // scan is then codes-only: PqM map probes + an integer sum per
    // (query, vector) — no float math touches the corpus, which is the
    // whole point of ADC at 100 TB (the index is 64× smaller than the
    // vectors and the scan is integer lookups). Rank-1 via min(struct)
    // is partial-aggregable (the ann_lsh posture); the broadcast side is
    // NQueries rows.
    "ann_pq" -> ((s, dir) => {
      val lut = pqLut(vecs(s, dir), pqCodebook(s, dir))
      val codes = pqCodes(s, dir)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("jc"))
        .select(col("vec_id"),
          transform(col("jc"), x => x.getField("code")).as("codes"))
      codes.join(broadcast(lut), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          adcSum(col("codes"), col("lut")).as("adc_fp"))
        .groupBy("qid")
        .agg(min(struct(col("adc_fp"), col("nn_id"))).as("b"))
        .select(col("qid"), col("b").getField("nn_id").as("nn_id"),
          col("b").getField("adc_fp").as("adc_fp"))
        .orderBy("qid")
    }),

    // ---- PQ codebook occupancy: vectors per (subspace, codeword) ----
    // The index-health relation (graft.PqStats prints its committed
    // JSON snapshot): a subspace whose live codeword count collapses
    // carries fewer than its log2(PqK) bits, which is how quantization
    // quality degrades — so occupancy is a first-class, oracle-checked
    // output, not just a probe. PqM·PqK rows, partial-agg'd count.
    "pq_occupancy" -> ((s, dir) =>
      pqCodes(s, dir)
        .groupBy("j", "code")
        .agg(count(lit(1)).as("n"))
        .orderBy("j", "code")),

    // ---- two-stage PQ retrieval: ADC shortlist, exact re-rank ----
    // The production deployment shape: the 4-bit integer scan cannot
    // rank finely (its pick sits at exact-rank ≤ ~50; see PqRerank), so
    // it NOMINATES — the map-side-pruning TopK aggregator keeps the
    // PqRerank best ADC candidates per query — and exact float distance
    // re-ranks only the shortlist: PqRerank full-vector reads per query
    // instead of a corpus scan. Shortlist membership is deterministic
    // (integer scores, nn_id ties) so both engines shortlist the SAME
    // set, and the re-ranked winner hash-matches.
    "ann_pq_rerank" -> ((s, dir) => {
      val e = vecs(s, dir)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val lut = pqLut(e, pqCodebook(s, dir))
      val codes = pqCodes(s, dir)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("jc"))
        .select(col("vec_id"),
          transform(col("jc"), x => x.getField("code")).as("codes"))
      val topk = udaf(new graft.functions.TopK(PqRerank))
      // TopK ranks (score DESC, id ASC); negated integer ADC = adc ASC.
      // A ≤ 2³⁰ long negates into an exactly-representable double.
      val shortlist = codes.join(broadcast(lut), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          adcSum(col("codes"), col("lut")).as("adc_fp"))
        .groupBy("qid")
        .agg(topk((-col("adc_fp")).cast("double"), col("nn_id")).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.nn_id").as("nn_id"))
      shortlist
        .join(e.select(col("vec_id").as("nn_id"), col("v")), Seq("nn_id"))
        .join(broadcast(q), Seq("qid"))
        .select(col("qid"), col("nn_id"), dist2(col("qv"), col("v")).as("d2"))
        .groupBy("qid")
        .agg(min(struct(col("d2"), col("nn_id"))).as("b"))
        .select(col("qid"), col("b").getField("nn_id").as("nn_id"),
          col("b").getField("d2").as("d2"))
        .orderBy("qid")
    }),

    // ---- PQ serving from the PERSISTED index (the build/serve split) ----
    // ann_pq re-derives codes from the embeddings every run; production
    // serves from a built artifact. This entry builds the index once per
    // session ([[pqIndexDir]]: codebook parquet + ONE packed BIGINT per
    // vector) and answers the query reading ONLY the index files plus
    // the bounded query set — the corpus embeddings are never scanned at
    // serve time, which is the point at 100 TB: the serving tier holds
    // 1/64th of the bytes. Codes unpack by shift/mask from the packed
    // word (exact integer ops); parquet round-trips BIGINT/ARRAY<DOUBLE>
    // exactly, so the answer is bit-identical to ann_pq — the oracle IS
    // ann_pq's string.
    "ann_pq_indexed" -> ((s, dir) => {
      val idx = pqIndexDir(s, dir)
      val cb = s.read.parquet(s"$idx/codebook")
      val mask = (1L << PqBits) - 1
      val codes = s.read.parquet(s"$idx/codes")
        .select(col("vec_id"),
          expr(s"transform(sequence(0, ${PqM - 1}), " +
            s"j -> CAST(shiftright(codes_packed, j * $PqBits) & ${mask}L AS INT))")
            .as("codes"))
      val lut = pqLut(vecs(s, dir), cb)
      codes.join(broadcast(lut), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          adcSum(col("codes"), col("lut")).as("adc_fp"))
        .groupBy("qid")
        .agg(min(struct(col("adc_fp"), col("nn_id"))).as("b"))
        .select(col("qid"), col("b").getField("nn_id").as("nn_id"),
          col("b").getField("adc_fp").as("adc_fp"))
        .orderBy("qid")
    }),

    // ---- corpus-side kNN join: EVERY vector's top-k, index-served ----
    // The composition semantic dedup and clustering consume at 100 TB:
    // not NQueries point lookups but the full kNN graph — each corpus
    // vector's KnnK nearest neighbors — built WITHOUT the all-pairs
    // join. Three bounded ingredients compose: (a) the TWO-LEVEL coarse
    // quantizer's cells (corpus-derived K ≈ n/KmCell UNCAPPED, so mean
    // cell size is a design CONSTANT and the cell-equi join stays linear
    // at any corpus — the r15 sf30 probe measured the capped flat
    // quantizer reopening the quadratic door at ×9.8 for 3× data — while
    // the √K-per-tier hierarchy keeps every per-row argmin at 2√K·dim,
    // so uncapping K does not move the quadratic into the Lloyd passes;
    // see the km2 block); (b) the IVFADC probe rule — own cell ∪ the
    // nearest other cell, found hierarchically (nearest other super,
    // then argmin over both supers' subs; rank by the SAME L2 the
    // assignment used; ties to the smaller cid) — so a vector sitting
    // on a cell boundary still sees its across-the-border neighbors;
    // (c) the PERSISTED PQ index
    // (ann_pq_indexed's build/serve split): the corpus side of the
    // candidate join reads ONLY packed codes, 64× smaller than the
    // vectors, and every distance is integer ADC probes of a per-query
    // LUT. The one corpus×corpus-shaped step — codes ⋈ probed cells —
    // is an EQUI-join on the cell id: candidates per query ≈
    // NProbe·KmCell by construction, the exchange is hash-partitioned
    // on a key with design-bounded multiplicity on the member side, and
    // the TopK aggregator prunes to KnnK map-side. Everything is exact
    // integer arithmetic after the LUT floor, so ranks mirror in SQL.
    "knn_join" -> ((s, dir) =>
      knnGraph(s, dir).orderBy("qid", "rank")),

    // ---- mutual-kNN candidate pairs: the kNN graph CONSUMED ----
    // The reason knn_join exists: semantic-dedup candidate generation
    // from the graph. A pair is a candidate iff each vector appears in
    // the OTHER's top-k (mutual-kNN — the standard symmetric filter: a
    // one-directional edge from a sparse region to a dense cluster's
    // edge is usually not a duplicate, and mutuality removes it without
    // any threshold constant). Composition cost on top of the graph:
    // the graph is k·n rows, checkpointed ONCE, and the mutuality test
    // is one equi-self-join on the (qid, nn_id) edge key — linear,
    // hash-partitioned, no new quadratic door. Output keeps the d1→d2
    // edge's integer ADC so downstream can rank candidate tightness.
    "knn_mutual_pairs" -> ((s, dir) =>
      mutualPairs(s, dir).orderBy("d1", "d2")),

    // ---- exact re-rank over the graph's edge set: the production recipe ----
    // Small-K PQ (the graph's serving constant) has measured rank errors —
    // recall@3 0.667 at sf10 (RECALL_sf10_r14) — and the corpus side
    // CANNOT buy resolution with PqK=256 (the per-query dense ADC table
    // would be 2048 slots ≈ 16 KB/row against every corpus row: the
    // abandoned r14 probe, SCALE.md note #2). The production fix is the
    // two-stage split every IVFADC+R deployment uses, applied to the
    // GRAPH: the quantized index only NOMINATES (here: the symmetrized
    // edge set, out-edges ∪ in-edges — in-edges matter because ADC error
    // is asymmetric per query LUT, so b may rank a highly while a's own
    // LUT misranked b), and exact full-vector distance DECIDES. Cost is
    // linear by construction: ≤ 2·KnnK·n candidate rows, two
    // hash-partitioned equi-joins to fetch the endpoint vectors, one
    // codegen'd Dist2 per row, TopK pruning to KnnK map-side — the
    // bounded-set re-rank, never a second corpus×corpus pass. Output
    // d2 is exact on both engines (identical operands, sequential
    // fold), and ann_recall ladders this tier: recall above the raw
    // graph's is the number that justifies shipping small-K codes.
    "knn_mutual_rerank" -> ((s, dir) => {
      val g = knnGraph(s, dir)
      val cand = g.select(col("qid"), col("nn_id"))
        .union(g.select(col("nn_id").as("qid"), col("qid").as("nn_id")))
        .distinct()
      val e = vecs(s, dir).filter(col("v").isNotNull)
        .select(col("vec_id"), col("v"))
      val topk = udaf(new graft.functions.TopK(KnnK))
      cand
        .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
        .join(e.select(col("vec_id").as("nn_id"), col("v").as("nv")), Seq("nn_id"))
        .select(col("qid"), col("nn_id"), dist2(col("qv"), col("nv")).as("d2"))
        // NaN guard (unreachable for finite embeddings, which the
        // generator produces — but TopK ranks NaN FIRST via sim DESC
        // while the oracle's ORDER BY d2 ASC ranks it LAST, so a
        // non-finite component would diverge across engines silently;
        // the cosine paths filter isnan for the same reason)
        .filter(!isnan(col("d2")))
        // sim = −d2: TopK keeps the k largest (ties to smaller nn_id) =
        // the k smallest exact distances; −(−d2) restores d2's bits
        // exactly (negation flips one sign bit; d2 = +0.0 for duplicate
        // vectors round-trips to +0.0)
        .groupBy("qid")
        .agg(topk(-col("d2"), col("nn_id")).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.nn_id").as("nn_id"), (-col("col.sim")).as("d2"))
        .orderBy("qid", "rank")
    }),

    // ---- IVF-PQ (IVFADC): probed coarse cells, residual-PQ ADC scan ----
    // The composition production ANN deploys at 100 TB: the corpus is
    // coarse-partitioned (IVF cells = `label`, the ann_ivf data model),
    // each vector stored as PqM codes of its RESIDUAL against its cell's
    // representative, and a query (a) probes own-cell ∪ top-(nprobe−1)
    // rep-ranked cells (the r12 recall-fix probe rule, shared stage), (b)
    // builds one integer ADC table per (query, probed cell) — the IVFADC
    // subtlety: distances must be computed in the PROBED cell's residual
    // frame, so the LUT keys on (qid, pcell), not qid — and (c) scans
    // ONLY the probed cells' codes: nprobe/nlist of the corpus touched,
    // integer map probes per row, no float math. That is the scale
    // argument over ann_pq (which scans every code) and over
    // ann_ivf_nprobe (which reads full vectors in probed cells); the
    // cost is approximation on both axes, which ann_recall measures.
    // All arithmetic inherits the PQ determinism contract (md5 seed,
    // d2-then-cid tie-break, fixed-point sums; residual subtraction is
    // elementwise IEEE — exactly rounded).
    "ann_ivfpq" -> ((s, dir) => {
      val e = vecs(s, dir).filter(col("label").isNotNull)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qcell"),
          col("v").as("qv"))
      val reps = boundedReps("ann_ivfpq", e)
      val cb = ivfpqCodebook(s, dir)
      // per (query, probed cell): the query's residual AGAINST THAT CELL
      val pres = probedCells(q, reps)
        .join(q.select(col("qid"), col("qv")), Seq("qid"))
        .join(broadcast(reps), col("pcell") === col("cell"))
        .select(col("qid"), col("pcell"), vsub(col("qv"), col("rv")).as("qres"))
      val qsub = pres
        .select(col("qid"), col("pcell"),
          explode(sequence(lit(0), lit(PqM - 1))).as("j"), col("qres"))
        .select(col("qid"), col("pcell"), col("j"),
          slice(col("qres"), col("j") * lit(PqDsub) + lit(1), lit(PqDsub)).as("qs"))
      val lut = qsub.join(cb, Seq("j"))
        .select(col("qid"), col("pcell"), (col("j") * PqK + col("cid")).as("slot"),
          floor(dist2(col("qs"), col("c")) * KmScale).cast("long").as("lfp"))
        .groupBy("qid", "pcell")
        .agg(map_from_arrays(collect_list(col("slot")),
          collect_list(col("lfp"))).as("lut"))
      // residual codes + owning cell: the label join-back is 1:1 on the
      // aggregation key, so the groupBy's vec_id partitioning is reused
      // on the left and the right moves only (vec_id, label) pairs
      val codes = pqAssign(pqSub(ivfResiduals(s, dir).select("vec_id", "v")), cb)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("jc"))
        .select(col("vec_id"),
          transform(col("jc"), x => x.getField("code")).as("codes"))
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      // the cell-equi broadcast join IS the "scan only probed cells"
      // step: everything outside the nprobe cells is filtered at the
      // join, before any ADC arithmetic
      codes.join(broadcast(lut),
          col("label") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          aggregate(
            zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
              (cd, j) => element_at(col("lut"), j * lit(PqK) + cd)),
            lit(0L), (acc, x) => acc + x).as("adc_fp"))
        .groupBy("qid")
        .agg(min(struct(col("adc_fp"), col("nn_id"))).as("b"))
        .select(col("qid"), col("b").getField("nn_id").as("nn_id"),
          col("b").getField("adc_fp").as("adc_fp"))
        .orderBy("qid")
    }),

    // ---- IVFADC+R: the IVF-PQ scan nominates, exact distance re-ranks ----
    // ann_pq_rerank's two-stage shape composed over ann_ivfpq's probed
    // scan (Jégou et al.'s IVFADC with re-ranking): the integer ADC
    // shortlists PqRerank candidates per query FROM THE PROBED CELLS
    // ONLY, then exact float distance re-reads just those full vectors.
    // At 100 TB the scan touches nprobe/nlist of the 64×-compressed
    // index and the re-rank reads PqRerank vectors per query — the
    // measured RECALL ladder shows the re-rank recovering the raw
    // 4-bit tier's misses (0.875 → 1.0 on the replica geometry).
    // Shortlist membership is deterministic (integer scores, nn_id
    // ties), so both engines shortlist the SAME set.
    "ann_ivfpq_rerank" -> ((s, dir) => {
      val e = vecs(s, dir).filter(col("label").isNotNull)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"), col("label").as("qcell"),
          col("v").as("qv"))
      val reps = boundedReps("ann_ivfpq_rerank", e)
      val cb = ivfpqCodebook(s, dir)
      val pres = probedCells(q, reps)
        .join(q.select(col("qid"), col("qv")), Seq("qid"))
        .join(broadcast(reps), col("pcell") === col("cell"))
        .select(col("qid"), col("pcell"), vsub(col("qv"), col("rv")).as("qres"))
      val qsub = pres
        .select(col("qid"), col("pcell"),
          explode(sequence(lit(0), lit(PqM - 1))).as("j"), col("qres"))
        .select(col("qid"), col("pcell"), col("j"),
          slice(col("qres"), col("j") * lit(PqDsub) + lit(1), lit(PqDsub)).as("qs"))
      val lut = qsub.join(cb, Seq("j"))
        .select(col("qid"), col("pcell"), (col("j") * PqK + col("cid")).as("slot"),
          floor(dist2(col("qs"), col("c")) * KmScale).cast("long").as("lfp"))
        .groupBy("qid", "pcell")
        .agg(map_from_arrays(collect_list(col("slot")),
          collect_list(col("lfp"))).as("lut"))
      val codes = pqAssign(pqSub(ivfResiduals(s, dir).select("vec_id", "v")), cb)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("j"), col("code")))).as("jc"))
        .select(col("vec_id"),
          transform(col("jc"), x => x.getField("code")).as("codes"))
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      val topk = udaf(new graft.functions.TopK(PqRerank))
      // TopK ranks (score DESC, id ASC); negated integer ADC = adc ASC
      // (≤ 2³⁰ longs negate into exactly-representable doubles)
      val shortlist = codes.join(broadcast(lut),
          col("label") === col("pcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nn_id"),
          aggregate(
            zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
              (cd, j) => element_at(col("lut"), j * lit(PqK) + cd)),
            lit(0L), (acc, x) => acc + x).as("adc_fp"))
        .groupBy("qid")
        .agg(topk((-col("adc_fp")).cast("double"), col("nn_id")).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.nn_id").as("nn_id"))
      shortlist
        .join(e.select(col("vec_id").as("nn_id"), col("v")), Seq("nn_id"))
        .join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid"))
        .select(col("qid"), col("nn_id"), dist2(col("qv"), col("v")).as("d2"))
        .groupBy("qid")
        .agg(min(struct(col("d2"), col("nn_id"))).as("b"))
        .select(col("qid"), col("b").getField("nn_id").as("nn_id"),
          col("b").getField("d2").as("d2"))
        .orderBy("qid")
    }),

    // ---- measured recall: every approximate tier vs the exact answer ----
    // The evaluation harness a production ANN deployment runs before
    // trusting an index: each tier's returned neighbors are scored
    // against the exact brute-force top-k. n_ret = rows the tier
    // returned, n_hits = those inside the exact top-k, hit_rate their
    // ratio — recall@k for the top-k tiers (ivf, nprobe), success-rate
    // for the rank-1 tiers (pq, pq_rerank); ann_topk_agg is the pinned
    // 1.0 sanity row (it IS the exact answer via another plan). The
    // exact reference is checkpointed (k·NQueries rows — bounded) so the
    // five branches probe ONE materialized frame instead of five
    // re-plans of the window ranking; every integer is exact, the one
    // division per row is the repo float rule.
    "ann_recall" -> ((s, dir) => {
      val bf = graft.operators.Checkpoints.retire(
        graft.operators.Checkpoints.fresh(
          queries("ann_bruteforce")(s, dir).select(col("qid"), col("nn_id"))))
      recallTiers.map { name =>
        // qid < NQueries is a no-op for the point-query tiers (their
        // output IS the query set) but restricts knn_join — whose graph
        // covers the corpus — to the laddered queries; Catalyst pushes
        // the predicate through the aggregate and down both join sides
        // (qid is the equi-key everywhere), so the tier costs a point
        // lookup, not the full graph.
        val m = queries(name)(s, dir).select(col("qid"), col("nn_id"))
          .filter(col("qid") < NQueries)
        val hits = m.join(bf, Seq("qid", "nn_id"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        val ret = m.agg(count(lit(1)).as("n_ret"))
        ret.crossJoin(hits)
          .select(lit(name).as("method"), col("n_ret"), col("n_hits"))
      }.reduce(_ union _)
        .select(col("method"), col("n_ret"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_ret").cast("double"))
            .as("hit_rate"))
        .orderBy("method")
    })
  )

  /** The tiers ann_recall scores — ONE list consumed by the Spark query,
    * the spliced oracle, and graft.RecallProbe, so adding a tier (as
    * ann_ivfpq did) updates all three in lockstep.
    */
  private[graft] val recallTiers: Seq[String] = Seq("ann_topk_agg", "ann_ivf",
    "ann_ivf_nprobe", "ann_pq", "ann_pq_rerank", "ann_ivfpq",
    "ann_ivfpq_rerank", "knn_join", "knn_mutual_rerank")

  private val eSql = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  // ===== k-means oracle: the Lloyd loop unrolled into CTEs =====
  // Same init rule (rn over (md5, vec_id)), same assignment tie-break
  // (ORDER BY d2, cid — the lexicographic struct sort's mirror), same
  // fixed-point update (floor to scaled BIGINT, exact integer sum, one
  // double division). DuckDB's zipped unnest(v)/unnest(range(...)) is the
  // posexplode mirror; `list(cv ORDER BY pos)` the sorted reassembly.

  private def kmAssignSql(name: String, centRel: String): String =
    s"""$name AS (SELECT vec_id, v, cluster, d2 FROM (
       |  SELECT vec_id, v, cid AS cluster, d2,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM (SELECT e.vec_id, e.v, c.cid, ${dist2Sql("e.v", "c.c")} AS d2
       |        FROM e CROSS JOIN $centRel c)) WHERE rn = 1)""".stripMargin

  private def kmUpdateSql(name: String, asgRel: String): String =
    s"""$name AS (SELECT cid, list(cv ORDER BY pos) AS c FROM (
       |  SELECT cid, pos, CAST(fsum AS DOUBLE) / (CAST(n AS DOUBLE) * $KmScale.0) AS cv FROM (
       |    SELECT cluster AS cid, i AS pos,
       |           sum(CAST(floor(x * $KmScale.0) AS BIGINT)) AS fsum, count(*) AS n
       |    FROM (SELECT cluster, unnest(v) AS x, unnest(range(1, len(v)+1)) AS i FROM $asgRel)
       |    GROUP BY 1, 2)) GROUP BY cid)""".stripMargin

  /** The full CTE chain `e, c0, a1, c1, …, a{KmIter+1}` — shared with
    * dedup_semantic_kmeans' oracle (DedupQueries), whose cells are
    * a{KmIter+1}'s clusters.
    */
  private[queries] def kmeansCtes: String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         |c0 AS (SELECT CAST(rn - 1 AS INTEGER) AS cid, v AS c FROM (
         |        SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM e)
         |       WHERE rn <= (SELECT LEAST($KmMaxK, GREATEST($KmMinK,
         |                      (count(*) + ${KmCell - 1}) // $KmCell)) FROM e))""".stripMargin)
    for (i <- 1 to KmIter + 1) {
      sb.append(",\n").append(kmAssignSql(s"a$i", s"c${i - 1}"))
      if (i <= KmIter) sb.append(",\n").append(kmUpdateSql(s"c$i", s"a$i"))
    }
    sb.toString
  }

  private[queries] val kmFinalAsg = s"a${KmIter + 1}"

  // ===== two-level coarse quantizer oracle: both Lloyd tiers unrolled =====
  // The km2 block's SQL twin, prefixed g* (spliced FLAT next to pqCtes —
  // no nested WITH, so the chain evaluates once). Same derivations from
  // the same COUNT(*) (integer // arithmetic; CEIL∘SQRT exactly rounded
  // on an integer-valued double), same init rule per tier (rn over
  // (md5, vec_id), PARTITIONED BY scell at the sub tier), same
  // assignment tie-break (d2 then id), same fixed-point update.
  // Reuses kmAssignSql/kmUpdateSql verbatim for the super tier.

  private def km2SubAssignSql(name: String, subRel: String): String =
    s"""$name AS (SELECT vec_id, v, scell, sid, d2 FROM (
       |  SELECT vec_id, v, scell, sid, d2,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn
       |  FROM (SELECT x.vec_id, x.v, x.scell, b.sid, ${dist2Sql("x.v", "b.c")} AS d2
       |        FROM gsa x JOIN $subRel b ON b.scell = x.scell)) WHERE rn = 1)""".stripMargin

  private def km2SubUpdateSql(name: String, asgRel: String): String =
    s"""$name AS (SELECT scell, sid, list(cv ORDER BY pos) AS c FROM (
       |  SELECT scell, sid, pos, CAST(fsum AS DOUBLE) / (CAST(n AS DOUBLE) * $KmScale.0) AS cv FROM (
       |    SELECT scell, sid, i AS pos,
       |           sum(CAST(floor(x * $KmScale.0) AS BIGINT)) AS fsum, count(*) AS n
       |    FROM (SELECT scell, sid, unnest(v) AS x, unnest(range(1, len(v)+1)) AS i FROM $asgRel)
       |    GROUP BY 1, 2, 3)) GROUP BY scell, sid)""".stripMargin

  /** The full two-level chain: gkb (derived Ks/Ksub), super Lloyd
    * gs0/ga1/…/ga{KmIter+1}, sub init gb0, sub Lloyd gq1/…/gq{KmIter+1},
    * final assignment gz (vec_id, v, scell, cluster = scell·Ksub + sid).
    * References `e` (pqCtes' corpus relation — the same not-null filters
    * kmCorpus applies).
    */
  private def km2Ctes: String = {
    val sb = new StringBuilder
    sb.append(
      s"""gk AS (SELECT GREATEST($KmMinK, (count(*) + ${KmCell - 1}) // $KmCell) AS k FROM e),
         |gkb AS (SELECT k, ks, (k + ks - 1) // ks AS kb FROM (
         |        SELECT k, CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) AS ks FROM gk)),
         |gs0 AS (SELECT CAST(rn - 1 AS INTEGER) AS cid, v AS c FROM (
         |        SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM e)
         |       WHERE rn <= (SELECT ks FROM gkb))""".stripMargin)
    for (i <- 1 to KmIter + 1) {
      sb.append(",\n").append(kmAssignSql(s"ga$i", s"gs${i - 1}"))
      if (i <= KmIter) sb.append(",\n").append(kmUpdateSql(s"gs$i", s"ga$i"))
    }
    sb.append(",\n").append(
      s"""gsa AS (SELECT vec_id, v, cluster AS scell FROM ga${KmIter + 1}),
         |gb0 AS (SELECT scell, CAST(rn - 1 AS INTEGER) AS sid, v AS c FROM (
         |        SELECT scell, v, ROW_NUMBER() OVER (PARTITION BY scell
         |                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM gsa)
         |       WHERE rn <= (SELECT kb FROM gkb))""".stripMargin)
    for (i <- 1 to KmIter + 1) {
      sb.append(",\n").append(km2SubAssignSql(s"gq$i", s"gb${i - 1}"))
      if (i <= KmIter) sb.append(",\n").append(km2SubUpdateSql(s"gb$i", s"gq$i"))
    }
    sb.append(",\n").append(
      s"""gz AS (SELECT vec_id, v, scell,
         |         CAST(scell * (SELECT kb FROM gkb) + sid AS INTEGER) AS cluster
         |       FROM gq${KmIter + 1})""".stripMargin)
    sb.toString
  }

  // ===== PQ oracle: the keyed (per-subspace) Lloyd loop unrolled =====
  // kmeansCtes with a j key everywhere: DuckDB's 1-based inclusive list
  // slice v[a:b] is the `slice` mirror; the init takes the SAME seed
  // vec_ids for every subspace (rn over (md5, vec_id), as in c0); the
  // assignment tie-break and fixed-point update are kmAssignSql /
  // kmUpdateSql with (vec_id, j) / (j, cid) keys.
  private def pqAssignSql(name: String, centRel: String): String =
    s"""$name AS (SELECT vec_id, j, sv, code, d2 FROM (
       |  SELECT vec_id, j, sv, cid AS code, d2,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
       |  FROM (SELECT s.vec_id, s.j, s.sv, c.cid, ${dist2Sql("s.sv", "c.c")} AS d2
       |        FROM sub s JOIN $centRel c ON s.j = c.j)) WHERE rn = 1)""".stripMargin

  private def pqUpdateSql(name: String, asgRel: String): String =
    s"""$name AS (SELECT j, cid, list(cv ORDER BY pos) AS c FROM (
       |  SELECT j, cid, pos, CAST(fsum AS DOUBLE) / (CAST(n AS DOUBLE) * $KmScale.0) AS cv FROM (
       |    SELECT j, code AS cid, i AS pos,
       |           sum(CAST(floor(x * $KmScale.0) AS BIGINT)) AS fsum, count(*) AS n
       |    FROM (SELECT j, code, unnest(sv) AS x, unnest(range(1, len(sv)+1)) AS i FROM $asgRel)
       |    GROUP BY 1, 2, 3)) GROUP BY j, cid)""".stripMargin

  private[queries] def pqCtes: String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |      WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         |sub AS (SELECT vec_id, j, v[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS sv
         |        FROM e CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)),
         |p0 AS (SELECT s.j, d.cid, s.sv AS c FROM (
         |        SELECT vec_id, CAST(rn - 1 AS INTEGER) AS cid FROM (
         |          SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |          FROM e)
         |        WHERE rn <= $PqK) d JOIN sub s ON s.vec_id = d.vec_id)""".stripMargin)
    for (i <- 1 to KmIter + 1) {
      sb.append(",\n").append(pqAssignSql(s"q$i", s"p${i - 1}"))
      if (i <= KmIter) sb.append(",\n").append(pqUpdateSql(s"p$i", s"q$i"))
    }
    sb.toString
  }

  private[queries] val pqFinalAsg = s"q${KmIter + 1}"
  private[queries] val pqFinalBook = s"p$KmIter"

  // ===== IVF-PQ oracle: the residual chain, then the keyed Lloyd loop =====
  // pqCtes with the training frame swapped: `r` is the residual relation
  // (vector − its cell's min-vec_id representative, elementwise — vsubSql
  // mirrors zip_with subtraction exactly), `sub`/`p0` are built FROM r, and
  // the loop reuses pqAssignSql/pqUpdateSql verbatim (they reference `sub`
  // by name). The e/rid/reps fragments are ann_ivf_nprobe's.
  private def ivfpqCtes: String = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |      WHERE vec_id IS NOT NULL AND label IS NOT NULL AND embedding IS NOT NULL),
         |rid AS (SELECT label, min(vec_id) AS rid FROM e GROUP BY 1),
         |reps AS (SELECT e.label AS cell, e.v AS rv FROM e JOIN rid ON e.vec_id = rid.rid),
         |r AS (SELECT e.vec_id, e.label, ${vsubSql("e.v", "reps.rv")} AS v
         |      FROM e JOIN reps ON e.label = reps.cell),
         |sub AS (SELECT vec_id, j, v[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS sv
         |        FROM r CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)),
         |p0 AS (SELECT s.j, d.cid, s.sv AS c FROM (
         |        SELECT vec_id, CAST(rn - 1 AS INTEGER) AS cid FROM (
         |          SELECT vec_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |          FROM r)
         |        WHERE rn <= $PqK) d JOIN sub s ON s.vec_id = d.vec_id)""".stripMargin)
    for (i <- 1 to KmIter + 1) {
      sb.append(",\n").append(pqAssignSql(s"q$i", s"p${i - 1}"))
      if (i <= KmIter) sb.append(",\n").append(pqUpdateSql(s"p$i", s"q$i"))
    }
    sb.toString
  }

  /** The per-method oracle strings; [[oracles]] adds ann_recall, which
    * SPLICES these as sub-selects (nested WITH — DuckDB-legal inside a
    * parenthesized subquery) so the recall harness and the tiers it
    * measures can never drift apart.
    */
  /** knn_join's full oracle string — a val because three strings splice
    * it: the catalog entry, knn_mutual_rerank (symmetrized edges), and
    * [[knnMutualPairsSql]] (the mutual filter, also consumed by
    * DedupQueries' dedup_semantic_graph mirror).
    */
  private lazy val knnJoinSql: String =
    s"""WITH $pqCtes,
       |$km2Ctes,
       |asg AS (SELECT vec_id, cluster FROM gz),
       |q AS (SELECT vec_id AS qid, scell AS qscell, cluster AS qcell, v AS qv FROM gz),
       |gbc AS (SELECT b.scell, CAST(b.scell * g.kb + b.sid AS INTEGER) AS cid, b.c
       |        FROM gb$KmIter b CROSS JOIN gkb g),
       |gsc AS (SELECT cid, c FROM gs$KmIter
       |        WHERE cid IN (SELECT DISTINCT scell FROM gbc)),
       |gns AS (SELECT qid, cid AS s2 FROM (
       |    SELECT q.qid, s.cid,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |                              ORDER BY ${dist2Sql("q.qv", "s.c")}, s.cid) AS rn
       |    FROM q CROSS JOIN gsc s WHERE s.cid <> q.qscell) WHERE rn = 1),
       |gnp AS (SELECT qid, cid AS pcell FROM (
       |    SELECT q.qid, b.cid,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid
       |                              ORDER BY ${dist2Sql("q.qv", "b.c")}, b.cid) AS rn
       |    FROM q JOIN gns ON gns.qid = q.qid
       |    JOIN gbc b ON (b.scell = q.qscell OR b.scell = gns.s2) AND b.cid <> q.qcell)
       |    WHERE rn = 1),
       |probes AS (SELECT qid, pcell FROM gnp
       |           UNION ALL SELECT qid, qcell AS pcell FROM q),
       |qs AS (SELECT vec_id AS qid, j, v[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS qsv
       |       FROM e CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)),
       |lut AS (SELECT q2.qid, c.j, c.cid,
       |               CAST(floor(${dist2Sql("q2.qsv", "c.c")} * $KmScale.0) AS BIGINT) AS lfp
       |        FROM qs q2 JOIN $pqFinalBook c ON q2.j = c.j),
       |adc AS (SELECT p.qid, cd.vec_id AS nn_id, CAST(SUM(l.lfp) AS BIGINT) AS adc_fp
       |        FROM $pqFinalAsg cd
       |        JOIN asg a ON a.vec_id = cd.vec_id
       |        JOIN probes p ON p.pcell = a.cluster AND cd.vec_id <> p.qid
       |        JOIN lut l ON l.qid = p.qid AND l.j = cd.j AND l.cid = cd.code
       |        GROUP BY 1, 2)
       |SELECT qid, CAST(rn AS INT) AS rank, nn_id, adc_fp FROM (
       |  SELECT qid, nn_id, adc_fp,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fp, nn_id) AS rn
       |  FROM adc) WHERE rn <= $KnnK ORDER BY qid, rank""".stripMargin

  /** knn_mutual_pairs' oracle — the mutual filter over the spliced knn
    * graph (one nested WITH — the recall-splice precedent). Shared with
    * DedupQueries so dedup_semantic_graph's mirror consumes the SAME
    * candidate relation string.
    */
  private[queries] lazy val knnMutualPairsSql: String =
    // k AS MATERIALIZED: the self-join references k twice and DuckDB
    // inlines CTEs by default — without the hint the whole spliced knn
    // chain (kmeans unroll + PQ train) evaluates twice
    s"""WITH k AS MATERIALIZED (SELECT qid, nn_id, adc_fp FROM ($knnJoinSql) x)
       |SELECT a.qid AS d1, a.nn_id AS d2, a.adc_fp
       |FROM k a JOIN k b ON b.qid = a.nn_id AND b.nn_id = a.qid
       |                 AND a.qid < a.nn_id
       |ORDER BY d1, d2""".stripMargin

  private lazy val oraclesBase: Map[String, String] = Map(
    "embedding_kmeans" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cluster, d2 FROM $kmFinalAsg ORDER BY vec_id""".stripMargin,

    // Both SUMs cast back to BIGINT: DuckDB's SUM(BIGINT) widens to
    // HUGEINT, which pandas materializes as float64 — numerically equal
    // to Spark's int64 but a different representation, so the driver's
    // dtype-sensitive hash would fail (the r12 ann_pq defect).
    "embedding_pq_codes" ->
      s"""WITH $pqCtes
         |SELECT vec_id,
         |       CAST(SUM(CAST(code AS BIGINT) << (j * $PqBits)) AS BIGINT) AS codes_packed,
         |       CAST(SUM(CAST(floor(d2 * $KmScale.0) AS BIGINT)) AS BIGINT) AS recon_err_fp
         |FROM $pqFinalAsg GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "ann_pq" ->
      s"""WITH $pqCtes,
         |qs AS (SELECT vec_id AS qid, j, v[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS qsv
         |       FROM e CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)
         |       WHERE vec_id < $NQueries),
         |lut AS (SELECT q.qid, c.j, c.cid,
         |               CAST(floor(${dist2Sql("q.qsv", "c.c")} * $KmScale.0) AS BIGINT) AS lfp
         |        FROM qs q JOIN $pqFinalBook c ON q.j = c.j),
         |adc AS (SELECT l.qid, cd.vec_id AS nn_id, CAST(SUM(l.lfp) AS BIGINT) AS adc_fp
         |        FROM $pqFinalAsg cd
         |        JOIN lut l ON l.j = cd.j AND l.cid = cd.code AND cd.vec_id <> l.qid
         |        GROUP BY 1, 2)
         |SELECT qid, nn_id, adc_fp FROM (
         |  SELECT qid, nn_id, adc_fp,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fp, nn_id) AS rn
         |  FROM adc) WHERE rn = 1 ORDER BY qid""".stripMargin,

    // j cast to INTEGER: DuckDB's range() yields BIGINT where Spark's
    // sequence(0, PqM-1) yields INT — numerically equal, but the strict
    // dtype gate (and potentially the driver's hash) sees int64 vs int32.
    "pq_occupancy" ->
      s"""WITH $pqCtes
         |SELECT CAST(j AS INTEGER) AS j, code, count(*) AS n FROM $pqFinalAsg
         |GROUP BY 1, 2 ORDER BY j, code""".stripMargin,

    "ann_pq_rerank" ->
      s"""WITH $pqCtes,
         |qs AS (SELECT vec_id AS qid, j, v[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS qsv
         |       FROM e CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)
         |       WHERE vec_id < $NQueries),
         |lut AS (SELECT q.qid, c.j, c.cid,
         |               CAST(floor(${dist2Sql("q.qsv", "c.c")} * $KmScale.0) AS BIGINT) AS lfp
         |        FROM qs q JOIN $pqFinalBook c ON q.j = c.j),
         |adc AS (SELECT l.qid, cd.vec_id AS nn_id, CAST(SUM(l.lfp) AS BIGINT) AS adc_fp
         |        FROM $pqFinalAsg cd
         |        JOIN lut l ON l.j = cd.j AND l.cid = cd.code AND cd.vec_id <> l.qid
         |        GROUP BY 1, 2),
         |short AS (SELECT qid, nn_id FROM (
         |  SELECT qid, nn_id,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fp, nn_id) AS rn
         |  FROM adc) WHERE rn <= $PqRerank),
         |rer AS (SELECT s.qid, s.nn_id, ${dist2Sql("q.v", "c.v")} AS d2
         |        FROM short s JOIN e q ON q.vec_id = s.qid
         |                     JOIN e c ON c.vec_id = s.nn_id)
         |SELECT qid, nn_id, d2 FROM (
         |  SELECT qid, nn_id, d2,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nn_id) AS rn
         |  FROM rer) WHERE rn = 1 ORDER BY qid""".stripMargin,

    // Probe ranking mirrors probedCells (cosine DESC, cell — the TopK
    // aggregator's ordering); the ADC join pins each corpus code row to
    // its OWN cell's LUT via l.pcell = r.label, the (query, probed cell)
    // keying the IVFADC recipe requires. Both SUM casts are the
    // HUGEINT→BIGINT convention.
    "ann_ivfpq" ->
      s"""WITH $ivfpqCtes,
         |q AS (SELECT vec_id AS qid, label AS qcell, v AS qv FROM e WHERE vec_id < $NQueries),
         |ranked AS (SELECT qid, cell,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY ${cosineSql("qv", "rv")} DESC, cell) AS crk
         |  FROM q CROSS JOIN reps WHERE cell <> qcell),
         |probes AS (SELECT qid, cell AS pcell FROM ranked WHERE crk <= ${NProbe - 1}
         |           UNION ALL SELECT qid, qcell AS pcell FROM q),
         |pres AS (SELECT p.qid, p.pcell, ${vsubSql("q.qv", "reps.rv")} AS qres
         |         FROM probes p JOIN q ON q.qid = p.qid
         |                       JOIN reps ON reps.cell = p.pcell),
         |qs AS (SELECT qid, pcell, j, qres[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS qsv
         |       FROM pres CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)),
         |lut AS (SELECT x.qid, x.pcell, c.j, c.cid,
         |               CAST(floor(${dist2Sql("x.qsv", "c.c")} * $KmScale.0) AS BIGINT) AS lfp
         |        FROM qs x JOIN $pqFinalBook c ON x.j = c.j),
         |adc AS (SELECT l.qid, cd.vec_id AS nn_id, CAST(SUM(l.lfp) AS BIGINT) AS adc_fp
         |        FROM $pqFinalAsg cd
         |        JOIN r ON r.vec_id = cd.vec_id
         |        JOIN lut l ON l.j = cd.j AND l.cid = cd.code
         |                  AND l.pcell = r.label AND cd.vec_id <> l.qid
         |        GROUP BY 1, 2)
         |SELECT qid, nn_id, adc_fp FROM (
         |  SELECT qid, nn_id, adc_fp,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fp, nn_id) AS rn
         |  FROM adc) WHERE rn = 1 ORDER BY qid""".stripMargin,

    "ann_ivfpq_rerank" ->
      s"""WITH $ivfpqCtes,
         |q AS (SELECT vec_id AS qid, label AS qcell, v AS qv FROM e WHERE vec_id < $NQueries),
         |ranked AS (SELECT qid, cell,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY ${cosineSql("qv", "rv")} DESC, cell) AS crk
         |  FROM q CROSS JOIN reps WHERE cell <> qcell),
         |probes AS (SELECT qid, cell AS pcell FROM ranked WHERE crk <= ${NProbe - 1}
         |           UNION ALL SELECT qid, qcell AS pcell FROM q),
         |pres AS (SELECT p.qid, p.pcell, ${vsubSql("q.qv", "reps.rv")} AS qres
         |         FROM probes p JOIN q ON q.qid = p.qid
         |                       JOIN reps ON reps.cell = p.pcell),
         |qs AS (SELECT qid, pcell, j, qres[(j*$PqDsub+1):(j*$PqDsub+$PqDsub)] AS qsv
         |       FROM pres CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)),
         |lut AS (SELECT x.qid, x.pcell, c.j, c.cid,
         |               CAST(floor(${dist2Sql("x.qsv", "c.c")} * $KmScale.0) AS BIGINT) AS lfp
         |        FROM qs x JOIN $pqFinalBook c ON x.j = c.j),
         |adc AS (SELECT l.qid, cd.vec_id AS nn_id, CAST(SUM(l.lfp) AS BIGINT) AS adc_fp
         |        FROM $pqFinalAsg cd
         |        JOIN r ON r.vec_id = cd.vec_id
         |        JOIN lut l ON l.j = cd.j AND l.cid = cd.code
         |                  AND l.pcell = r.label AND cd.vec_id <> l.qid
         |        GROUP BY 1, 2),
         |short AS (SELECT qid, nn_id FROM (
         |  SELECT qid, nn_id,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_fp, nn_id) AS rn
         |  FROM adc) WHERE rn <= $PqRerank),
         |rer AS (SELECT s.qid, s.nn_id, ${dist2Sql("x.v", "c.v")} AS d2
         |        FROM short s JOIN e x ON x.vec_id = s.qid
         |                     JOIN e c ON c.vec_id = s.nn_id)
         |SELECT qid, nn_id, d2 FROM (
         |  SELECT qid, nn_id, d2,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nn_id) AS rn
         |  FROM rer) WHERE rn = 1 ORDER BY qid""".stripMargin,

    // pqCtes is the OUTER chain (its e/codebook/codes feed the ADC); the
    // k-means cell machinery nests twice as parenthesized sub-WITHs (the
    // recall-splice precedent — two CTE chains both defining `e` cannot
    // share one WITH; the nested e is textually identical to the outer
    // one, so the relations agree).
    "knn_join" -> knnJoinSql,

    // symmetrize the graph's edges (UNION dedupes = the Spark distinct),
    // exact dist2 on the endpoint vectors, top-KnnK per vector.
    // k AS MATERIALIZED: both union arms read k (the knnMutualPairsSql
    // inlining note)
    "knn_mutual_rerank" ->
      s"""WITH k AS MATERIALIZED (SELECT qid, nn_id FROM ($knnJoinSql) x),
         |cand AS (SELECT qid, nn_id FROM k
         |         UNION SELECT nn_id AS qid, qid AS nn_id FROM k),
         |e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |       WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         |rer AS (SELECT c.qid, c.nn_id, ${dist2Sql("q.v", "n.v")} AS d2
         |        FROM cand c JOIN e2 q ON q.vec_id = c.qid
         |                    JOIN e2 n ON n.vec_id = c.nn_id)
         |SELECT qid, CAST(rn AS INT) AS rank, nn_id, d2 FROM (
         |  SELECT qid, nn_id, d2,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nn_id) AS rn
         |  FROM rer WHERE NOT isnan(d2)) WHERE rn <= $KnnK ORDER BY qid, rank""".stripMargin,

    "ann_bruteforce" ->
      s"""WITH e AS ($eSql),
         |scored AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nn_id, ${cosineSql("q.v", "e.v")} AS sim
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id)
         |SELECT qid, rank, nn_id FROM (
         |  SELECT qid, nn_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,

    "ann_topk_agg" ->
      s"""WITH e AS ($eSql),
         |scored AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nn_id, ${cosineSql("q.v", "e.v")} AS sim
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id)
         |SELECT qid, rank, nn_id FROM (
         |  SELECT qid, nn_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,

    "mine_hard_negatives" ->
      s"""WITH e AS ($eSql),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS qlabel, e.vec_id AS nn_id,
         |         e.label = q.label AS same, ${cosineSql("q.v", "e.v")} AS sim
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id),
         |qs AS (SELECT DISTINCT qid, qlabel FROM scored),
         |p AS (SELECT qid, nn_id AS pos_id, sim AS pos_sim,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS rn
         |      FROM scored WHERE same),
         |n AS (SELECT qid, nn_id AS neg_id, sim AS neg_sim,
         |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS rn
         |      FROM scored WHERE NOT same)
         |SELECT qs.qid, qs.qlabel AS label, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim
         |FROM qs LEFT JOIN (SELECT * FROM p WHERE rn = 1) p USING (qid)
         |        LEFT JOIN (SELECT * FROM n WHERE rn = 1) n USING (qid)
         |ORDER BY qs.qid""".stripMargin,

    "mine_semi_hard_negatives" ->
      s"""WITH e AS ($eSql),
         |scored AS (
         |  SELECT q.vec_id AS qid, q.label AS qlabel, e.vec_id AS nn_id,
         |         e.label = q.label AS same, ${cosineSql("q.v", "e.v")} AS sim
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id),
         |pos AS (SELECT qid, MAX(sim) AS pos_sim FROM scored WHERE same GROUP BY 1),
         |sh AS (SELECT s.qid, s.qlabel, s.nn_id, s.sim, p.pos_sim
         |       FROM scored s JOIN pos p USING (qid)
         |       WHERE NOT s.same AND s.sim < p.pos_sim)
         |SELECT qid, qlabel AS label, pos_sim, semi_id, semi_sim, n_semi FROM (
         |  SELECT qid, qlabel, pos_sim, nn_id AS semi_id, sim AS semi_sim,
         |         CAST(COUNT(*) OVER (PARTITION BY qid) AS BIGINT) AS n_semi,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS rn
         |  FROM sh) WHERE rn = 1 ORDER BY qid""".stripMargin,

    "ann_lsh" ->
      s"""WITH e0 AS (SELECT vec_id, v, ${signBucketSql("v", LshBits)} AS bucket FROM ($eSql)),
         |hot AS (SELECT bucket FROM e0 GROUP BY 1 HAVING count(*) > $MaxBucket),
         |e AS (SELECT * FROM e0
         |      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.bucket = e0.bucket)),
         |pairs AS (
         |  SELECT a.vec_id, a.bucket, b.vec_id AS nn_id, ${cosineSql("a.v", "b.v")} AS sim
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |SELECT vec_id, bucket, nn_id FROM (
         |  SELECT vec_id, bucket, nn_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rn
         |  FROM pairs) WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "ann_lsh_multiprobe" -> {
      val tabArms = (0 until Probes).map(t =>
        s"SELECT vec_id, v, $t AS tbl, ${signBucketAtSql("v", t * LshBits, LshBits)} AS bucket FROM e")
        .mkString("\n  UNION ALL ")
      s"""WITH e AS ($eSql),
         |tabs AS (
         |  $tabArms),
         |hot AS (SELECT tbl, bucket FROM tabs GROUP BY 1, 2 HAVING count(*) > $MaxBucket),
         |cold AS (SELECT * FROM tabs tb
         |         WHERE NOT EXISTS (SELECT 1 FROM hot h
         |                           WHERE h.tbl = tb.tbl AND h.bucket = tb.bucket)),
         |pairs AS (
         |  SELECT a.vec_id, b.vec_id AS nn_id, ${cosineSql("a.v", "b.v")} AS sim
         |  FROM cold a JOIN cold b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |SELECT vec_id, nn_id FROM (
         |  SELECT vec_id, nn_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rn
         |  FROM pairs) WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },

    "ann_ivf_nprobe" ->
      // rep = the cell's min-vec_id vector; cell rank window mirrors the
      // TopK aggregator's (csim DESC, cell) ordering exactly. The WHERE
      // mirrors the Spark side's vec_id/label isNotNull filters (as in
      // embedding_outliers): without it a NULL-label vector would mint a
      // NULL-cell representative on the oracle side only and could
      // consume one of the NProbe probe slots
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings
         |           WHERE vec_id IS NOT NULL AND label IS NOT NULL),
         |rid AS (SELECT label, min(vec_id) AS rid FROM e GROUP BY 1),
         |reps AS (SELECT e.label AS cell, e.v AS rv FROM e JOIN rid ON e.vec_id = rid.rid),
         |q AS (SELECT vec_id AS qid, label AS qcell, v AS qv FROM e WHERE vec_id < $NQueries),
         |ranked AS (SELECT qid, qv, cell,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY ${cosineSql("qv", "rv")} DESC, cell) AS crk
         |  FROM q CROSS JOIN reps WHERE cell <> qcell),
         |probes AS (SELECT qid, qv, cell FROM ranked WHERE crk <= ${NProbe - 1}
         |           UNION ALL SELECT qid, qv, qcell AS cell FROM q),
         |scored AS (SELECT p.qid, e.vec_id AS nn_id, ${cosineSql("p.qv", "e.v")} AS sim
         |  FROM probes p JOIN e ON e.label = p.cell AND e.vec_id <> p.qid)
         |SELECT qid, rank, nn_id FROM (
         |  SELECT qid, nn_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,

    // nprobe's chain with the candidate side SEMI-joined to the
    // predicate's id set before scoring (pre-filtering, never
    // post-filtering); index structure (reps, probe rule) unfiltered
    "ann_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings
         |           WHERE vec_id IS NOT NULL AND label IS NOT NULL),
         |rid AS (SELECT label, min(vec_id) AS rid FROM e GROUP BY 1),
         |reps AS (SELECT e.label AS cell, e.v AS rv FROM e JOIN rid ON e.vec_id = rid.rid),
         |q AS (SELECT vec_id AS qid, label AS qcell, v AS qv FROM e WHERE vec_id < $NQueries),
         |f AS (SELECT e.* FROM e WHERE EXISTS (
         |        SELECT 1 FROM documents d
         |        WHERE d.doc_id = e.vec_id AND d.doc_id IS NOT NULL
         |          AND d.lang = '$AnnFilterLang')),
         |ranked AS (SELECT qid, qv, cell,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |                       ORDER BY ${cosineSql("qv", "rv")} DESC, cell) AS crk
         |  FROM q CROSS JOIN reps WHERE cell <> qcell),
         |probes AS (SELECT qid, qv, cell FROM ranked WHERE crk <= ${NProbe - 1}
         |           UNION ALL SELECT qid, qv, qcell AS cell FROM q),
         |scored AS (SELECT p.qid, f.vec_id AS nn_id, ${cosineSql("p.qv", "f.v")} AS sim
         |  FROM probes p JOIN f ON f.label = p.cell AND f.vec_id <> p.qid)
         |SELECT qid, rank, nn_id FROM (
         |  SELECT qid, nn_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,

    "embedding_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings
         |           WHERE vec_id IS NOT NULL AND label IS NOT NULL),
         |rid AS (SELECT label, min(vec_id) AS rid FROM e GROUP BY 1),
         |reps AS (SELECT e.label AS cell, e.v AS rv FROM e JOIN rid ON e.vec_id = rid.rid),
         |scored AS (SELECT e.vec_id, e.label, ${cosineSql("e.v", "reps.rv")} AS sim_to_rep
         |           FROM e JOIN reps ON e.label = reps.cell),
         |thr AS (SELECT label, quantile_cont(sim_to_rep, 0.1) AS p10
         |        FROM scored GROUP BY 1)
         |SELECT s.vec_id, s.label, s.sim_to_rep, t.p10,
         |       s.sim_to_rep < t.p10 AS is_outlier
         |FROM scored s JOIN thr t USING (label)
         |ORDER BY vec_id""".stripMargin,

    "ann_ivf" ->
      s"""WITH e AS ($eSql),
         |scored AS (
         |  SELECT q.vec_id AS qid, e.vec_id AS nn_id, ${cosineSql("q.v", "e.v")} AS sim
         |  FROM e q JOIN e ON q.vec_id < $NQueries AND e.label = q.label AND e.vec_id <> q.vec_id)
         |SELECT qid, rank, nn_id FROM (
         |  SELECT qid, nn_id, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nn_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin
  )

  def oracles: Map[String, String] = oraclesBase +
    // index-served PQ must be bit-identical to compute-from-vectors PQ:
    // the oracle IS ann_pq's string
    ("ann_pq_indexed" -> oraclesBase("ann_pq")) +
    // the mutual filter over the spliced knn graph (one nested WITH —
    // the recall-splice precedent; the string is [[knnMutualPairsSql]],
    // shared with dedup_semantic_graph's mirror)
    ("knn_mutual_pairs" -> knnMutualPairsSql) + ("ann_recall" -> {
    val ctes = recallTiers.zipWithIndex.map { case (n, i) =>
      // the qid filter mirrors the Spark tier restriction (a no-op for
      // the point-query tiers, the ladder window for knn_join)
      s"m$i AS (SELECT qid, nn_id FROM (${oraclesBase(n)}) t WHERE qid < $NQueries)"
    }.mkString(",\n")
    val rows = recallTiers.zipWithIndex.map { case (n, i) =>
      s"""SELECT '$n' AS method,
         |  CAST((SELECT COUNT(*) FROM m$i) AS BIGINT) AS n_ret,
         |  CAST((SELECT COUNT(*) FROM m$i WHERE EXISTS (
         |    SELECT 1 FROM bf WHERE bf.qid = m$i.qid AND bf.nn_id = m$i.nn_id)) AS BIGINT) AS n_hits""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH bf AS (SELECT qid, nn_id FROM (${oraclesBase("ann_bruteforce")}) t),
       |$ctes
       |SELECT method, n_ret, n_hits,
       |  CAST(n_hits AS DOUBLE) / CAST(n_ret AS DOUBLE) AS hit_rate
       |FROM ($rows)
       |ORDER BY method""".stripMargin
  })
}
