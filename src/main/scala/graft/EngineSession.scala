package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured engine session (the Spark
  * analog of the reference's `config.json` bootstrap, `master.py:215-216`).
  *
  * Session-level settings live HERE, not inside table loaders or query
  * builders — mutating `spark.conf` mid-query is a session-global side
  * effect that is neither thread-safe nor scoped (see Tables scaladoc for
  * the one conf the testdata requires).
  */
object EngineSession {

  /** Confs any session using this library's table loaders must carry.
    * `nanosAsLong`: the driver-generated `events.parquet` stores
    * TIMESTAMP(NANOS), which Spark otherwise refuses to read; with this
    * conf it surfaces as nanos-since-epoch LONG and [[Tables]] rebuilds a
    * proper TimestampType column (same ns→us truncation DuckDB applies).
    */
  /** `ansi.enabled=false`: Spark 4 defaults to ANSI mode, where x/0 and
    * out-of-bounds element_at THROW; the DuckDB oracle (and classic Spark)
    * return NULL. A tokenless document would otherwise crash text_quality
    * (0/0), a single-row group agg_variance (n-1=0), and a zero-norm
    * vector the cosine queries — legal inputs must degrade to NULL rows,
    * not kill the job.
    */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.ansi.enabled" -> "false")

  /** Builder carrying the engine's required confs and extensions but NO
    * master or parallelism settings — for cluster deployment, where
    * spark-submit supplies the master and shuffle parallelism scales with
    * executors. `local` builds on this for the single-node harness.
    */
  def configured(appName: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      // Runtime bloom-filter join pruning: when a shuffle join's small side
      // carries a selective filter, build a bloom over its join keys and
      // push a might_contain probe into the BIG side's scan — at 100 TB
      // this prunes most of a fact scan before the exchange. This PINS the
      // Spark 4 default (already true) so the engine's posture survives a
      // cluster-level or future-default change; thresholds stay at the
      // production defaults (creation side <= 10 MB, probe side >= 10 GB),
      // so it only engages at the scale it pays for. ScaleOpsSpec lowers
      // them to prove the injection fires.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Join-strategy probe knobs (round-16 A/B; guide §3.1): sort-merge is
    // Spark's robust default, but a shuffled-hash join skips both sorts
    // when one side's per-partition build fits in memory. Env-overridable
    // so the experiment is a same-binary A/B (the PqK/MinEstJaccard
    // precedent) — strategy choice never changes results, only plans.
    // Defaults are Spark's own unless the measured A/B justifies a flip.
    // Round-17 verdict on maxShuffledHashJoinLocalMapThreshold as a
    // DEFAULT: REFUTED (OPTIMIZATION_r17.md #2). Controlled-pressure A/B
    // (-Xmx14g at sf10): the default SMJ path completes the join-heavy
    // list by spilling; the 256m-threshold arm heap-OOMs the session at
    // text_dedup_token_spans — the rewrite trades graceful spill for a
    // dead executor exactly when memory is tight, and buys nothing
    // reproducible quiet. The knob stays for right-sized deployments.
    // ADVICE r16 #2: a knob left in the ambient environment would silently
    // change plans for ANY entrypoint, so a set knob (a) is validated at
    // read — a typo must fail at session build with a message naming the
    // env var, not surface as a Spark conf error — and (b) WARNs loudly,
    // so an A/B arm can never be mistaken for a default run. Bench also
    // records set knobs in its JSON summary (see [[Bench]]).
    joinProbeKnobs.foreach { case (env, conf, v) =>
      System.err.println(s"[engine] WARN: $env=$v is set — overriding $conf "
        + "(join-strategy probe knob; NOT a default run)")
      b.config(conf, v)
    }
    requiredConfs.foreach { case (k, v) => b.config(k, v) }
    b
  }

  /** The join-strategy probe knobs that are SET in this environment, as
    * (env var, spark conf, validated value) — empty on a default run.
    * Validation happens here (once per read) so a typo fails at session
    * build, loudly, naming the env var: `SPARK_GRAFT_PREFER_SMJ` must be
    * a boolean literal, `SPARK_GRAFT_SHJ_THRESHOLD` a Spark byte string
    * (digits + optional k/m/g[b] suffix).
    */
  def joinProbeKnobs: Seq[(String, String, String)] = joinProbeKnobsFrom(sys.env)

  /** [[joinProbeKnobs]] over a caller-supplied environment (unit-testable:
    * `sys.env` cannot be set in-process). */
  private[graft] def joinProbeKnobsFrom(env: Map[String, String]): Seq[(String, String, String)] = {
    val smj = env.get("SPARK_GRAFT_PREFER_SMJ").map { v =>
      require(v == "true" || v == "false",
        s"SPARK_GRAFT_PREFER_SMJ must be 'true' or 'false', got '$v'")
      ("SPARK_GRAFT_PREFER_SMJ", "spark.sql.join.preferSortMergeJoin", v)
    }
    val shj = env.get("SPARK_GRAFT_SHJ_THRESHOLD").map { v =>
      require(v.matches("(?i)[0-9]+[kmgt]?b?"),
        s"SPARK_GRAFT_SHJ_THRESHOLD must be a byte size like '64m' or '268435456', got '$v'")
      ("SPARK_GRAFT_SHJ_THRESHOLD",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", v)
    }
    smj.toSeq ++ shj.toSeq
  }

  /** Local-mode builder with the engine's standard tuning: shuffle
    * parallelism = core count (not the 200 default — right-sized for a
    * single node; on a real cluster this scales with executor count), AQE
    * on for runtime coalescing/skew handling.
    */
  def local(cores: String, appName: String): SparkSession = {
    val shufflePartitions =
      if (cores == "*") Runtime.getRuntime.availableProcessors().toString else cores
    val spark = configured(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
