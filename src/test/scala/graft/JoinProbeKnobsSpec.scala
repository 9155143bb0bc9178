package graft

import org.scalatest.funsuite.AnyFunSuite

/** The join-strategy probe knobs (ADVICE r16 #2): a set knob must be
  * validated at read (a typo fails at session build naming the env var,
  * never surfacing as a downstream Spark conf error) and must map to the
  * exact Spark conf the A/B claims to drive. A default environment must
  * yield NO knobs — the bench artifact's "knobs" field is absent on an
  * official run precisely because this seq is empty.
  */
class JoinProbeKnobsSpec extends AnyFunSuite {

  test("default environment yields no knobs") {
    assert(EngineSession.joinProbeKnobsFrom(Map.empty).isEmpty)
    assert(EngineSession.joinProbeKnobsFrom(Map("UNRELATED" -> "x")).isEmpty)
  }

  test("set knobs map to their Spark confs with the given values") {
    val ks = EngineSession.joinProbeKnobsFrom(Map(
      "SPARK_GRAFT_PREFER_SMJ" -> "false",
      "SPARK_GRAFT_SHJ_THRESHOLD" -> "256m"))
    assert(ks === Seq(
      ("SPARK_GRAFT_PREFER_SMJ", "spark.sql.join.preferSortMergeJoin", "false"),
      ("SPARK_GRAFT_SHJ_THRESHOLD",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")))
  }

  test("byte-size forms accepted for the SHJ threshold") {
    for (v <- Seq("0", "64m", "1g", "268435456", "512K", "64mb"))
      assert(EngineSession.joinProbeKnobsFrom(
        Map("SPARK_GRAFT_SHJ_THRESHOLD" -> v)).nonEmpty, v)
  }

  test("typos fail loudly, naming the env var") {
    val e1 = intercept[IllegalArgumentException] {
      EngineSession.joinProbeKnobsFrom(Map("SPARK_GRAFT_PREFER_SMJ" -> "ture"))
    }
    assert(e1.getMessage.contains("SPARK_GRAFT_PREFER_SMJ"))
    val e2 = intercept[IllegalArgumentException] {
      EngineSession.joinProbeKnobsFrom(Map("SPARK_GRAFT_SHJ_THRESHOLD" -> "256 megabytes"))
    }
    assert(e2.getMessage.contains("SPARK_GRAFT_SHJ_THRESHOLD"))
  }
}
