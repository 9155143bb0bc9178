package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (suites share it;
  * `Test / fork := true` gives the forked JVM the JDK17 add-opens flags).
  */
object SparkTestBase {
  lazy val spark: SparkSession = EngineSession.local("4", "graft-test")

  val Sf0001 = "/root/testdata/sf0.001"
}
