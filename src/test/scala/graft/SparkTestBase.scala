package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every Spark-backed spec (sessions are
  * expensive; scalatest runs suites in one JVM under `Test / fork`).
  */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cores = 4)
}
