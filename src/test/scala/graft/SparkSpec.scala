package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across suites (sbt runs suites in one JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("4")
}
