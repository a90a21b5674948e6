package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for Spark specs: one shared local session per JVM (suites run in the
  * same forked JVM; getOrCreate dedups).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4", "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
