package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (Test/fork=true → one JVM). */
object TestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.local("4")
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = TestSession.spark
  def sf: String = TestSession.sf0001
}
