package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sparkext.GraftExtensions

/** The custom expressions must be reachable from plain SQL when the
  * session is built with the graft extension point. */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A session with GraftExtensions, sharing TestSpark's SparkContext.
    * getOrCreate returns the existing default session (ignoring new
    * extensions), so the default is cleared for the builder call and
    * restored immediately — the new session is isolated; nothing leaks
    * into the other suites. */
  private lazy val spark: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try
      SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("dot_product is callable from SQL") {
    val d = spark.sql("SELECT dot_product(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
      .head().getDouble(0)
    assert(d == 32.0)
  }

  test("double_to_scaled is callable from SQL and matches decimal cast") {
    val r = spark.sql(
      "SELECT double_to_scaled(CAST(12.345678 AS DOUBLE), 6) AS v, CAST(CAST(12.345678 AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS ref")
      .head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("double_to_scaled rejects non-literal scale") {
    val e = intercept[Exception] {
      spark.sql("SELECT double_to_scaled(1.0, CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("INT"))
  }

  test("extension functions stay invisible to sessions built without it") {
    val plain = TestSpark.spark
    val e = intercept[Exception] {
      plain.sql("SELECT dot_product(array(1d), array(1d))").collect()
    }
    assert(e.getMessage.contains("UNRESOLVED_ROUTINE") ||
      e.getMessage.toLowerCase.contains("cannot resolve"))
  }
}
