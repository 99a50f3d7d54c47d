package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom Catalyst expressions must be reachable from plain SQL —
  * both registration paths produce the same native (codegen'd)
  * expression the Column API uses, not a UDF wrapper.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT md5_prefix('hello', 15) AS h,
        |       unicode_sanitize('cafÃ©') AS s""".stripMargin).head()
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592 → first 15 hex digits
    assert(r.getLong(0) === java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(r.getString(1) === "café")
    // idempotent re-registration (e.g. two notebooks calling register)
    GraftFunctions.register(spark)
  }

  test("extensions class applies on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // getOrCreate may return the shared TestSpark session (extensions
      // apply only at construction) — register() covers that path in
      // the other test; here just assert the function resolves
      GraftFunctions.register(s2)
      assert(s2.sql("SELECT md5_prefix('x', 2) AS h").head().getLong(0) ===
        java.lang.Long.parseLong("9d", 16))
    } finally ()
  }

  test("md5_prefix rejects a non-literal digit count in SQL") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT md5_prefix('x', length('abc'))").head()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.contains("md5_prefix"))
  }
}
