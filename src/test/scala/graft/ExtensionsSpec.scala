package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.collation.CollationCodec

/** SQL-surface integration: the native expressions are callable from
  * plain SQL once GraftExtensions is installed. Uses its own session
  * (extensions are fixed at session build time). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would return the suite-shared session and silently skip
    // the extensions; clear the handles so a NEW session (sharing the
    // SparkContext) is built with GraftExtensions installed.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    sessionBuilder.getOrCreate()
  }

  private def sessionBuilder = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)

  test("collation_key and dot_product are callable from SQL") {
    val r = spark.sql(
      """SELECT collation_key('a') AS ck,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
        |""".stripMargin).collect().head
    assert(r.getAs[Array[Byte]]("ck")
      .sameElements(CollationCodec.encodeScala("a")))
    assert(r.getDouble(1) == 11.0)
  }

  test("collation_key_locale is callable from SQL and groups accents") {
    spark.sql(
      """SELECT * FROM VALUES ('zebra'), ('été'), ('eager'), ('fig') AS t(k)
        |""".stripMargin).createOrReplaceTempView("accents")
    val got = spark.sql(
      "SELECT k FROM accents ORDER BY collation_key_locale(k)")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("eager", "été", "fig", "zebra"))
    // UTF-8 mode would banish 'été' past 'zebra'
    val utf8 = spark.sql(
      "SELECT k FROM accents ORDER BY collation_key(k)")
      .collect().map(_.getString(0)).toSeq
    assert(utf8 == Seq("eager", "fig", "zebra", "été"))
  }

  test("SQL ORDER BY collation_key sorts numbers before strings") {
    spark.sql(
      """SELECT * FROM VALUES ('b'), ('2'), ('a'), ('10') AS t(k)
        |""".stripMargin).createOrReplaceTempView("mixed")
    // string keys: '10' < '2' bytewise — the collation of strings
    val got = spark.sql(
      "SELECT k FROM mixed ORDER BY collation_key(k)")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("10", "2", "a", "b"))
  }
}
