package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls

class UrlsSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercase, default ports, fragments, utm strip") {
    assert(canon("HTTP://Example.COM:80/A/b?x=1#frag") ==
      Seq("http://example.com/A/b?x=1"))
    assert(canon("https://Host.example:443/") == Seq("https://host.example/"))
    // non-default port survives; path case survives
    assert(canon("http://h:8080/P") == Seq("http://h:8080/P"))
    // https keeps :80 (not its default)
    assert(canon("https://h:80/") == Seq("https://h:80/"))
    // tracking params stripped wherever they sit; order of the rest kept
    assert(canon("http://h/p?utm_source=a&id=2&utm_campaign=b&z=1&gclid=g") ==
      Seq("http://h/p?id=2&z=1"))
    // all params stripped -> no '?'
    assert(canon("http://h/p?utm_source=a") == Seq("http://h/p"))
    // empty path -> '/'
    assert(canon("http://h?x=1") == Seq("http://h/?x=1"))
    assert(canon("http://h") == Seq("http://h/"))
    // non-URLs pass through
    assert(canon("not a url", "  padded  ") == Seq("not a url", "padded"))
  }

  test("dedupByUrl collapses canonical-equal variants to the lowest id") {
    val df = Seq(
      (3L, "http://A.com/x?utm_source=f"),
      (1L, "HTTP://a.com:80/x#top"),
      (2L, "http://a.com/x"),
      (9L, "http://b.com/y")).toDF("id", "u")
    val got = Urls.dedupByUrl(df, col("id"), col("u"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("http://a.com/x", 1L, 3L), ("http://b.com/y", 9L, 1L)))
  }
}
