package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def norm(url: String): (String, String, String) = {
    val r = Seq(url).toDF("u")
      .select(TextAnalysis.urlHost(col("u")).as("h"),
        TextAnalysis.urlDomain(col("u")).as("d"),
        TextAnalysis.normalizeUrl(col("u")).as("n"))
      .head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("host lowercases and strips default ports only") {
    assert(norm("HTTPS://API.Example.COM:443/x")._1 == "api.example.com")
    assert(norm("http://h.example.com:80/x")._1 == "h.example.com")
    // a real non-default port survives; :8080 is NOT :80
    assert(norm("http://h.example.com:8080/x")._1 == "h.example.com:8080")
  }

  test("domain is the last-two-label cut") {
    assert(norm("http://a.b.example.com/x")._2 == "example.com")
    assert(norm("http://example.com/x")._2 == "example.com")
    // single-label host (intranet) has no registered domain
    assert(norm("http://localhost/x")._2 == "")
  }

  test("normalizeUrl: case-folds scheme+host, keeps path case, drops fragment") {
    assert(norm("HTTP://WWW.Ex.COM/Path/File?Q=1#frag")._3 ==
      "http://www.ex.com/Path/File?Q=1")
    // bare host gains the canonical slash
    assert(norm("https://ex.com")._3 == "https://ex.com/")
    // non-URLs pass through untouched, never null
    assert(norm("not a url at all")._3 == "not a url at all")
  }

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(TextAnalysis.canonicalUrl(col("u")).as("c"))
      .head().getString(0)

  test("canonicalUrl: drops tracking params, sorts survivors, cuts fragments") {
    // utm_* and fbclid vanish; remaining params sort; fragment cut
    assert(canon("https://Ex.COM/p?utm_source=x&b=2&a=1&fbclid=zz#top") ==
      "https://ex.com/p?a=1&b=2")
    // param order no longer splits one page into two canonical URLs
    assert(canon("https://ex.com/p?b=2&a=1") == canon("https://ex.com/p?a=1&b=2"))
    // all params tracking -> bare path, no dangling '?'
    assert(canon("https://ex.com/p?utm_campaign=c&gclid=g") == "https://ex.com/p")
    // no path -> canonical slash; path case preserved
    assert(canon("HTTPS://EX.com?a=1") == "https://ex.com/?a=1")
    assert(canon("https://ex.com/CaseSensitive/Path") ==
      "https://ex.com/CaseSensitive/Path")
    // non-URLs pass through untouched
    assert(canon("just text") == "just text")
  }
}
