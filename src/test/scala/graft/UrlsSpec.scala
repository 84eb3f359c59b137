package graft

import org.apache.spark.sql.functions._
import graft.llm.Urls

/** URL canonicalization rules, one assertion per rule, plus the dedup
  * motivation (two spellings of the same page collapse). */
class UrlsSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Urls.canonicalize(col("u")).as("c")).head.getString(0)

  test("scheme and host lowercase; www and default ports stripped") {
    assert(canon("HTTP://WWW.Site.COM:80/a") == "http://site.com/a")
    assert(canon("https://www.site.com:443/a") == "https://site.com/a")
    // non-default port survives
    assert(canon("http://site.com:8080/a") == "http://site.com:8080/a")
  }

  test("fragment dropped, trailing slashes stripped, root path empty") {
    assert(canon("http://site.com/a/b/#frag") == "http://site.com/a/b")
    assert(canon("http://site.com/") == "http://site.com")
    assert(canon("http://site.com") == "http://site.com")
  }

  test("tracking params dropped, the rest sorted byte-wise") {
    assert(canon("http://site.com/p?b=2&utm_source=x&a=1&fbclid=z&gclid=1")
      == "http://site.com/p?a=1&b=2")
    // all params tracking → no '?' at all
    assert(canon("http://site.com/p?utm_campaign=x") == "http://site.com/p")
  }

  test("schemeless input passes through untouched, not as garbage '://'") {
    assert(canon("example.com/a") == "example.com/a")
    assert(canon("not a url at all") == "not a url at all")
  }

  test("two spellings of the same page canonicalize identically") {
    val a = canon("HTTP://WWW.Example.org:80/news/?b=2&a=1&utm_source=rss#top")
    val b = canon("http://example.org/news?a=1&b=2")
    assert(a == b && a == "http://example.org/news?a=1&b=2")
  }
}
