package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[UrlOps]] canonicalization goldens: each rule individually, plus
  * the non-rules (non-default ports, case-significant paths, keys that
  * merely resemble tracking params are kept).
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).head().getString(0)

  test("full canonical pass: case, www, port, sort, tracking, slash, fragment") {
    assert(canon("HTTP://WWW.Site.COM:80/a/b/?b=2&a=1&utm_campaign=x#frag")
      == "http://site.com/a/b?a=1&b=2")
  }

  test("default port strips only for the matching scheme") {
    assert(canon("https://x.com:443/p") == "https://x.com/p")
    assert(canon("http://x.com:443/p") == "http://x.com:443/p")
    assert(canon("https://x.com:8443/p") == "https://x.com:8443/p")
  }

  test("path and query case is significant; only scheme+host lowercase") {
    assert(canon("HTTPS://X.COM/Path?Q=V") == "https://x.com/Path?Q=V")
  }

  test("root slash and empty query collapse cleanly") {
    assert(canon("https://x.com/") == "https://x.com")
    assert(canon("https://x.com/p?utm_source=a&gclid=b") == "https://x.com/p")
    assert(canon("https://x.com/p?") == "https://x.com/p")
  }

  test("tracking keys must match exactly; lookalikes survive") {
    assert(canon("https://x.com/?gclidx=1&myutm_a=2&fbclid=3")
      == "https://x.com?gclidx=1&myutm_a=2")
  }

  test("www only strips as a leading label") {
    assert(canon("https://notwww.x.com/") == "https://notwww.x.com")
    assert(canon("https://www.www.x.com/") == "https://www.x.com")
  }

  test("unparseable input falls back to lower(trim), never NULL") {
    assert(canon("  Not A Url  ") == "not a url")
  }

  test("canonicalize is idempotent") {
    val urls = Seq(
      "HTTP://WWW.Site.COM:80/a/b/?b=2&a=1&utm_campaign=x#frag",
      "https://x.com:8443/p?z=1&y=2",
      "ftp://Host.Net/Dir/",
      "  Not A Url  ")
    urls.foreach { u =>
      assert(canon(canon(u)) == canon(u), s"not idempotent on $u")
    }
  }

  test("hostOf strips www and port") {
    val h = Seq(Tuple1("HTTPS://WWW.Ex.COM:8080/p?a=1")).toDF("u")
      .select(UrlOps.hostOf(col("u"))).head().getString(0)
    assert(h == "ex.com")
  }
}
