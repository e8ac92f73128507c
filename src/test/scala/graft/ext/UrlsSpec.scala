package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String = {
    val r = Seq(url).toDF("u").select(Urls.normalizeUrl($"u").as("n"))
      .select(coalesce($"n", lit("<null>"))).as[String].head()
    r
  }

  test("normalizeUrl lowercases scheme and host, keeps path case") {
    assert(norm("HTTPS://WWW.Example.COM/Path/File") ==
      "https://www.example.com/Path/File")
  }

  test("normalizeUrl strips default ports only") {
    assert(norm("https://a.com:443/x") == "https://a.com/x")
    assert(norm("http://a.com:80/x") == "http://a.com/x")
    assert(norm("http://a.com:8080/x") == "http://a.com:8080/x")
    // https with :80 is NOT default — stays
    assert(norm("https://a.com:80/x") == "https://a.com:80/x")
  }

  test("normalizeUrl canonicalizes path and drops fragment") {
    assert(norm("https://a.com") == "https://a.com/")
    assert(norm("https://a.com/") == "https://a.com/")
    assert(norm("https://a.com/docs///") == "https://a.com/docs")
    assert(norm("https://a.com/x#section-2") == "https://a.com/x")
  }

  test("normalizeUrl drops tracking params and sorts the rest") {
    assert(norm("https://a.com/p?utm_source=x&b=2&a=1&utm_campaign=y") ==
      "https://a.com/p?a=1&b=2")
    assert(norm("https://a.com/p?fbclid=z&gclid=w&ref=home") == "https://a.com/p")
    // a param VALUE containing 'utm_' is not a tracking param name
    assert(norm("https://a.com/p?q=utm_test") == "https://a.com/p?q=utm_test")
  }

  test("normalizeUrl returns null for non-URL input") {
    assert(norm("not a url") == "<null>")
    assert(norm("example.com/no-scheme") == "<null>")
  }

  test("urlDomain takes the last two labels; ports and subdomains ignored") {
    val d = Seq("https://a.b.Site.Example.com:443/x").toDF("u")
      .select(Urls.urlDomain($"u")).as[String].head()
    assert(d == "example.com")
    // NON-default port: urlHost keeps ':8080' (different origin) but the
    // registrable domain must still extract — the r12-advice blocklist
    // bypass (bad.com:8080 → '') is pinned closed here
    val d2 = Seq("https://x.Example.com:8080/x").toDF("u")
      .select(Urls.urlDomain($"u")).as[String].head()
    assert(d2 == "example.com")
  }

  test("filterBlockedDomains drops blocked registrable domains") {
    val df = Seq(
      (1L, "https://spam.bad.com/x"),
      (2L, "https://ok.good.com/y"),
      (3L, "https://Bad.COM/z"),
      (4L, "https://Bad.com:8080/served-on-odd-port")).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url", Seq("bad.com"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("dedupByUrl keeps the smallest id per canonical URL, keeps malformed") {
    val df = Seq(
      (10L, "https://a.com/p?b=2&a=1"),
      (7L, "HTTPS://A.com:443/p/?a=1&utm_source=s&b=2#f"),
      (3L, "https://a.com/other"),
      (9L, "garbage"),
      (8L, "more garbage")).toDF("id", "url")
    val out = Urls.dedupByUrl(df, "id", "url")
      .select("id").as[Long].collect().toSet
    // 7 beats 10 (same canonical URL); 3 unique; malformed 8, 9 both kept
    assert(out == Set(7L, 3L, 8L, 9L))
  }
}
