package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** [[UrlOps.canonicalizeUrl]] edge cases — the q62 oracle mirrors the
  * same steps in DuckDB, so this spec pins the per-step semantics the
  * SQL was written against. */
class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    val got = urls.toDF("u")
      .select(col("u"), UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    urls.map(got)
  }

  test("scheme/host lowercased, default port stripped, empty path -> /") {
    assert(canon(
      "HTTP://WWW.Example.COM",
      "http://www.example.com:80",
      "https://Host.Org:443/a",
      "https://Host.Org:8443/a", // non-default port kept
      "ftp://Host:80/x") ==       // :80 is only default for http
      Seq(Some("http://www.example.com/"),
        Some("http://www.example.com/"),
        Some("https://host.org/a"),
        Some("https://host.org:8443/a"),
        Some("ftp://host:80/x")))
  }

  test("query sorted bytewise, empty params dropped, fragment dropped") {
    assert(canon(
      "http://h/p?b=2&a=1",
      "http://h/p?a=1&b=2",
      "http://h/p?b=2&&a=1&",
      "http://h/p?x=1#frag?y=2&z=3", // '?' in fragment is not a query
      "http://h/p#only-frag",
      "http://h/p?") ==
      Seq(Some("http://h/p?a=1&b=2"),
        Some("http://h/p?a=1&b=2"),
        Some("http://h/p?a=1&b=2"),
        Some("http://h/p?x=1"),
        Some("http://h/p"),
        Some("http://h/p")))
  }

  test("path case and bytes preserved; invalid inputs -> null") {
    assert(canon(
      "http://h/CaseKept/P?Z=1",
      "not a url",
      "h//no-scheme",
      "http://") == // empty authority
      Seq(Some("http://h/CaseKept/P?Z=1"),
        None, None, None))
  }
}
