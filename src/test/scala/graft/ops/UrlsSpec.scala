package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Urls]] — canonicalization contract edges beyond what the oracled
  * synthesis exercises. */
class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(u: String): Option[String] = {
    val r = Seq(Option(u)).toDF("u")
      .select(Urls.normalizeUrl(col("u"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("case: scheme/host lowered, path case preserved") {
    assert(norm("HTTPS://ExAmPlE.Com/KeepCase") == Some("https://example.com/KeepCase"))
  }

  test("non-default port survives; default port strips per scheme") {
    assert(norm("http://a.com:8080/x") == Some("http://a.com:8080/x"))
    assert(norm("http://a.com:443/x") == Some("http://a.com:443/x")) // 443 not http's default
    assert(norm("https://a.com:443/x") == Some("https://a.com/x"))
  }

  test("params: tracking dropped, rest sorted; all-tracking query vanishes") {
    assert(norm("http://a.com/p?z=1&utm_medium=m&a=2") == Some("http://a.com/p?a=2&z=1"))
    assert(norm("http://a.com/p?utm_source=x&fbclid=y") == Some("http://a.com/p"))
  }

  test("empty path becomes /; fragment-only tail drops") {
    assert(norm("http://a.com") == Some("http://a.com/"))
    assert(norm("http://a.com#top") == Some("http://a.com/"))
  }

  test("userinfo strips; host never carries a port (blocklist can't be evaded)") {
    assert(norm("http://u:p@a.com/x") == Some("http://a.com/x"))
    assert(norm("http://x@WWW.a.com:80/") == Some("http://a.com/"))
    val host = Seq("https://b.example.org:444/p").toDF("u")
      .select(Urls.urlHost(col("u"))).collect().head.getString(0)
    assert(host == "b.example.org")
    val df = Seq(
      ("http://example.org:8080/", true),   // non-default port
      ("http://u@example.org/", true),      // userinfo
      ("ftp://files.example.org:2121/", true), // non-http scheme + port
      ("http://example.org.evil.com/", false)
    ).toDF("u", "want")
    df.select(col("want"), Urls.hostBlocked(col("u"), Seq("example.org")).as("got"))
      .collect().foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("not-a-URL and null are null") {
    assert(norm("example.com/no-scheme").isEmpty)
    assert(norm(null).isEmpty)
  }

  test("blocklist suffix semantics: subdomain blocked, lookalike not") {
    val df = Seq(
      ("http://a.example.org/x", true),
      ("http://example.org/x", true),
      ("http://notexample.org/x", false),
      ("no url", false)
    ).toDF("u", "want")
    val got = df.select(col("want"),
        Urls.hostBlocked(col("u"), Seq("example.org")).as("got"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("normalizeUrl is idempotent over random messy URLs") {
    import org.scalacheck.{Gen, rng}
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("Site.Example.COM", "a.b.org", "X.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/x%20y")
      query <- Gen.oneOf("", "?a=1", "?utm_source=s&b=2&a=1", "?z=9&utm_x=1")
      frag <- Gen.oneOf("", "#f", "#a/b?c")
    } yield s"$scheme://$www$host$port$path$query$frag"
    val params = Gen.Parameters.default
    val urls = (0 until 80).map(i => urlGen(params, rng.Seed(5L + i)).get)
    val df = urls.toDF("u")
      .select(col("u"), Urls.normalizeUrl(col("u")).as("once"))
      .select(col("u"), col("once"), Urls.normalizeUrl(col("once")).as("twice"))
    df.collect().foreach { r =>
      assert(!r.isNullAt(1), s"URL failed to canonicalize: ${r.getString(0)}")
      assert(r.getString(1) == r.getString(2),
        s"not idempotent: ${r.getString(0)} -> ${r.getString(1)} -> ${r.getString(2)}")
    }
  }

  test("urlDedupVerdicts: canonical collision dedups; null URLs never collide") {
    val df = Seq(
      (1L, "http://WWW.a.com/x/"),
      (2L, "http://a.com/x"),
      (3L, "junk"),
      (4L, "junk2")).toDF("doc_id", "url")
    val got = Urls.urlDedupVerdicts(df, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(1L -> ((1L, false)), 2L -> ((1L, true)),
      3L -> ((3L, false)), 4L -> ((4L, false))))
  }
}
