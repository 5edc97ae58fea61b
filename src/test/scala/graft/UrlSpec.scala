package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Url
import graft.sparkext.RegistrableDomain

/** URL/domain curation: public-suffix longest-match (the publicsuffix.org
  * algorithm), regex-defined normalization, and the domain-list filter. */
class UrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def etld1(hosts: String*): Seq[Option[String]] =
    hosts.toDF("h").select(Url.registrableDomain(col("h")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq

  private def suffix(hosts: String*): Seq[Option[String]] =
    hosts.toDF("h").select(Url.publicSuffix(col("h")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("publicsuffix.org algorithm: plain, layered, wildcard, exception, default") {
    assert(etld1("www.example.com") == Seq(Some("example.com")))
    assert(etld1("a.b.news.example.co.uk") == Seq(Some("example.co.uk")))
    // wildcard *.ck: foo.ck is ITSELF a public suffix; one more label registers
    assert(suffix("shop.foo.ck") == Seq(Some("foo.ck")))
    assert(etld1("shop.foo.ck") == Seq(Some("shop.foo.ck")))
    assert(etld1("foo.ck") == Seq(None))
    // exception !www.ck: suffix collapses to ck, www.ck is registrable
    assert(etld1("www.ck") == Seq(Some("www.ck")))
    assert(suffix("www.ck") == Seq(Some("ck")))
    // unknown TLD: the default * rule (last label)
    assert(etld1("example.unknowntld") == Seq(Some("example.unknowntld")))
    // a bare public suffix has no registrable domain
    assert(etld1("com", "co.uk", "github.io") == Seq(None, None, None))
    // private registries: each subdomain site is its own registrable domain
    assert(etld1("alice.github.io", "x.s3.amazonaws.com") ==
      Seq(Some("alice.github.io"), Some("x.s3.amazonaws.com")))
  }

  test("host edge shapes: case, trailing dot, IPv4, single label, empties") {
    assert(etld1("WWW.EXAMPLE.COM.") == Seq(Some("example.com")))
    assert(etld1("192.168.0.1") == Seq(None))
    assert(etld1("localhost") == Seq(None)) // single label == its own suffix
    assert(etld1("", ".") == Seq(None, None))
    // 5 numeric labels are NOT an IPv4 literal; default rule applies
    assert(etld1("1.2.3.4.5") == Seq(Some("4.5")))
  }

  test("full URLs route through host extraction; bare hosts pass straight") {
    val df = Seq(
      "https://user:pw@Sub.Example.COM:8443/a/b?q=1#f",
      "//cdn.example.co.uk/x.js",
      "sub.example.com").toDF("u")
    val got = df.select(Url.registrableDomain(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("example.com", "example.co.uk", "example.com"))
    assert(Seq("https://a.b.c.org/p").toDF("u")
      .select(Url.host(col("u"))).collect()(0).getString(0) == "a.b.c.org")
  }

  test("normalize: fragment, default ports, case, trailing dot, tracking params") {
    def norm(u: String): String =
      Seq(u).toDF("u").select(Url.normalize(col("u"))).collect()(0).getString(0)
    assert(norm("HTTPS://Example.COM:443/Path?id=1#frag") ==
      "https://example.com/Path?id=1")
    assert(norm("http://example.com:80/") == "http://example.com/")
    // non-default port survives
    assert(norm("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(norm("https://example.com./x") == "https://example.com/x")
    assert(norm("http://e.com/p?utm_source=a&id=2&utm_medium=b") ==
      "http://e.com/p?id=2")
    assert(norm("http://e.com/p?utm_source=a") == "http://e.com/p")
    assert(norm("http://e.com/p?fbclid=zz&gclid=yy&k=v") == "http://e.com/p?k=v")
    // path case and query order untouched; non-URL text passes through
    assert(norm("plain text, no url") == "plain text, no url")
  }

  test("filterByDomainList: block and allow modes, null-domain handling") {
    val docs = Seq(
      (1L, "https://a.example.com/x"), // example.com
      (2L, "https://b.blocked.org/y"), // blocked.org
      (3L, "https://192.168.0.1/z"), // null etld1
      (4L, "http://site.blocked.org:80/q") // blocked.org
    ).toDF("id", "url")
    // list entries as URL and bare domain — same reduction both sides
    val list = Seq("http://www.Blocked.ORG/whatever").toDF("d")
    val blocked = Url.filterByDomainList(docs, "url", list, block = true)
    assert(blocked.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val allowed = Url.filterByDomainList(docs, "url", list, block = false)
    assert(allowed.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    // a pre-existing user column named like a working column survives
    // intact (r18 advice: the fixed __dom name used to be clobbered)
    val withDom = docs.withColumn("__dom", col("id") * 10)
      .withColumn("__graft_dom_0", lit("user data"))
    val kept = Url.filterByDomainList(withDom, "url", list, block = true)
    assert(kept.columns.toSeq == withDom.columns.toSeq,
      s"user columns must pass through untouched: ${kept.columns.mkString(",")}")
    assert(kept.select("__dom").collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 30L))
    assert(kept.select("__graft_dom_0").distinct().head.getString(0) == "user data")
  }

  test("url_filter builtin: inline domains and the IO-seam list_path") {
    val docs = Seq((1L, "https://keep.me.com/x"), (2L, "https://drop.example.org/y"))
      .toDF("id", "url")
    val fns = graft.service.BuiltinTransformations.registryWith(new graft.io.SparkIO())
    val out = fns("url_filter")(docs,
      Map("url_col" -> "url", "domains" -> Seq("example.org")))
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // through the IO seam (decontaminate pattern)
    val io = new graft.io.FakeIO()
    io.frames.put("/lists/block.parquet", Seq("example.org").toDF("domain"))
    val fns2 = graft.service.BuiltinTransformations.registryWith(io)
    val out2 = fns2("url_filter")(docs,
      Map("url_col" -> "url", "list_path" -> "/lists/block.parquet"))
    assert(out2.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      fns("url_filter")(docs, Map("url_col" -> "url"))
    }
  }

  test("malformed suffix rules are rejected loudly") {
    val err = intercept[Exception] {
      Seq("x.com").toDF("h")
        .select(RegistrableDomain(col("h"), Seq("co..uk"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("plan: the scalar lane is shuffle-free; the list filter broadcasts") {
    val docs = Seq((1L, "https://a.example.com/x")).toDF("id", "url")
    val scalarPlan = docs.select(Url.registrableDomain(col("url")),
      Url.normalize(col("url"))).queryExecution.executedPlan.toString
    assert(!scalarPlan.contains("Exchange"), s"pure projection expected:\n$scalarPlan")
    val filtered = Url.filterByDomainList(docs, "url", Seq("x.org").toDF("d"))
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("Broadcast"), s"list side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle for the list:\n$p")
  }
}
