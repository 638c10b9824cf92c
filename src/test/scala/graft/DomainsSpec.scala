package graft

import org.apache.spark.sql.functions._
import graft.operators.Domains

class DomainsSpec extends SparkTestBase {
  import spark.implicits._

  test("domainOf normalizes scheme, case, www, port, path, query, fragment") {
    val got = Seq(
      "https://www.Example.COM/path/x?q=1",
      "HTTP://example.com:8080/b",
      "example.com/c#frag",
      "ftp://cdn.example.com/d",
      "  https://example.com  ",
      "example.com",
      "wwwx.example.com/e")
      .toDF("url").select(Domains.domainOf(col("url"))).as[String].collect().toSeq
    assert(got === Seq(
      "example.com", "example.com", "example.com", "cdn.example.com",
      "example.com", "example.com", "wwwx.example.com"))
  }

  test("domainOf of a NULL url is the empty string, not null") {
    // the documented "empty = no extractable host" contract must cover
    // null urls too: a null domain is neither "" (the quarantine/bypass
    // fork) nor a real domain, so null-url rows would silently vanish
    // from BOTH forks of a domain-hygiene stage
    val got = Seq((1L, Option.empty[String]), (2L, Some("https://a.example.com/x")))
      .toDF("id", "url").select(Domains.domainOf(col("url"))).as[String].collect().toSeq
    assert(got === Seq("", "a.example.com"))
  }

  test("filterBlocklist: literal list and broadcast table agree") {
    val df = Seq((1L, "a.com"), (2L, "b.com"), (3L, "c.com"), (4L, "b.com"))
      .toDF("id", "domain")
    val byList = Domains.filterBlocklist(df, "domain", Seq("b.com"))
      .select("id").as[Long].collect().sorted.toSeq
    val byTable = Domains.filterBlocklist(df, "domain", Seq("b.com").toDF("domain"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(byList === Seq(1L, 3L))
    assert(byTable === byList)
  }

  test("capPerDomain keeps top-k by (priority desc, key asc), rank 1-based") {
    val df = Seq(
      (1L, "a.com", 10L), (2L, "a.com", 30L), (3L, "a.com", 30L),
      (4L, "a.com", 20L), (5L, "b.com", 5L))
      .toDF("id", "domain", "prio")
    val got = Domains.capPerDomain(df, "id", "domain", "prio", maxPerDomain = 2)
      .orderBy("domain", "rank")
      .as[(String, Int, Long)].collect().toSeq
    // a.com: prio 30 ties broken by smaller id (2 before 3); 4 and 1 cut
    assert(got === Seq(("a.com", 1, 2L), ("a.com", 2, 3L), ("b.com", 1, 5L)))
  }

  test("capPerDomain rejects non-integral key or priority") {
    val df = Seq((1.5, "a.com", 2L)).toDF("id", "domain", "prio")
    intercept[IllegalArgumentException] {
      Domains.capPerDomain(df, "id", "domain", "prio", 1)
    }
    val df2 = Seq((1L, "a.com", 0.5)).toDF("id", "domain", "prio")
    intercept[IllegalArgumentException] {
      Domains.capPerDomain(df2, "id", "domain", "prio", 1)
    }
  }

  test("dedupByCanonicalUrl keeps latest per host+path, strips query/fragment") {
    val df = Seq(
      ("https://www.a.com/x?q=1", 10L, "old"),
      ("http://a.com/x#top", 20L, "new"),
      ("a.com/y", 5L, "only"))
      .toDF("url", "ts", "tag")
    val got = Domains.dedupByCanonicalUrl(df, "url", Seq(col("ts")))
      .select("tag").as[String].collect().sorted.toSeq
    assert(got === Seq("new", "only"))
    assert(Domains.dedupByCanonicalUrl(df, "url", Seq(col("ts"))).columns.toSeq
      === Seq("url", "ts", "tag"))
  }
}
