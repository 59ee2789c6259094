package graft

import org.apache.spark.sql.functions._
import graft.llm.Url

/** URL canonicalization cases: case folding, default ports, trailing
  * slashes, utm stripping, parameter sorting, fragments. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Url.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host lowercase, default port stripped, path preserved") {
    assert(canon("HTTP://WWW.Example.COM:80/A/B") ==
      Seq("http://www.example.com/A/B"))
    assert(canon("https://Host.com:443/x") == Seq("https://host.com/x"))
    // non-default port survives
    assert(canon("http://h.com:8080/x") == Seq("http://h.com:8080/x"))
    // https on :80 is not a default port
    assert(canon("https://h.com:80/x") == Seq("https://h.com:80/x"))
  }

  test("trailing slashes collapse; bare root stays /") {
    assert(canon("http://h.com/a/") == Seq("http://h.com/a"))
    assert(canon("http://h.com/a///") == Seq("http://h.com/a"))
    assert(canon("http://h.com/") == Seq("http://h.com/"))
    assert(canon("http://h.com") == Seq("http://h.com/"))
  }

  test("utm params drop, the rest sort, fragments vanish") {
    assert(canon("http://h.com/p?utm_source=x&b=2&a=1#frag") ==
      Seq("http://h.com/p?a=1&b=2"))
    assert(canon("http://h.com/p?utm_campaign=c&utm_medium=m") ==
      Seq("http://h.com/p"))
    assert(canon("http://h.com/p?z=1&y=2&z=0") ==
      Seq("http://h.com/p?y=2&z=0&z=1"))
  }

  test("equivalent noisy variants collapse to one canonical key") {
    val variants = Seq(
      "HTTP://Shop1.Example.COM:80/item/42?utm_source=x&ref=3&b=2&a=1",
      "http://shop1.example.com/item/42/?b=2&a=1&ref=3#sec",
      "http://Shop1.example.com/item/42?a=1&ref=3&b=2&utm_medium=y")
    assert(canon(variants: _*).distinct ==
      Seq("http://shop1.example.com/item/42?a=1&b=2&ref=3"))
  }
}
