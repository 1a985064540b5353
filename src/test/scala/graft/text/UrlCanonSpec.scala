package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases of [[TextQueries.canonicalizeUrl]] /
  * [[TextQueries.registrableDomain]] — the rules the l57 oracle grades
  * in bulk, pinned here one by one so a regression names the rule it
  * broke (round-12 directive 6: tracking-param stripping edge cases).
  */
class UrlCanonSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u")
      .select(TextQueries.canonicalizeUrl(col("u")))
      .collect().head.getString(0)
  }

  private def dom(host: String): String = {
    import spark.implicits._
    Seq(host).toDF("h")
      .select(TextQueries.registrableDomain(col("h")))
      .collect().head.getString(0)
  }

  test("tracking params strip; real params survive in original order") {
    assert(canon("https://a.com/p?utm_a=1&id=2&ref=x&sort=asc") ==
      "https://a.com/p?id=2&sort=asc")
    // all-tracking query: the '?' goes with it
    assert(canon("https://a.com/p?utm_source=f&fbclid=z&gclid=g") ==
      "https://a.com/p")
    // no query / bare '?': no '?' in the canonical form
    assert(canon("https://a.com/p") == "https://a.com/p")
    assert(canon("https://a.com/p?") == "https://a.com/p")
    // prefix-matching must not overreach: utm (no underscore) and
    // referrer are REAL params; ref= (exact key) is tracking
    assert(canon("https://a.com/p?utm=1&referrer=x&ref=y") ==
      "https://a.com/p?utm=1&referrer=x")
  }

  test("scheme/host case-fold, www strip, default ports, fragments, " +
      "trailing slashes") {
    assert(canon("HTTPS://WWW.A.COM:443/p/1?fbclid=x") ==
      "https://a.com/p/1")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    // non-default port survives; an m. subdomain is a real host
    assert(canon("https://m.a.com:8443/x") == "https://m.a.com:8443/x")
    // path case is PRESERVED (paths are case-sensitive on the web)
    assert(canon("HTTP://ExAmPle.COM/Path/Q") == "http://example.com/Path/Q")
    // fragment strips entirely, even when it smuggles a '?'
    assert(canon("https://a.com/p#frag?utm_x=1") == "https://a.com/p")
    // trailing slashes trim; the root path stays '/'
    assert(canon("https://a.com/p///") == "https://a.com/p")
    assert(canon("https://a.com/") == "https://a.com/")
    assert(canon("https://a.com") == "https://a.com/")
    // www strips only as a whole label prefix
    assert(canon("https://wwwx.com/p") == "https://wwwx.com/p")
    assert(canon("https://www.www.com/p") == "https://www.com/p")
  }

  test("registrable domain follows the public-suffix algorithm " +
      "(round-13 directive 6): default TLD, second-level rules, " +
      "private-section rules, wildcard, exception") {
    // implicit `*` default: unlisted TLD → last two labels
    assert(dom("a.b.c.com") == "c.com")
    assert(dom("a.com") == "a.com")
    // a host that IS a public suffix (or a single label) has no
    // registrable domain — groups alone
    assert(dom("localhost") == "")
    assert(dom("com") == "")
    assert(dom("co.uk") == "")
    assert(dom("github.io") == "")
    // second-level rules: the suffix is TWO labels, registrable keeps 3
    assert(dom("foo.co.uk") == "foo.co.uk")
    assert(dom("a.b.foo.co.uk") == "foo.co.uk")
    assert(dom("shop.example.com.au") == "example.com.au")
    // longest match prevails: blogspot.com beats the default com rule
    assert(dom("me.blogspot.com") == "me.blogspot.com")
    assert(dom("x.me.blogspot.com") == "me.blogspot.com")
    // 3-label private rule
    assert(dom("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    assert(dom("s3.amazonaws.com") == "")
    assert(dom("amazonaws.com") == "amazonaws.com")
    // wildcard *.ck: ANY single label under ck is part of the suffix
    assert(dom("foo.ck") == "")
    assert(dom("bar.foo.ck") == "bar.foo.ck")
    assert(dom("a.bar.foo.ck") == "bar.foo.ck")
    // exception !www.ck carves www.ck back out as registrable
    assert(dom("www.ck") == "www.ck")
    assert(dom("a.www.ck") == "www.ck")
  }

  test("the FULL bundled PSL (round-14 directive 6): exotic rule " +
      "shapes the 50-rule snapshot never carried") {
    // wildcard + exception pair deep in .jp: *.kawasaki.jp with
    // !city.kawasaki.jp
    assert(dom("foo.kawasaki.jp") == "")
    assert(dom("shop.foo.kawasaki.jp") == "shop.foo.kawasaki.jp")
    assert(dom("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(dom("sub.city.kawasaki.jp") == "city.kawasaki.jp")
    // 4-label private rules (AWS): the deepest probe depths
    assert(dom("b.s3.dualstack.ap-south-1.amazonaws.com") ==
      "b.s3.dualstack.ap-south-1.amazonaws.com")
    assert(dom("s3.dualstack.ap-south-1.amazonaws.com") == "")
    // ordinary ccTLD second-levels absent from the snapshot
    assert(dom("x.co.il") == "x.co.il")
    assert(dom("a.b.co.il") == "b.co.il")
    assert(dom("x.com.pl") == "x.com.pl")
    // multi-label public suffixes under .uk beyond co/org/ac
    assert(dom("a.police.uk") == "a.police.uk")
    // a plain TLD listed as a rule (not just the implicit default)
    assert(dom("x.dev") == "x.dev")
    assert(dom("dev") == "")
  }

  test("canonicalization is idempotent on its own output") {
    for (u <- Seq(
        "HTTPS://WWW.A.COM:443/p/1?utm_a=1&id=2&ref=x#f",
        "http://a.com:80/x/",
        "https://m.a.com:8443/x?q=1")) {
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent on $u → $once")
    }
  }
}
