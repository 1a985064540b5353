package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases of the l58 PII patterns ([[TextQueries.redactPii]]) —
  * the rules the oracle grades in bulk over the injected corpus, pinned
  * here one by one so a regression names the pattern it broke. Also
  * pins the plan: the whole kernel is codegen'd regexp expressions, no
  * UDF (the RE2-compatibility constraint on the patterns is what lets
  * DuckDB grade the redaction byte-exact).
  */
class PiiRedactSpec extends SparkSpec {

  private def red(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextQueries.redactPii(col("t")))
      .collect().head.getString(0)
  }

  private def counts(s: String): (Int, Int, Int) = {
    import spark.implicits._
    Seq(s).toDF("t").select(
      size(regexp_extract_all(col("t"), lit(TextQueries.PiiEmailRe),
        lit(0))),
      size(regexp_extract_all(col("t"), lit(TextQueries.PiiPhoneRe),
        lit(0))),
      size(regexp_extract_all(col("t"), lit(TextQueries.PiiIpRe),
        lit(0))))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).head
  }

  test("emails: every occurrence redacts; plus-tags and subdomains " +
      "stay inside the match; bare @ is not an email") {
    assert(red("mail a.b+tag@sub.ex.co.uk and c_d%e@ex.io now") ==
      "mail <EMAIL> and <EMAIL> now")
    assert(red("not an email: a @ b.com") == "not an email: a @ b.com")
    assert(counts("x@y.io y@z.org")._1 == 2)
    assert(counts("no pii here") == ((0, 0, 0)))
  }

  test("phones: both separators match; bare 10-digit runs and " +
      "wrong-width groups do not") {
    assert(red("call 555-123-4567 or 555.987.6543 now") ==
      "call <PHONE> or <PHONE> now")
    assert(red("order 5551234567 id 55-123-4567 x 555-123-456") ==
      "order 5551234567 id 55-123-4567 x 555-123-456")
    // word boundaries: digits glued to the candidate break the match
    assert(red("id 9555-123-4567") == "id 9555-123-4567")
  }

  test("IPv4: dotted quads redact; 4-digit octets and version strings " +
      "survive") {
    assert(red("host 10.0.200.49 and 192.168.1.1 up") ==
      "host <IP> and <IP> up")
    assert(red("build 1234.5.6.7 v1.2.3") == "build 1234.5.6.7 v1.2.3")
    // an IP hard against punctuation still matches (\b, not spaces)
    assert(red("(10.1.2.3)") == "(<IP>)")
  }

  test("replacement order cannot cascade: placeholders carry no digits " +
      "or @, phones are never IPs and vice versa") {
    assert(red("a@b.co 555-123-4567 1.2.3.4") == "<EMAIL> <PHONE> <IP>")
    assert(counts("a@b.co 555-123-4567 1.2.3.4") == ((1, 1, 1)))
    // idempotence: redacting redacted text changes nothing
    val once = red("a@b.co 555-123-4567 1.2.3.4 and x@y.io")
    assert(red(once) == once)
  }

  test("the l58 plan is pure codegen expressions — no UDF node") {
    import spark.implicits._
    val df = Seq((1L, "a@b.co 1.2.3.4")).toDF("doc_id", "t")
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(TextQueries.PiiEmailRe),
          lit(0))).as("n_emails"),
        md5(TextQueries.redactPii(col("t"))).as("red_md5"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"),
      plan)
  }
}
