package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** The FULL public suffix list (round-14 directive 6, replacing the
  * round-13 50-rule snapshot), bundled as a resource from the Mozilla
  * PSL (publicsuffix.org, MPL-2.0 — public data; the file header
  * carries the license pointer) and parsed per the published algorithm:
  * one rule per line up to the first whitespace, `//` comments and
  * blanks skipped, `!rule` = exception (kind 3), `*.base` = wildcard
  * keyed by its base (kind 2), anything else a normal rule (kind 1).
  * ICANN and PRIVATE sections both load — a crawl-dedup pipeline wants
  * github.io-style private registries to group like registrable
  * domains, which is also what the round-13 snapshot did.
  *
  * ~9.5k rules is far past what a literal CASE/map expression should
  * carry (a 19k-child CreateMap breaks codegen; a literal-map
  * element_at is an O(rules) linear probe per row), so the lookup runs
  * through [[graft.functions.PslKind]] — a native codegen expression
  * holding this table as a plan reference object with O(1) hash
  * probes — and the DuckDB oracle reads the SAME rules via
  * [[csvPath]], generated from this map, so the engines cannot drift.
  */
object PslTable {

  /** rule → kind (1 normal, 2 wildcard base, 3 exception). The real
    * PSL has no key claimed by two kinds (asserted at load — if an
    * upstream refresh ever introduces one, this fails loudly rather
    * than silently letting one kind shadow the other; the fix then is
    * a bitmask value, not a precedence guess).
    */
  val rules: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val parsed = src.getLines().flatMap { line =>
        // the spec: the rule is the line up to the first whitespace
        val t = line.trim.split("\\s+").headOption.getOrElse("")
        if (t.isEmpty || t.startsWith("//")) None
        else if (t.startsWith("!")) Some(t.substring(1) -> 3)
        else if (t.startsWith("*.")) Some(t.substring(2) -> 2)
        else Some(t -> 1)
      }.toList.distinct
      val m = parsed.toMap
      require(m.size == parsed.size, {
        val dups = parsed.groupBy(_._1).filter(_._2.size > 1).keys
        s"PSL rule keys collide across kinds: ${dups.take(5).mkString(", ")}"
      })
      require(m.size > 9000,
        s"suspiciously small PSL (${m.size} rules) — truncated resource?")
      m
    } finally src.close()
  }

  /** Longest probe depth in labels, over ALL rule kinds (wildcards
    * count base+1, exceptions as-is — the ADVICE-r13 rule, so no rule
    * can sit outside the probed suffix range).
    */
  val maxLabels: Int = rules.map { case (s, kind) =>
    val labels = s.count(_ == '.') + 1
    if (kind == 2) labels + 1 else labels
  }.max

  /** The executor-side lookup table ([[graft.functions.PslKind]]'s
    * reference object): UTF8String-keyed so generated code probes
    * without a single string conversion per row.
    */
  lazy val javaMap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](rules.size * 2)
    rules.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), Integer.valueOf(v))
    }
    m
  }

  /** Materialize the rule table as CSV for the DuckDB oracle and
    * answer its ABSOLUTE path (the oracle SQL embeds it; DuckDB runs
    * on this machine with an unknown cwd). Written under target/ —
    * build output, not source. Lazy: first oracle-SQL generation pays
    * the one write; both engines then read ONE artifact derived from
    * ONE parse, so a rule edit cannot desynchronize them.
    */
  lazy val csvPath: String = {
    val p = java.nio.file.Paths.get("target", "psl_rules.csv")
      .toAbsolutePath
    java.nio.file.Files.createDirectories(p.getParent)
    val body = ("rule,kind" +: rules.toSeq.sortBy(_._1)
      .map { case (r, k) => s"$r,$k" }).mkString("\n") + "\n"
    java.nio.file.Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }
}
