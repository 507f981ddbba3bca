package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + allow/deny verdicts — the crawl-side admission
  * policy a Common-Crawl-style corpus is built under (the reference's
  * analogous stage is its input admission matrix: which documents the
  * pipeline may process at all, `validate_pdfinfo_options`'s policy
  * gates, src/ocrmypdf/_validation.py:110-161 — here the gate is the
  * Robots Exclusion Protocol, RFC 9309).
  *
  * Semantics implemented (documented scope, pinned by the unit suite —
  * the rules are RFC 9309 / the Google REP parser's published behavior):
  *  - a GROUP is one or more consecutive `User-agent` lines followed by
  *    its rules; a `User-agent` line after rules starts a new group;
  *  - grouping sees exactly the group-scoped directives (`Allow`,
  *    `Disallow`, `Crawl-delay`) plus `User-agent` — so any rule-like
  *    record after a user-agent run CLOSES the group header (the
  *    Google parser's published behavior); non-group lines (`Sitemap`,
  *    unknown directives, comments, blanks) are invisible to grouping;
  *  - `Crawl-delay` is group-scoped (the Bing/Yandex reading), integer
  *    seconds only, MAX across merged groups; `Sitemap` is host-GLOBAL
  *    (valid anywhere in the file, independent of user-agent);
  *  - rules BEFORE any `User-agent` line belong to no group → ignored;
  *  - exactly the most specific agent level applies: groups naming the
  *    agent exactly (case-insensitive) if any exist, else the `*`
  *    groups, else no rules (everything allowed). ALL groups at the
  *    chosen level merge (RFC 9309 §2.2.1: multiple groups for one
  *    agent combine);
  *  - rule matching is the RFC 9309 §2.2.3 wildcard match on the raw
  *    url path (query/fragment stripped): `*` matches any character
  *    sequence, a TRAILING `$` anchors at the path end, every other
  *    character (including an interior '$') is literal — a rule with
  *    neither is exactly a prefix match; an empty-value rule matches
  *    nothing;
  *  - verdict: longest matching rule STRING wins (wildcards count as
  *    one character — the Google parser's specificity); `Allow` beats
  *    `Disallow` at equal length (RFC 9309 §2.2.2); no matching rule →
  *    allowed. Directive names are case-insensitive; only spaces are
  *    trimmed (tabs out of scope).
  *
  * Everything is builtin string/window/join algebra replayed verbatim
  * by the DuckDB oracle: posexplode(split) ↔ zipped unnest(range)/
  * unnest(list); the group-boundary scan is lag + a running sum with an
  * explicit ROWS frame in both engines.
  *
  * 100 TB shape: the robots side is one row per HOST — thousands of
  * times smaller than the page table — so the parsed applicable-rule
  * table is a broadcast join onto the url side's host key (never a
  * shuffle of the big table by host), candidates are pruned by the
  * prefix filter before the per-url two-phase argmax agg, and the only
  * wide exchange is the url-keyed agg the verdict needs anyway.
  */
object Robots {

  /** The crawler's product token (compared case-insensitively). */
  val agent = "graftbot"

  /** Per-host robots.txt bodies — adversarial coverage: comments,
    * mixed-case directives, stacked agent lines, groups merged across a
    * Sitemap line, rules before any group, empty-value rules, an
    * exact-agent group that SHADOWS the `*` group, and a host whose
    * only applicable group is someone else's. */
  val fixture: Seq[(String, String)] = Seq(
    "host01.example.com" -> Seq(
      "# robots for host01 — * group first, then a graftbot group",
      "User-agent: *",
      "Disallow: /private",
      "Allow: /private/pub",
      "Disallow: /tmp/",
      "Disallow:", // empty value: matches nothing, dropped at parse
      "Crawl-delay: 10", // group-scoped: belongs to the (shadowed) * group
      "",
      "User-Agent: GraftBot", // case-insensitive directive AND agent
      "User-agent: otherbot", // stacked: one group, two agents
      "Disallow: /article/p1",
      "Allow: /article/p10").mkString("\n"),
    "host02.example.net" -> Seq(
      "User-agent: badbot",
      "Disallow: /",
      "",
      "User-agent: *",
      "Allow: /a",
      "Disallow: /a/b").mkString("\n"),
    "host03.example.org" -> Seq(
      "Disallow: /", // before any group: ignored per RFC
      "User-agent: graftbot",
      "Disallow:").mkString("\n"), // its whole group is empty-value
    "host04.example.org" -> Seq(
      "User-agent: graftbot",
      "Disallow: /x",
      "Sitemap: https://host04.example.org/sitemap.xml", // non-group line
      "User-agent: graftbot", // second group, same agent: rules MERGE
      "Disallow: /y").mkString("\n"),
    "host05.example.net" -> Seq(
      "User-agent: crawler-b", // no group matches graftbot and no `*`
      "Disallow: /").mkString("\n"),
    "host07.example.com" -> Seq(
      "User-agent: *",
      "Crawl-delay: 2", // shadowed with the whole * group
      "Disallow: /all",
      "",
      "User-agent: graftbot",
      "Crawl-delay: 7",
      "Crawl-delay: 3", // two delays in one group: MAX (7) wins
      "Crawl-delay: 2.5", // fractional: dropped (integer-only scope)
      // 20 digits > Long range: dropped by the 18-digit cap, never an
      // ANSI cast overflow
      "Crawl-delay: 99999999999999999999",
      // points at the Sitemaps fixture's host07 urlset — the
      // discovery_chain query joins the two modules on this url
      "SiteMap: https://host07.example.com/a/sitemap.xml", // name case-blind
      "Sitemap: https://host07.example.com/maps/extra.xml",
      "Disallow: /x").mkString("\n"),
    "host08.example.org" -> Seq(
      "User-agent: graftbot",
      "Crawl-delay: 3",
      // the delay record CLOSED the header: otherbot is a NEW group, so
      // its Disallow does NOT bind graftbot (Google parser behavior)
      "User-agent: otherbot",
      "Disallow: /").mkString("\n"),
    "host09.example.com" -> Seq(
      // RFC 9309 §2.2.3 wildcards: '*' spans any chars (incl '/'), a
      // trailing '$' anchors; regex metachars in rules are LITERAL
      "User-agent: graftbot",
      "Disallow: /*.pdf$",
      "Allow: /pub/*.pdf$", // longer rule string → wins for /pub pdfs
      "Disallow: /dl/*/raw",
      "Disallow: /lit(eral)+x",
      "Allow: /dl/ok$").mkString("\n"))

  /** URL fixture — each row exercises one documented behavior; the
    * host06 row has no robots body at all. */
  val urlFixture: Seq[String] = Seq(
    // host01: the graftbot group SHADOWS `*` — /private is NOT blocked
    "http://host01.example.com/private/doc",
    "http://host01.example.com/tmp/x",
    "http://host01.example.com/article/p15", // prefix /article/p1 → deny
    "http://host01.example.com/article/p100", // allow /article/p10 longer
    "http://host01.example.com/article/p42", // no rule matches
    // host02: graftbot falls back to the `*` group
    "http://host02.example.net/a/x",
    "https://HOST02.example.net:443/a/b", // host case + default port
    "http://host02.example.net/a/b/c?q=1#frag", // query/frag stripped
    "http://host02.example.net/z",
    "http://host02.example.net/", // bare root vs allow /a: no match
    // host03: pre-group rule ignored, own group empty → allowed
    "http://host03.example.org/anything",
    // host04: merged groups — both /x and /y deny
    "http://host04.example.org/x/1",
    "http://host04.example.org/y/2",
    "http://host04.example.org/z/3",
    // host05: only crawler-b has a group; graftbot unrestricted
    "http://host05.example.net/q",
    // host06: no robots.txt at all
    "http://host06.example.com/anywhere",
    // host07: the graftbot group's Disallow /x binds; /y does not
    "http://host07.example.com/x/1",
    "http://host07.example.com/y/1",
    // host08: otherbot's group was CLOSED off by the crawl-delay record
    // — its Disallow / must NOT bind graftbot
    "http://host08.example.org/anything",
    // host09: wildcard rules
    "http://host09.example.com/doc.pdf", // /*.pdf$ → deny
    "http://host09.example.com/pub/a.pdf", // longer Allow /pub/*.pdf$ wins
    "http://host09.example.com/doc.pdfx", // '$' anchor: no match → allowed
    "http://host09.example.com/dl/a/b/raw", // '*' crosses '/' → deny
    "http://host09.example.com/dl/ok", // anchored Allow matches exactly
    "http://host09.example.com/dl/okx", // anchor misses → no rule
    "http://host09.example.com/lit(eral)+x/y") // metachars literal → deny

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def fixtureValuesSql: String =
    fixture.map { case (h, t) => s"(${q(h)}, ${q(t)})" }.mkString(",\n  ")

  def urlValuesSql: String =
    urlFixture.map(u => s"(${q(u)})").mkString(",\n  ")

  def robotsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixture.toDF("host", "txt")
  }

  def urlsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    urlFixture.toDF("url")
  }

  /** Every directive line of every robots body, comment-stripped and
    * name-lowercased: (host, ln, directive, value). ONE owner for the
    * line algebra shared by the group machinery and the group-BLIND
    * [[sitemapPointers]] extraction. */
  private def parsedLines(robots: DataFrame): DataFrame =
    robots.select(col("host"),
        posexplode(split(col("txt"), "\n")).as(Seq("ln", "line0")))
      .select(col("host"), col("ln"),
        trim(split_part(col("line0"), lit("#"), lit(1))).as("line"))
      .filter(instr(col("line"), ":") > 0)
      .select(col("host"), col("ln"),
        lower(trim(col("line").substr(lit(1), instr(col("line"), ":") - 1)))
          .as("directive"),
        trim(col("line").substr(instr(col("line"), ":") + lit(1),
          length(col("line")))).as("value"))

  /** The group-scoped directive lines (allow/disallow/crawl-delay) of
    * the groups applicable to `agent`: (host, directive, value).
    * Grouping sees exactly the group-scoped directives + user-agent —
    * so any rule-like record after a user-agent run CLOSES the group
    * header (the Google parser's published behavior: `UA:a, Crawl-
    * delay, UA:b` puts b in a NEW group), while Sitemap/unknown/
    * comment lines stay invisible. ONE owner for [[applicableRules]]
    * and [[crawlDelays]]. */
  private def chosenLines(robots: DataFrame, agent: String): DataFrame = {
    val byLine = Window.partitionBy("host").orderBy("ln")
    val lines = parsedLines(robots)
      .filter(col("directive").isin(
        "user-agent", "allow", "disallow", "crawl-delay"))
      .withColumn("isua", col("directive") === "user-agent")
    // group boundary = a UA line whose predecessor (among KEPT lines) is
    // not a UA line; group id = running boundary count (explicit ROWS
    // frame so both engines agree)
    val grouped = lines
      .withColumn("newg",
        col("isua") && !coalesce(lag(col("isua"), 1).over(byLine), lit(false)))
      .withColumn("grp", sum(col("newg").cast("int")).over(
        byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ga = grouped.filter(col("isua")).groupBy("host", "grp")
      .agg(max(lower(col("value")) === lower(lit(agent))).as("ex"),
        max(col("value") === "*").as("st"))
    val hostLevel = ga.groupBy("host").agg(max(col("ex")).as("any_ex"))
    val chosen = ga.join(hostLevel, Seq("host"))
      .filter(when(col("any_ex"), col("ex")).otherwise(col("st")))
      .select("host", "grp")
    grouped.filter(!col("isua") && col("grp") > 0 && col("value") =!= "")
      .join(chosen, Seq("host", "grp"))
      .select(col("host"), col("directive"), col("value"))
  }

  /** Parse robots bodies into the merged rule set applicable to
    * `agent`: (host, rtype 'allow'|'disallow', rpath). Pure builtin
    * algebra; the window steps run over per-host line numbers (the
    * robots table is per-host tiny — this shuffle is of rule LINES,
    * never pages). */
  def applicableRules(robots: DataFrame, agent: String): DataFrame =
    chosenLines(robots, agent)
      .filter(col("directive").isin("allow", "disallow"))
      .select(col("host"), col("directive").as("rtype"),
        col("value").as("rpath"))

  /** The Crawl-delay applicable to `agent` per host: group-scoped like
    * rules (the Bing/Yandex reading — the delay in the chosen group
    * applies), integer seconds only (fractional/garbage values are
    * dropped, documented scope), MAX across the chosen groups' delays —
    * when merged groups disagree, the politest wait wins. Hosts with no
    * applicable numeric delay are absent. The digit count is CAPPED at
    * 18 (< log10(2^63)): hostile input like a 20-digit delay must
    * degrade to dropped, not blow up the ANSI cast (Spark 4 CAST
    * throws on overflow — the degrade-never-throw discipline). */
  def crawlDelays(robots: DataFrame, agent: String = agent): DataFrame =
    chosenLines(robots, agent)
      .filter(col("directive") === "crawl-delay"
        && col("value").rlike("^[0-9]{1,18}$"))
      .groupBy("host")
      .agg(max(col("value").cast("long")).as("delay_s"))

  /** Sitemap pointers: (host, ln, sitemap_url). Group-BLIND — the
    * Sitemap directive is host-global per the sitemaps.org extension
    * (valid anywhere in the file, independent of user-agent), so this
    * reads [[parsedLines]] directly, keeping the source line for
    * document order. The crawl-side discovery composition: robots.txt →
    * sitemap urls → [[Sitemaps.parse]] → frontier. */
  def sitemapPointers(robots: DataFrame): DataFrame =
    parsedLines(robots)
      .filter(col("directive") === "sitemap" && col("value") =!= "")
      .select(col("host"), col("ln").cast("long").as("ln"),
        col("value").as("sitemap_url"))

  /** The RFC 9309 §2.2.3 wildcard characters a rule path may carry:
    * `*` matches any character sequence (including '/'), a TRAILING
    * `$` anchors the match at the path's end; every OTHER character is
    * literal — including an interior '$' (the Google parser's
    * reading). Implemented as rule → anchored regex: escape the regex
    * metacharacters with ONE fold over this list, then '*' → '.*' and
    * '^' + optional '$'. [[ruleRegexCol]] (Spark) and [[ruleRegexSql]]
    * (the oracle) are generated from this SAME list — two engines, one
    * escape table; a drifting copy would silently un-sync the verdicts.
    * '*' is absent here (it becomes '.*'); a literal-only rule's regex
    * '^literal' is exactly the previous prefix-match semantics. */
  private val regexSpecials: Seq[String] =
    Seq("\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$")

  private def ruleRegexCol(rpath: Column): Column = {
    val anchored = rpath.endsWith("$")
    val body = when(anchored, rpath.substr(lit(1), length(rpath) - 1))
      .otherwise(rpath)
    val esc = regexSpecials.foldLeft(body)((acc, ch) =>
      replace(acc, lit(ch), lit("\\" + ch)))
    concat(lit("^"), replace(esc, lit("*"), lit(".*")),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** [[ruleRegexCol]] spelled as a DuckDB expression over a rule-path
    * SQL expression `e` — the fold runs over the same [[regexSpecials]]
    * list at string-build time. */
  def ruleRegexSql(e: String): String = {
    val body =
      s"(CASE WHEN $e LIKE '%$$' THEN substr($e, 1, length($e) - 1) ELSE $e END)"
    val esc = regexSpecials.foldLeft(body)((acc, ch) =>
      s"replace($acc, '$ch', '\\$ch')")
    s"('^' || replace($esc, '*', '.*') || " +
      s"(CASE WHEN $e LIKE '%$$' THEN '$$' ELSE '' END))"
  }

  /** Per-url robots verdict: (url, host, path, allowed, rule, rtype).
    * `rule`/`rtype` are ''/'' when no rule matched. The rule table
    * rides a broadcast host-equality join; the longest-match argmax is
    * max(struct(len, allow, rpath, rtype)) — rule STRING length
    * (wildcards count as one char, the Google parser's specificity),
    * allow outranks disallow at equal length, the path component only
    * breaks ties between same-verdict rules. Matching is the anchored
    * wildcard regex ([[ruleRegexCol]]); Spark's RLike caches the last
    * compiled pattern per instance, and the broadcast rule side is
    * host-clustered, so recompilation is per rule, not per row. */
  def filter(urls: DataFrame, urlCol: String, robots: DataFrame,
      agent: String = agent): DataFrame = {
    val rules = applicableRules(robots, agent)
      .withColumn("rpat", ruleRegexCol(col("rpath")))
    val withPath = urls.select(col(urlCol).as("url"),
      Urls.hostOf(urlCol).as("host"), Urls.pathOf(urlCol).as("path"))
      // barrier: withPath feeds both the verdict agg and the final
      // join-back — without it the url side scans and re-parses twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val best = withPath.join(broadcast(rules), Seq("host"))
      .filter(expr("regexp_like(path, rpat)"))
      .groupBy("url")
      .agg(max(struct(length(col("rpath")).as("len"),
        (col("rtype") === "allow").cast("int").as("a"),
        col("rpath").as("rpath"), col("rtype").as("rtype"))).as("best"))
    withPath.join(best, Seq("url"), "left")
      .select(col("url"), col("host"), col("path"),
        coalesce(col("best.a") === 1, lit(true)).as("allowed"),
        coalesce(col("best.rpath"), lit("")).as("rule"),
        coalesce(col("best.rtype"), lit("")).as("rtype"))
  }

  /** The [[parsedLines]] replay: `lines2(host, ln, directive, value)`
    * with DuckDB's 1-BASED ln (Spark's posexplode is 0-based; only
    * order matters inside the group scan, but any oracle that OUTPUTS
    * ln must subtract 1). ONE owner for all three robots oracles. */
  private def linesCtes: String = s"""lines0 AS (
  SELECT host, unnest(range(1, len(ls) + 1)) AS ln, unnest(ls) AS line0
  FROM (SELECT host, string_split(txt, chr(10)) AS ls FROM robots)
),
lines1 AS (
  SELECT host, ln, trim(split_part(line0, '#', 1)) AS line FROM lines0
  WHERE instr(trim(split_part(line0, '#', 1)), ':') > 0
),
lines2 AS (
  SELECT host, ln,
    lower(trim(substr(line, 1, instr(line, ':') - 1))) AS directive,
    trim(substr(line, instr(line, ':') + 1)) AS value
  FROM lines1
)"""

  /** The [[chosenLines]] replay: group scan + agent-level choice ending
    * in `grouped` + `chosen(host, grp)`. Appends to [[linesCtes]]. */
  private def groupCtes: String = s"""kept AS (
  SELECT *, directive = 'user-agent' AS isua FROM lines2
  WHERE directive IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
),
marked AS (
  SELECT *, isua AND NOT coalesce(
    lag(isua) OVER (PARTITION BY host ORDER BY ln), false) AS newg
  FROM kept
),
grouped AS (
  SELECT *, sum(CASE WHEN newg THEN 1 ELSE 0 END) OVER (
    PARTITION BY host ORDER BY ln
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM marked
),
ga AS (
  SELECT host, grp, max(lower(value) = lower('$agent')) AS ex,
         max(value = '*') AS st
  FROM grouped WHERE isua GROUP BY host, grp
),
hostlevel AS (SELECT host, max(ex) AS any_ex FROM ga GROUP BY host),
chosen AS (
  SELECT ga.host, ga.grp FROM ga JOIN hostlevel USING (host)
  WHERE CASE WHEN any_ex THEN ex ELSE st END
)"""

  /** The DuckDB replay of [[sitemapPointers]] — [[linesCtes]] only
    * (group-blind), ln re-based to Spark's 0-based posexplode. */
  def sitemapOracleSql: String = s"""
WITH robots(host, txt) AS (VALUES
  $fixtureValuesSql),
$linesCtes
SELECT host, CAST(ln - 1 AS BIGINT) AS ln, value AS sitemap_url
FROM lines2 WHERE directive = 'sitemap' AND value != ''
ORDER BY host, ln"""

  /** The DuckDB replay of [[crawlDelays]] over the same fixtures. */
  def crawlDelayOracleSql: String = s"""
WITH robots(host, txt) AS (VALUES
  $fixtureValuesSql),
$linesCtes,
$groupCtes
SELECT g.host, CAST(max(CAST(g.value AS BIGINT)) AS BIGINT) AS delay_s
FROM grouped g JOIN chosen c ON g.host = c.host AND g.grp = c.grp
WHERE g.directive = 'crawl-delay' AND regexp_matches(g.value, '^[0-9]{1,18}$$')
GROUP BY g.host ORDER BY g.host"""

  /** The DuckDB replay of [[applicableRules]]+[[filter]] over the same
    * fixtures — zipped unnests for posexplode, lag + framed running sum
    * for the boundary scan, row_number for the argmax. */
  def oracleSql: String =
    oracleSqlFor(s"""raw(url) AS (VALUES
  $urlValuesSql)""")

  /** [[oracleSql]] with a caller-supplied CTE fragment that must end
    * by defining `raw(url)` — composition seam for oracles that feed a
    * DIFFERENT url set (e.g. the admission-gated frontier) through the
    * identical verdict replay. */
  def oracleSqlFor(rawCtes: String): String = s"""
WITH robots(host, txt) AS (VALUES
  $fixtureValuesSql),
$rawCtes,
$linesCtes,
$groupCtes,
rules AS (
  SELECT g.host, g.directive AS rtype, g.value AS rpath
  FROM grouped g JOIN chosen c ON g.host = c.host AND g.grp = c.grp
  WHERE NOT g.isua AND g.directive IN ('allow', 'disallow')
    AND g.grp > 0 AND g.value != ''
),
u1 AS (SELECT url, split_part(split_part(url, '#', 1), '?', 1) AS base FROM raw),
u2 AS (SELECT url, CASE WHEN instr(base, '://') > 0
         THEN substr(base, instr(base, '://') + 3) ELSE '' END AS rest FROM u1),
u3 AS (SELECT url, rest,
         list_extract(string_split(split_part(rest, '/', 1), '@'), -1) AS hostport
       FROM u2),
withpath AS (
  SELECT url,
    CASE WHEN hostport LIKE '[%' THEN lower(substr(hostport, 1, instr(hostport, ']')))
         ELSE lower(split_part(hostport, ':', 1)) END AS host,
    CASE WHEN instr(rest, '/') > 0 THEN substr(rest, instr(rest, '/')) ELSE '/' END AS path
  FROM u3
),
best AS (
  SELECT url, rpath, rtype FROM (
    SELECT w.url, r.rpath, r.rtype, row_number() OVER (
      PARTITION BY w.url
      ORDER BY length(r.rpath) DESC, (r.rtype = 'allow') DESC,
               r.rpath DESC, r.rtype DESC) AS rn
    FROM withpath w JOIN rules r ON w.host = r.host
    WHERE regexp_matches(w.path, ${ruleRegexSql("r.rpath")})
  ) WHERE rn = 1
)
SELECT w.url, w.host, w.path,
  coalesce(b.rtype = 'allow', true) AS allowed,
  coalesce(b.rpath, '') AS rule,
  coalesce(b.rtype, '') AS rtype
FROM withpath w LEFT JOIN best b USING (url)
ORDER BY w.url"""
}
