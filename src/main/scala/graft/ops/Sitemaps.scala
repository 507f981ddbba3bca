package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sitemaps.org sitemap parsing — the crawl-side URL *discovery*
  * channel that complements robots.txt's admission channel (the
  * reference's analogous stage is its input triage: deciding what
  * enters the pipeline and as which kind,
  * /root/reference/src/ocrmypdf/_pipeline.py:170-202 `triage` — here
  * the intake manifest is the Sitemap protocol,
  * www.sitemaps.org/protocol.html).
  *
  * Semantics implemented (documented scope, pinned by the unit suite):
  *  - a document sniffing `<sitemapindex` is an INDEX (child-sitemap
  *    pointers, `<sitemap><loc>`); else `<urlset` is a URLSET
  *    (`<url><loc>` + optional `<lastmod>`); anything else is invalid
  *    and yields no entries (index sniff wins if both tags appear);
  *  - entries keep DOCUMENT ORDER (`ord`) — sitemap order is the
  *    publisher's priority hint, a crawler consumes it ordered;
  *  - `<loc>` values are whitespace-trimmed and XML-entity-unescaped
  *    (the five predefined entities; `&amp;` is unescaped LAST so a
  *    double-escaped `&amp;lt;` correctly becomes the literal `&lt;`);
  *  - the protocol's SCOPE rule: an entry only applies when its loc
  *    starts with the sitemap's own directory prefix (scheme + host +
  *    path up to the last '/'), which subsumes the same-host and
  *    same-scheme requirements — surfaced as `in_scope`, not dropped
  *    (a corpus audit wants to SEE the violations);
  *  - `<lastmod>` is W3C datetime; the calendar-day prefix is kept when
  *    it is well-formed (`YYYY-MM-DD...`), else '' — full time-zone
  *    datetime arithmetic is out of scope (documented).
  *
  * Everything is builtin regexp/string algebra replayed verbatim by the
  * DuckDB oracle (patterns stay inside the Java-regex ∩ RE2 dialect
  * intersection: `(?s)`, non-greedy `.*?`, and EXPLICIT character
  * classes — `\s` is avoided because Java's includes U+000B where
  * RE2's does not; the trim class is spelled `[ \t\n\r\f]`).
  *
  * 100 TB shape: sitemap documents are one-per-host-ish — thousands of
  * times fewer than pages — and every step here is a narrow per-row
  * projection (regexp extract → posexplode → string algebra); the only
  * exchange is whatever the CONSUMER does with the entries (e.g. the
  * frontier anti-join), which shuffles compact (loc) keys, never XML.
  */
object Sitemaps {

  /** (sitemap_url, xml body) fixtures — adversarial coverage: in/out-of-
    * scope locs, cross-host and cross-scheme locs, entity-escaped locs,
    * multi-line pretty-printed entries, lastmod as bare date / full W3C
    * datetime / garbage / absent, an index with in/out-of-scope
    * children, and a non-sitemap body. */
  val fixture: Seq[(String, String)] = Seq(
    "https://host07.example.com/a/sitemap.xml" -> Seq(
      """<?xml version="1.0" encoding="UTF-8"?>""",
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""",
      "<url><loc>https://host07.example.com/a/page1</loc>" +
        "<lastmod>2026-03-14</lastmod></url>",
      // pretty-printed entry: loc on its own line, W3C full datetime
      "<url>",
      "  <loc>",
      "    https://host07.example.com/a/sub/page2",
      "  </loc>",
      "  <lastmod>2026-03-15T09:30:00+00:00</lastmod>",
      "</url>",
      // entity-escaped query ampersand; double-escaped &amp;lt; stays &lt;
      "<url><loc>https://host07.example.com/a/q?x=1&amp;y=2&amp;lt;</loc></url>",
      // OUT of the /a/ directory scope, same host
      "<url><loc>https://host07.example.com/b/other</loc>" +
        "<lastmod>not-a-date</lastmod></url>",
      // cross-host and cross-scheme: both out of scope
      "<url><loc>https://evil.example.net/a/page1</loc></url>",
      "<url><loc>http://host07.example.com/a/page1</loc></url>",
      "</urlset>").mkString("\n"),
    "https://host08.example.net/sitemap_index.xml" -> Seq(
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""",
      "<sitemap><loc>https://host08.example.net/maps/part1.xml</loc>" +
        "<lastmod>2026-01-02</lastmod></sitemap>",
      "<sitemap><loc>https://host08.example.net/maps/part2.xml</loc></sitemap>",
      // child on another host: out of scope
      "<sitemap><loc>https://cdn.example.org/part3.xml</loc></sitemap>",
      "</sitemapindex>").mkString("\n"),
    // not a sitemap at all: contributes zero entry rows
    "https://host09.example.org/sitemap.xml" ->
      "<html><body>404 not found</body></html>")

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** XML text-node normalization — ONE owner shared with [[Feeds]]:
    * whitespace-trim (explicit class; `\s` differs between Java and
    * RE2 at U+000B) then the five predefined entities, `&amp;` LAST so
    * double-escaped `&amp;lt;` correctly becomes the literal `&lt;`. */
  private[ops] def xmlText(c: Column): Column = {
    val t = regexp_replace(c, "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$", "")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(t) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
  }

  /** The DuckDB spelling of [[xmlText]] over SQL expression `e`
    * ('g'-flag trim — DuckDB replaces only the FIRST match without
    * it; replace() is always global in both engines). */
  private[ops] def xmlTextSql(e: String): String =
    "replace(replace(replace(replace(replace(" +
      s"regexp_replace($e, '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$$', '', 'g'), " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), " +
      "'&apos;', ''''), '&amp;', '&')"

  def fixtureValuesSql: String =
    fixture.map { case (u, x) => s"(${q(u)}, ${q(x)})" }.mkString(",\n  ")

  def fixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixture.toDF("sm_url", "xml")
  }

  /** Parse sitemap bodies into ordered entries:
    * (sm_url, kind, ord, loc, lastmod_day, in_scope). Invalid bodies
    * yield no rows; kind ∈ {'urlset','index'} on every emitted row. */
  def parse(sitemaps: DataFrame): DataFrame = {
    val kind = when(instr(col("xml"), "<sitemapindex") > 0, lit("index"))
      .when(instr(col("xml"), "<urlset") > 0, lit("urlset"))
      .otherwise(lit(""))
    // directory scope: the sitemap url through its LAST '/'
    val scope = expr(
      "substr(sm_url, 1, length(sm_url) - instr(reverse(sm_url), '/') + 1)")
    val entries = when(col("kind") === "index",
      regexp_extract_all(col("xml"), lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
      .otherwise(
        regexp_extract_all(col("xml"), lit("(?s)<url>(.*?)</url>"), lit(1)))
    // trim + entity unescape: the shared [[xmlText]] owner
    val loc = xmlText(regexp_extract(col("entry"), "(?s)<loc>(.*?)</loc>", 1))
    val lm0 = regexp_replace(
      regexp_extract(col("entry"), "(?s)<lastmod>(.*?)</lastmod>", 1),
      "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$", "")
    sitemaps
      .withColumn("kind", kind).filter(col("kind") =!= "")
      .withColumn("scope", scope)
      .select(col("sm_url"), col("kind"), col("scope"),
        posexplode(entries).as(Seq("ord", "entry")))
      .select(col("sm_url"), col("kind"), col("ord").cast("long").as("ord"),
        loc.as("loc"),
        when(lm0.rlike("^\\d{4}-\\d{2}-\\d{2}"), substring(lm0, 1, 10))
          .otherwise(lit("")).as("lastmod_day"),
        col("scope"))
      .select(col("sm_url"), col("kind"), col("ord"), col("loc"),
        col("lastmod_day"),
        startswith(col("loc"), col("scope")).as("in_scope"))
  }

  /** The DuckDB replay of [[parse]] over the same fixtures — zipped
    * unnest(range)/unnest(list) for posexplode, the same regex dialect
    * subset, replace-chain entity unescape, 'g'-flag regexp trim
    * (DuckDB's regexp_replace replaces only the FIRST match without
    * it; Spark's always replaces all). */
  def oracleSql: String = s"""
WITH sm(sm_url, xml) AS (VALUES
  $fixtureValuesSql),
k AS (
  SELECT sm_url, xml,
    CASE WHEN instr(xml, '<sitemapindex') > 0 THEN 'index'
         WHEN instr(xml, '<urlset') > 0 THEN 'urlset'
         ELSE '' END AS kind,
    substr(sm_url, 1, length(sm_url) - instr(reverse(sm_url), '/') + 1) AS scope
  FROM sm
),
es AS (
  SELECT sm_url, kind, scope,
    CASE WHEN kind = 'index'
      THEN regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1)
      ELSE regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) END AS entries
  FROM k WHERE kind != ''
),
ex AS (
  SELECT sm_url, kind, scope,
    unnest(range(len(entries))) AS ord, unnest(entries) AS entry
  FROM es
),
un AS (
  SELECT sm_url, kind, CAST(ord AS BIGINT) AS ord, scope,
    ${xmlTextSql("regexp_extract(entry, '(?s)<loc>(.*?)</loc>', 1)")} AS loc,
    regexp_replace(regexp_extract(entry, '(?s)<lastmod>(.*?)</lastmod>', 1),
      '^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$$', '', 'g') AS lm0
  FROM ex
)
SELECT sm_url, kind, ord, loc,
  CASE WHEN regexp_matches(lm0, '^\\d{4}-\\d{2}-\\d{2}')
       THEN substr(lm0, 1, 10) ELSE '' END AS lastmod_day,
  starts_with(loc, scope) AS in_scope
FROM un ORDER BY sm_url, ord"""
}
