package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed parsing — the third URL *discovery* channel next
  * to [[Sitemaps]] (publisher-pushed manifest) and [[Robots]] (admission
  * + sitemap pointers): feeds are how freshly-published pages surface
  * before any sitemap regenerates, so a crawl frontier consumes all
  * three. (Reference analog: the same input-triage role as the sitemap
  * stage, /root/reference/src/ocrmypdf/_pipeline.py:170-202 `triage` —
  * deciding what enters the pipeline; here the intake manifest dialects
  * are RSS 2.0 (cyber.harvard.edu/rss) and Atom (RFC 4287).)
  *
  * Semantics implemented (documented scope, pinned by the unit suite):
  *  - a body sniffing `<rss` is RSS (`<item>` entries); else `<feed`
  *    is Atom (`<entry>` entries); anything else is invalid and yields
  *    no rows (rss sniff wins if both appear — `<rss` is the root tag);
  *  - entries keep DOCUMENT ORDER (`ord`) — feeds are newest-first by
  *    convention; a frontier consumes them ordered;
  *  - RSS: `link` = `<link>` text; `title` = `<title>` text;
  *    `entry_id` = `<guid>` text (attributes like isPermaLink
  *    tolerated); `day` = the RFC 822 calendar day of `<pubDate>`
  *    (`D Mon YYYY` with English month names, zero-padded to ISO
  *    `YYYY-MM-DD`), '' when absent/unparseable — full RFC 822
  *    time-zone arithmetic is out of scope (documented);
  *  - Atom: `link` = the href of the first `<link>` whose rel is
  *    ABSENT or `"alternate"` (RFC 4287 §4.2.7.2: no rel means
  *    alternate; rel="self"/"hub" links are feed plumbing, not
  *    content), '' when none; `title` = `<title>` text (attributes
  *    like type="html" tolerated); `entry_id` = `<id>` text; `day` =
  *    the W3C datetime calendar-day prefix of `<updated>` (same rule
  *    as [[Sitemaps]] lastmod), '' otherwise;
  *  - text fields AND the Atom href attribute are whitespace-trimmed
  *    and XML-entity-unescaped with [[Sitemaps]]' shared five-entity
  *    fold (`&amp;` last) — attribute values carry the same entities
  *    as text nodes.
  *
  * Everything is builtin regexp/string algebra replayed verbatim by the
  * DuckDB oracle, inside the same Java-regex ∩ RE2 dialect subset as
  * [[Sitemaps]] (explicit character classes, `(?s)`, non-greedy).
  *
  * 100 TB shape: like sitemaps, feeds are one-per-site-ish — orders of
  * magnitude fewer than pages — and parsing is a narrow per-row
  * projection (regexp extract → posexplode → string algebra); the only
  * exchange belongs to the consumer (frontier anti-join on compact
  * link keys, never XML).
  */
object Feeds {

  /** (feed_url, body) fixtures — adversarial coverage: entity-escaped
    * and double-escaped text, pretty-printed multi-line entries,
    * RFC 822 dates with 1- and 2-digit days / garbage / absent,
    * Atom rel=self vs rel=alternate vs rel-less links (and a self-only
    * entry that must yield ''), cross-host links, guid attributes,
    * and a non-feed body. */
  val fixture: Seq[(String, String)] = Seq(
    "https://host11.example.com/feed.xml" -> Seq(
      """<?xml version="1.0" encoding="UTF-8"?>""",
      """<rss version="2.0"><channel><title>Site</title>""",
      "<item><title>R&amp;D update</title>" +
        "<link>https://host11.example.com/posts/rd-update</link>" +
        """<guid isPermaLink="false">tag:host11,2026:p1</guid>""" +
        "<pubDate>Tue, 03 Feb 2026 10:00:00 GMT</pubDate></item>",
      // pretty-printed: link on its own line, 1-digit RFC 822 day
      "<item>",
      "  <title>second</title>",
      "  <link>",
      "    https://host11.example.com/posts/two",
      "  </link>",
      "  <pubDate>Mon, 5 Jan 2026 09:30:00 +0200</pubDate>",
      "</item>",
      // cross-host link, garbage date, double-escaped title
      "<item><title>cross &amp;lt; host</title>" +
        "<link>https://cdn.example.net/mirrored</link>" +
        "<pubDate>yesterday</pubDate></item>",
      "</channel></rss>").mkString("\n"),
    "https://host12.example.org/atom.xml" -> Seq(
      """<feed xmlns="http://www.w3.org/2005/Atom">""",
      """<link rel="self" href="https://host12.example.org/atom.xml"/>""",
      "<entry>" +
        """<title type="html">Alt &amp; self</title>""" +
        """<link rel="self" href="https://host12.example.org/entry1.atom"/>""" +
        """<link rel="alternate" href="https://host12.example.org/posts/one"/>""" +
        "<id>urn:uuid:0001</id>" +
        "<updated>2026-03-15T09:30:00Z</updated></entry>",
      // rel-less link (RFC 4287: means alternate), entity-escaped
      // query ampersand in the href ATTRIBUTE, bare-date updated
      "<entry><title>plain</title>" +
        """<link href="https://host12.example.org/posts/two?a=1&amp;b=2"/>""" +
        "<id>urn:uuid:0002</id><updated>2026-03-16</updated></entry>",
      // ONLY a self link: no content link to emit
      "<entry><title>selfish</title>" +
        """<link rel="self" href="https://host12.example.org/entry3.atom"/>""" +
        "<updated>soon</updated></entry>",
      "</feed>").mkString("\n"),
    // not a feed at all: contributes zero entry rows
    "https://host13.example.net/feed" ->
      "<html><body>404 not found</body></html>")

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def fixtureValuesSql: String =
    fixture.map { case (u, x) => s"(${q(u)}, ${q(x)})" }.mkString(",\n  ")

  def fixtureDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixture.toDF("feed_url", "body")
  }

  private val monthNames = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** Parse feed bodies into ordered entries:
    * (feed_url, kind, ord, link, title, day, entry_id). Invalid bodies
    * yield no rows; kind ∈ {'rss','atom'} on every emitted row. */
  def parse(feeds: DataFrame): DataFrame = {
    val kind = when(instr(col("body"), "<rss") > 0, lit("rss"))
      .when(instr(col("body"), "<feed") > 0, lit("atom"))
      .otherwise(lit(""))
    val entries = when(col("kind") === "rss",
      regexp_extract_all(col("body"), lit("(?s)<item>(.*?)</item>"), lit(1)))
      .otherwise(
        regexp_extract_all(col("body"), lit("(?s)<entry>(.*?)</entry>"), lit(1)))
    def field(tag: String): Column = Sitemaps.xmlText(
      regexp_extract(col("entry"), s"(?s)<$tag[^>]*>(.*?)</$tag>", 1))
    // Atom content link: first <link ...> tag with no rel= or
    // rel="alternate"; its href attribute is the target
    val atomLinks = regexp_extract_all(col("entry"),
      lit("<link[^>]*>"), lit(0))
    val atomAlt = filter(atomLinks,
      l => not(l.rlike("rel=")) || l.rlike("rel=\"alternate\""))
    // try_element_at: ANSI element_at THROWS on an empty array; the
    // no-content-link entry must yield '' instead. The href ATTRIBUTE
    // value is entity-unescaped like RSS link TEXT (XML attribute
    // values carry the same five entities; RFC 4287 href is a URI —
    // '&amp;' query separators must decode)
    val atomHref = Sitemaps.xmlText(coalesce(
      regexp_extract(try_element_at(atomAlt, lit(1)), "href=\"([^\"]*)\"", 1),
      lit("")))
    // RFC 822 calendar day ('3 Feb 2026' / '5 Jan 2026') → ISO day
    val pd = field("pubDate")
    val rDay = regexp_extract(pd, s"([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})", 1)
    val rMon = regexp_extract(pd, s"([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})", 2)
    val rYr = regexp_extract(pd, s"([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})", 3)
    val monNum = monthNames.zipWithIndex.foldLeft(lit("")) {
      case (acc, (m, i)) =>
        when(rMon === m, lit(f"${i + 1}%02d")).otherwise(acc)
    }
    val rssDay = when(rMon =!= "",
      concat(rYr, lit("-"), monNum, lit("-"), lpad(rDay, 2, "0")))
      .otherwise(lit(""))
    val upd = field("updated")
    val atomDay = when(upd.rlike("^\\d{4}-\\d{2}-\\d{2}"),
      substring(upd, 1, 10)).otherwise(lit(""))
    feeds
      .withColumn("kind", kind).filter(col("kind") =!= "")
      .select(col("feed_url"), col("kind"),
        posexplode(entries).as(Seq("ord", "entry")))
      .select(col("feed_url"), col("kind"), col("ord").cast("long").as("ord"),
        when(col("kind") === "rss", field("link")).otherwise(atomHref)
          .as("link"),
        field("title").as("title"),
        when(col("kind") === "rss", rssDay).otherwise(atomDay).as("day"),
        when(col("kind") === "rss", field("guid")).otherwise(field("id"))
          .as("entry_id"))
  }

  /** The DuckDB replay of [[parse]] over the same fixtures (the same
    * zipped-unnest posexplode, regex subset, entity fold and month
    * table; list_filter/list_extract for the Atom link selection).
    * Produces the full entry table ordered by (feed_url, ord). */
  def oracleSql: String = {
    def fld(tag: String, as: String) =
      s"""${Sitemaps.xmlTextSql(s"regexp_extract(entry, '(?s)<$tag[^>]*>(.*?)</$tag>', 1)")} AS $as"""
    val monCase = monthNames.zipWithIndex.map { case (m, i) =>
      f"WHEN '$m' THEN '${i + 1}%02d'"
    }.mkString(" ")
    s"""
WITH fs(feed_url, body) AS (VALUES
  $fixtureValuesSql),
fk AS (
  SELECT feed_url, body,
    CASE WHEN instr(body, '<rss') > 0 THEN 'rss'
         WHEN instr(body, '<feed') > 0 THEN 'atom'
         ELSE '' END AS kind
  FROM fs
),
fes AS (
  SELECT feed_url, kind,
    CASE WHEN kind = 'rss'
      THEN regexp_extract_all(body, '(?s)<item>(.*?)</item>', 1)
      ELSE regexp_extract_all(body, '(?s)<entry>(.*?)</entry>', 1) END AS entries
  FROM fk WHERE kind != ''
),
fex AS (
  SELECT feed_url, kind,
    unnest(range(len(entries))) AS ord, unnest(entries) AS entry
  FROM fes
),
ffld AS (
  SELECT feed_url, kind, CAST(ord AS BIGINT) AS ord, entry,
    ${fld("link", "rss_link")},
    ${fld("title", "title")},
    ${fld("guid", "rss_id")},
    ${fld("id", "atom_id")},
    ${fld("pubDate", "pd")},
    ${fld("updated", "upd")},
    ${Sitemaps.xmlTextSql("""coalesce(regexp_extract(
      list_extract(list_filter(regexp_extract_all(entry, '<link[^>]*>'),
        l -> NOT regexp_matches(l, 'rel=')
             OR regexp_matches(l, 'rel="alternate"')), 1),
      'href="([^"]*)"', 1), '')""")} AS atom_href
  FROM fex
),
fday AS (
  SELECT *,
    regexp_extract(pd, '([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})', 1) AS r_day,
    regexp_extract(pd, '([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})', 2) AS r_mon,
    regexp_extract(pd, '([0-9]{1,2}) (${monthNames.mkString("|")}) ([0-9]{4})', 3) AS r_yr
  FROM ffld
)
SELECT feed_url, kind, ord,
  CASE WHEN kind = 'rss' THEN rss_link ELSE atom_href END AS link,
  title,
  CASE WHEN kind = 'rss' THEN
    CASE WHEN r_mon != '' THEN r_yr || '-' || (CASE r_mon $monCase END) || '-' || lpad(r_day, 2, '0') ELSE '' END
  ELSE
    CASE WHEN regexp_matches(upd, '^\\d{4}-\\d{2}-\\d{2}') THEN substr(upd, 1, 10) ELSE '' END
  END AS day,
  CASE WHEN kind = 'rss' THEN rss_id ELSE atom_id END AS entry_id
FROM fday ORDER BY feed_url, ord"""
  }
}
