package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-cleaning column expressions — the HTML/URL leg of the text
  * toolbox. Pure codegen'd Column pipelines (regexp_replace, parse_url),
  * no UDFs. */
object Web {

  /** Remove every '<...>' tag run, keeping visible text (including tag
    * contents — this is tag REMOVAL, not content extraction). */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]+>", "")

  /** Canonical page identity of a URL: https scheme, lower-cased host
    * with any leading "www." dropped, the path — query string and
    * fragment discarded (where tracking parameters and scroll anchors
    * live). The first-pass crawl-dedup key. */
  def canonicalUrl(c: Column): Column =
    concat(lit("https://"),
      regexp_replace(lower(parse_url(c, lit("HOST"))), "^www\\.", ""),
      parse_url(c, lit("PATH")))
}
