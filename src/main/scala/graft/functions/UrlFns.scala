package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F20 — URL scalar family: the ClickHouse `protocol`/`domain`/
  * `path`/`queryString`/`topLevelDomain` surface, the fields a
  * curation pipeline groups crawls by (domain-level dedup quotas,
  * source mixing weights, TLD quality priors all key on these).
  *
  * Cross-engine posture: every field is ONE regexp_extract with a
  * pattern shared verbatim between the Column face and the SQL face
  * (both engines return '' on no-match, and the patterns use only
  * portable character-class syntax — no lookaround, identical under
  * Java regex and RE2). No UDFs, no parse_url dependence.
  */
object UrlFns {

  /** (name, pattern, group) — the ONE table both faces render. */
  val Fields: Seq[(String, String, Int)] = Seq(
    ("protocol", "^([a-z][a-z0-9+.-]*)://", 1),
    ("host", "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1),
    ("path", "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
    // the first '?' BEFORE any fragment: a '?' inside the fragment is
    // not a query marker (r20 review finding)
    ("query", "^[^#?]*[?]([^#]*)", 1),
    ("tld", "^[a-z][a-z0-9+.-]*://[^/:?#]*[.]([a-z0-9-]+)(?:[:/?#]|$)", 1))

  def extract(url: Column, field: String): Column = {
    val (_, pat, grp) = Fields.find(_._1 == field)
      .getOrElse(throw new IllegalArgumentException(s"unknown field $field"))
    regexp_extract(url, pat, grp)
  }

  def extractSql(urlCol: String, field: String): String = {
    val (_, pat, grp) = Fields.find(_._1 == field)
      .getOrElse(throw new IllegalArgumentException(s"unknown field $field"))
    s"regexp_extract($urlCol, '$pat', $grp)"
  }
}
