package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level curation for crawled corpora — the stage C4/RefinedWeb run
  * BEFORE any content dedup: canonicalize each document's URL, drop
  * blocklisted domains, and keep one document per canonical URL. At 100 TB
  * this removes the cheapest duplicates first (same page fetched with
  * different tracking params / case / fragments) without touching document
  * text at all: normalization is a pure per-row regex projection (scan
  * speed, whole-stage codegen), and the dedup shuffles only
  * (url, id) pairs, never content.
  *
  * Everything is written in the Java∩RE2 regex subset with deterministic
  * string ops only, so the whole tier is hash-oracle-able cross-engine
  * (same discipline as [[graft.functions.TextFunctions]]).
  *
  * Reference scope note: the reference pipeline (rabbit-data-pipeline) has
  * no URL tier — this is part of the beyond-reference LLM-pipeline surface
  * (SURVEY.md §2 "Beyond-reference tier").
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, or empty string for non-URL input. */
  def urlScheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host[:port] (the authority up to the first `/`, `?` or
    * `#`). Userinfo is not split off (out of scope — crawled corpora
    * don't carry credentials).
    */
  def urlHostPort(url: Column): Column =
    lower(regexp_extract(url, SchemeRe + "([^/?#]*)", 2))

  /** Host with the scheme's DEFAULT port stripped (`:80` for http, `:443`
    * for https) — a non-default port is a different origin and stays.
    */
  def urlHost(url: Column): Column = {
    val hp = urlHostPort(url)
    when(urlScheme(url) === "http", regexp_replace(hp, ":80$", ""))
      .when(urlScheme(url) === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Path component (before `?`/`#`), canonicalized: trailing slash runs
    * dropped, empty path → `/`.
    */
  def urlPath(url: Column): Column = {
    val p = regexp_replace(
      regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 2), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Query string canonicalized: tracking parameters dropped (any param
    * whose NAME matches `dropParamRe` — default utm_*, fbclid, gclid,
    * ref), the rest sorted byte-wise so param order can't fork duplicate
    * URLs. Empty after dropping → empty string.
    */
  def urlQueryCanonical(url: Column,
                        dropParamRe: String = DefaultDropParamRe): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(q, "&"),
      p => length(p) > 0 && !p.rlike(dropParamRe))
    array_join(array_sort(params), "&")
  }

  /** Param-name patterns dropped by default: the cross-site tracking
    * params that fork one page into many URLs.
    */
  val DefaultDropParamRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Canonical form of a URL: lowercased scheme and host, default port
    * stripped, trailing-slash-normalized path, tracking params dropped and
    * the rest sorted, fragment dropped. NULL for input with no
    * `scheme://` prefix (callers filter or quarantine those rows).
    */
  def normalizeUrl(url: Column,
                   dropParamRe: String = DefaultDropParamRe): Column =
    when(urlScheme(url) === "", lit(null).cast("string")).otherwise(
      graft.functions.ExprOps.let(urlQueryCanonical(url, dropParamRe)) { q =>
        concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
          when(q === "", lit("")).otherwise(concat(lit("?"), q)))
      })

  /** Registrable-domain approximation: the last two dot-labels of the host
    * (`a.b.site.example.com` → `example.com`). A public-suffix list would
    * refine multi-label TLDs (`co.uk`) — documented approximation, same
    * trade C4 makes. Any `:port` suffix is stripped FIRST — [[urlHost]]
    * keeps non-default ports (different origin), but the registrable
    * domain is port-independent; without the strip, `bad.com:8080` would
    * extract to `''` and sail past every domain blocklist.
    */
  def urlDomain(url: Column): Column =
    regexp_extract(regexp_replace(urlHost(url), ":[0-9]+$", ""),
      "([^.:]+\\.[^.:]+)$", 1)

  /** Drop rows whose registrable domain is blocklisted. The blocklist is a
    * literal IN-predicate pushed into the scan — zero joins, zero
    * shuffles, any corpus size.
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: Seq[String]): DataFrame =
    df.filter(!urlDomain(col(urlCol)).isin(blocked.map(_.toLowerCase): _*))

  /** URL-level dedup: keep exactly one row (smallest `idCol`) per
    * canonical URL. Adds the `url_norm` column. Rows whose URL fails to
    * normalize (no scheme) are KEPT — a malformed URL is no evidence two
    * documents are the same page; each gets a synthetic per-row window
    * key (space-prefixed, which no real canonical URL can start with —
    * schemes begin with a letter), so a corpus with millions of
    * malformed URLs never funnels them through one window partition. The
    * only shuffle carries (window key, id, row) — content columns ride
    * the shuffle but are never compared; at 100 TB project down to
    * (id, url) first and semi-join the winners back if rows are wide.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String,
                 dropParamRe: String = DefaultDropParamRe): DataFrame = {
    val withNorm = df.withColumn("url_norm",
      normalizeUrl(col(urlCol), dropParamRe))
    val pkey = coalesce(col("url_norm"),
      concat(lit(" malformed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(pkey).orderBy(col(idCol))
    withNorm
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }
}
