package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus dedup key (crawl pipelines
  * dedup by canonical URL before any content hash): lowercase scheme
  * and host, strip the scheme's default port, collapse the path's
  * trailing slashes, drop `utm_*` tracking parameters, sort the
  * remaining query parameters, drop the fragment.
  *
  * Pure scalar expression over native string functions — codegen'd,
  * no UDF; the only higher-order lambda (the utm filter) runs over a
  * handful of parsed parameters, not corpus rows. */
object Url {

  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1))
    val host =
      when(scheme === "http", regexp_replace(hostport, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val params = filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val query = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }
}
