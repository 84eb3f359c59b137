package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup: the same page arrives as
  * `HTTP://WWW.Site.com:80/a/?b=2&a=1&utm_source=x#frag` and
  * `http://site.com/a?a=1&b=2`, and byte-level dedup only collapses them
  * after canonicalization. Rules are the common-crawl conventions
  * (RFC 3986 §6 normalization plus the aggressive extras every pipeline
  * applies): lowercase scheme+host, strip a leading `www.`, drop default
  * ports (http:80 / https:443), drop the fragment, drop tracking params
  * (`utm_*`, `fbclid`, `gclid`), sort the remaining query params
  * byte-wise, and strip trailing path slashes (the empty path stays
  * empty).
  *
  * Pure Column composition — regexp extraction plus one `filter`/`sort`
  * HOF pair over the SPLIT PARAM LIST, whose length is bounded by the
  * URL itself (tens of elements), so the interpreted-lambda cost per row
  * is constant and tiny, unlike a per-dimension lambda over an embedding
  * relation. */
object Urls {

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:]+://([^/?]+)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rawPath = regexp_extract(noFrag, "^[^:]+://[^/?]+([^?]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"), p =>
        !(p.rlike("^(utm_[^=&]*|fbclid|gclid)(=|$)") || p === ""))),
      "&")
    // Schemeless input ("example.com/a") would make every extract above
    // return "" and the concat emit garbage "://..." — pass it through
    // untouched instead: not a canonicalizable absolute URL.
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }
}
