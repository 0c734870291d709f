package graft.catalog

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.core.Tables
import graft.ops.Url

/** URL-level exact dedup over canonical forms ([[graft.ops.Url]]) —
  * crawl stage 0, the dedup that runs before any content is fetched
  * twice. Gate design mirrors `text_html_extract`'s generative-contract
  * trick: messy URLs synthesize deterministically from doc_id (three
  * variants per group — the clean form, a scheme/host-case + www +
  * default-port + slash-noise + tracking-params + fragment variant that
  * MUST canonicalize identically, and a reordered-surviving-params
  * variant that canonicalizes to a DIFFERENT url), and the DuckDB oracle
  * rebuilds both the messy url (same concatenation — pinning the
  * synthesis) and the expected canonical form DIRECTLY from doc_id
  * arithmetic, never parsing — so the canonicalizer must land exactly on
  * the contract, cross-engine, at both SFs, and the first-wins keep
  * verdict rides the same hash gate. */
object UrlQueries {

  /** Messy crawl-list synthesis, shared with UrlSpec: group g = id % 200,
    * variant v = (id / 200) % 3. */
  private[graft] def messyUrl(id: Long): String = {
    val g = id % 200
    val v = (id / 200) % 3
    val p = (g * 7) % 31
    v match {
      case 0L => s"https://site$g.example.org/articles/$p/page-$g"
      case 1L => s"HTTPS://WWW.Site$g.EXAMPLE.ORG:443//articles/$p//page-$g/" +
        s"?utm_source=feed&gclid=x$id#s$id"
      case _ => s"https://site$g.example.org/articles/$p/page-$g" +
        "?b=2&a=1&utm_campaign=news"
    }
  }

  val urlDedup = Q(
    "dedup_url_canonical",
    (s, dir) => {
      val messyUdf = udf((id: Long) => messyUrl(id))
      val canonUdf = udf((u: String) => Url.canonicalize(u))
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"), messyUdf(col("doc_id")).as("url"))
        .select(col("doc_id"), col("url"), canonUdf(col("url")).as("canon"))
      // first-wins keep per canonical group: a keeper join, not a window
      // (the keeper table is groups-sized and broadcasts at any scale)
      val keepers = urls.groupBy("canon").agg(min("doc_id").as("keeper"))
      urls.join(broadcast(keepers), Seq("canon"))
        .select(col("doc_id"), col("url"), col("canon"),
          when(col("doc_id") === col("keeper"), 1L).otherwise(0L).as("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH base AS (SELECT doc_id, doc_id % 200 AS g,
                           (doc_id // 200) % 3 AS v,
                           (doc_id % 200) * 7 % 31 AS p
                    FROM documents),
      u AS (SELECT doc_id,
                   CASE v
                     WHEN 0 THEN 'https://site' || g || '.example.org/articles/'
                                 || p || '/page-' || g
                     WHEN 1 THEN 'HTTPS://WWW.Site' || g || '.EXAMPLE.ORG:443'
                                 || '//articles/' || p || '//page-' || g
                                 || '/?utm_source=feed&gclid=x' || doc_id
                                 || '#s' || doc_id
                     ELSE 'https://site' || g || '.example.org/articles/'
                          || p || '/page-' || g || '?b=2&a=1&utm_campaign=news'
                   END AS url,
                   'https://site' || g || '.example.org/articles/' || p
                     || '/page-' || g
                     || CASE WHEN v = 2 THEN '?a=1&b=2' ELSE '' END AS canon
            FROM base),
      k AS (SELECT canon, min(doc_id) AS keeper FROM u GROUP BY canon)
      SELECT u.doc_id, u.url, u.canon,
             (CASE WHEN u.doc_id = k.keeper THEN 1 ELSE 0 END)::BIGINT AS keep
      FROM u JOIN k USING (canon)
      ORDER BY u.doc_id"""))

  def qs: Seq[Q] = Seq(urlDedup)
}
