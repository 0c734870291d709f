package graft.catalog
import graft.Catalog.Q
object DedupQueries { def qs: Seq[Q] = Seq() }
