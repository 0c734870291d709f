package graft.catalog
import graft.Catalog.Q
object IndexQueries { def qs: Seq[Q] = Seq() }
