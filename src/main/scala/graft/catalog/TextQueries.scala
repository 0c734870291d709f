package graft.catalog
import graft.Catalog.Q
object TextQueries { def qs: Seq[Q] = Seq() }
