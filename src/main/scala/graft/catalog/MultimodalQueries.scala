package graft.catalog
import graft.Catalog.Q
object MultimodalQueries { def qs: Seq[Q] = Seq() }
