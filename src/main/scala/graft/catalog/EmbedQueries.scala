package graft.catalog
import graft.Catalog.Q
object EmbedQueries { def qs: Seq[Q] = Seq() }
