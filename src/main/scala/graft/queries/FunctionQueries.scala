package graft.queries

/** F-family golden queries (filled in incrementally). */
object FunctionQueries {
  val defs: Seq[QueryDef] = Seq()
}
