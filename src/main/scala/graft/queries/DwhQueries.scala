package graft.queries

/** D-family (SCD2 / dims / facts / validator) queries. */
object DwhQueries {
  val defs: Seq[QueryDef] = Seq()
}
