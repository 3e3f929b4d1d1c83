package graft.queries

/** IO queries: partitioned parquet export/reload, CDC JSONL, snapshots. */
object IoQueries {
  val defs: Seq[QueryDef] = Seq()
}
