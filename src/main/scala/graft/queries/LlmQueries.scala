package graft.queries

/** LLM-data-pipeline queries: dedup, similarity, text analysis, multimodal. */
object LlmQueries {
  val defs: Seq[QueryDef] = Seq()
}
