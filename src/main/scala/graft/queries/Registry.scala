package graft.queries

/** Central registry of every correctness-gate query.
  *
  * Each family object contributes a Seq[QueryDef]; SparkEntry derives
  * its `queries` / `oracleSql` maps from here, so an operator is "done"
  * exactly when it has a QueryDef (VERDICT r1 requirement).
  */
object Registry {
  lazy val all: Seq[QueryDef] =
    RelationalQueries.defs ++
      FunctionQueries.defs ++
      DwhQueries.defs ++
      LlmQueries.defs ++
      IoQueries.defs ++
      StatQueries.defs

  /** Names benched by graft.Bench at sf0.1 — the data-proportional
    * queries (literal-input function goldens are excluded: they do no
    * table IO and would bench JVM noise, not the engine).
    */
  lazy val benchNames: Seq[String] =
    (RelationalQueries.defs ++ DwhQueries.defs ++ LlmQueries.defs ++ IoQueries.defs ++
      StatQueries.defs)
      .map(_.name)
}
