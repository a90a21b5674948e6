package graft.queries

/** SURVEY §2.4 XQ* — LLM-data-pipeline extension operators. */
object ExtensionQueries {
  val defs: Seq[QueryDef] = Seq()
}
