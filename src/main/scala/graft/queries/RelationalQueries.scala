package graft.queries

/** SURVEY §2.4 RQ1-RQ22 — relational breadth on the TPC-H-ish tables. */
object RelationalQueries {
  val defs: Seq[QueryDef] = Seq()
}
