package graft

/** Prints the declared capability counts (README/COVERAGE bookkeeping):
  * total query keys, oracle-backed keys, and the rows-only remainder. */
object CountCaps extends App {
  val q = SparkEntry.queries.keySet
  val o = SparkEntry.oracleSql.keySet
  println(s"queries=${q.size} oracles=${o.size} rowsOnly=${(q -- o).toSeq.sorted.mkString(",")}")
  val orphans = o -- q
  if (orphans.nonEmpty) println(s"ORPHAN ORACLES (no query): ${orphans.toSeq.sorted.mkString(",")}")
}
