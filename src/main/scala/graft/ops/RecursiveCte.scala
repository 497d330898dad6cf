package graft.ops

import org.apache.spark.sql.DataFrame

/** Recursive CTE (reference: be/src/exec/operator/rec_cte_source_operator.h:173
  * anchor+iterate work-table loop; FE
  * LogicalRecursiveUnionToPhysicalRecursiveUnion.java; suites
  * regression-test/suites/rec_cte_p0/).
  *
  * Spark has no native recursion — this is the driver-side
  * iterate-until-fixpoint with UNION DISTINCT semantics. Each
  * iteration localCheckpoints the delta so lineage stays bounded; the
  * accumulator is the union of per-iteration deltas (each already
  * deduplicated against everything seen), mirroring the reference's
  * work-table discipline.
  */
object RecursiveCte {

  /** UNION DISTINCT recursion: acc = anchor; delta_{i+1} =
    * step(delta_i) \ acc. Stops when the delta is empty or maxIter.
    * With failOnMax, a non-converged fixpoint at maxIter throws (the
    * SQL WITH RECURSIVE depth guard) instead of silently truncating. */
  def iterate(anchor: DataFrame, step: DataFrame => DataFrame,
              maxIter: Int = 100, failOnMax: Boolean = false): DataFrame = {
    var acc = anchor.distinct().localCheckpoint(eager = true)
    var delta = acc
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      delta = step(delta).distinct().exceptAll(acc)
        .localCheckpoint(eager = true)
      if (!delta.isEmpty) acc = acc.union(delta).localCheckpoint(eager = true)
      i += 1
    }
    if (failOnMax && i >= maxIter && !delta.isEmpty)
      throw new IllegalStateException(
        s"recursive CTE did not converge within $maxIter iterations " +
        "(spark.graft.recursiveCte.maxDepth)")
    acc
  }

  /** UNION ALL recursion (bag semantics): the working table is the
    * rows produced by the PREVIOUS iteration only; every produced row
    * is appended to the result. Terminates when an iteration produces
    * no rows — the recursive term must be data-bounded (a WHERE that
    * eventually empties), exactly as in the reference / standard SQL.
    * With failOnMax, hitting maxIter with a non-empty delta throws. */
  def iterateAll(anchor: DataFrame, step: DataFrame => DataFrame,
                 maxIter: Int = 100, failOnMax: Boolean = false): DataFrame = {
    var acc = anchor.localCheckpoint(eager = true)
    var delta = acc
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      delta = step(delta).localCheckpoint(eager = true)
      if (!delta.isEmpty) acc = acc.union(delta).localCheckpoint(eager = true)
      i += 1
    }
    if (failOnMax && i >= maxIter && !delta.isEmpty)
      throw new IllegalStateException(
        s"recursive CTE did not converge within $maxIter iterations " +
        "(spark.graft.recursiveCte.maxDepth)")
    acc
  }
}
