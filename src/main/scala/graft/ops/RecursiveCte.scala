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
    * step(delta_i) \ acc. Stops when the delta is empty or maxIter. */
  def iterate(anchor: DataFrame, step: DataFrame => DataFrame,
              maxIter: Int = 100): DataFrame = {
    var acc = anchor.distinct().localCheckpoint(eager = true)
    var delta = acc
    var i = 0
    while (i < maxIter && !delta.isEmpty) {
      delta = step(delta).distinct().exceptAll(acc)
        .localCheckpoint(eager = true)
      if (!delta.isEmpty) acc = acc.union(delta).localCheckpoint(eager = true)
      i += 1
    }
    acc
  }
}
