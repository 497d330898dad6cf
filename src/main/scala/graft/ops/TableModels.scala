package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Doris table models re-expressed as read-time finalize views
  * (reference: fe/fe-core/.../catalog/KeysType.java:27-29 —
  * DUP_KEYS / UNIQUE_KEYS / AGG_KEYS; per-column aggregate types
  * fe/fe-catalog/.../AggregateType.java:29-38; MoW delete-bitmap
  * analog: the row_number dedup below).
  *
  * DUP = plain append (no code needed). UNIQUE = keep the
  * highest-sequence version per key (Doris merge-on-read; a
  * write-time MERGE materialization gives merge-on-write). AGG =
  * groupBy(keys) with per-column aggregate semantics.
  */
object TableModels {

  /** UNIQUE-keys view: latest version per key by sequence column.
    * `tiebreak` columns make the pick deterministic when the physical
    * key is not unique within one load (cover every projected column
    * and residual ties are between identical rows). */
  def uniqueView(df: DataFrame, keys: Seq[String], seqCol: String,
                 tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc +: tiebreak.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-column aggregate spec for the AGG model. */
  sealed trait AggType { def expr(c: String, seqCol: String): Column }
  case object Sum extends AggType { def expr(c: String, s: String): Column = sum(col(c)).as(c) }
  case object Min extends AggType { def expr(c: String, s: String): Column = min(col(c)).as(c) }
  case object Max extends AggType { def expr(c: String, s: String): Column = max(col(c)).as(c) }
  /** REPLACE: value from the highest-sequence row. */
  case object Replace extends AggType {
    def expr(c: String, s: String): Column = max_by(col(c), col(s)).as(c)
  }
  /** REPLACE_IF_NOT_NULL: highest-sequence non-null value. */
  case object ReplaceIfNotNull extends AggType {
    def expr(c: String, s: String): Column =
      max_by(col(c), when(col(c).isNotNull, col(s))).as(c)
  }

  /** AGG-keys finalize view. */
  def aggView(df: DataFrame, keys: Seq[String], seqCol: String,
              specs: Seq[(String, AggType)]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(specs.head._2.expr(specs.head._1, seqCol),
        specs.tail.map { case (c, t) => t.expr(c, seqCol) }: _*)

  /** UNIQUE-key partial-column update (reference: partial update on
    * merge-on-write unique tables — an update load carries only the
    * key plus the touched columns; untouched columns keep their stored
    * value, and keys absent from the base insert with NULL for the
    * untouched columns — the reference's insert-with-defaults mode).
    * Column-level replacement is by PRESENCE in the update load, so a
    * touched column set to NULL really becomes NULL.
    *
    * Scale shape: ONE key-partitioned full-outer join; at 100 TB both
    * sides shuffle once on the key (or colocate if bucketed), and the
    * projection is stateless. `updates` must hold `keys` plus a subset
    * of base's remaining columns. */
  def partialUpdate(base: DataFrame, updates: DataFrame,
                    keys: Seq[String]): DataFrame = {
    val touched = updates.columns.filterNot(keys.contains).toSeq
    require(touched.nonEmpty && touched.forall(base.columns.contains),
      s"update columns ${touched.mkString(",")} must be base columns")
    val uR = touched.foldLeft(updates.withColumn("__upd", lit(1))) {
      (d, c) => d.withColumnRenamed(c, s"__u_$c")
    }
    val joined = base.join(uR, keys, "full_outer")
    val outCols = base.columns.toSeq.map { c =>
      if (keys.contains(c)) col(c)
      else if (touched.contains(c))
        when(col("__upd") === 1, col(s"__u_$c")).otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(outCols: _*)
  }
}
