package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r16/r17 diagnostic: per-stage timing of ml_substring_dedup (w=8) and
  * the join-back A/B (two-pass agg+join vs single-pass count window).
  * Usage: runMain graft.SubstrProbe [dataDir] — dataDir defaults to the
  * repo-relative target/scale/sf0.1_x5 (the bench's 5x replication;
  * build it first via a bench run or ScaleProbe), consistent with the
  * sibling probes. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf0.1_x5")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sp] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val w = 8

    for (rnd <- 1 to 2) {
      println(s"[sp] ---- round $rnd ----")
      val docs = Tables.load(spark, dir, "documents")
      val base = time("base checkpoint") {
        docs.select(col("doc_id").as("id"),
            split(coalesce(col("text"), lit("")), " ").as("ws"))
          .withColumn("len", size(col("ws")))
          .localCheckpoint()
      }
      val shingles = base.filter(col("len") >= w)
        .select(col("id"), explode(expr(s"sequence(1, len - ${w - 1})")).as("p"),
          col("ws"))
        .select(col("id"), col("p"),
          xxhash64(expr(s"slice(ws, p, $w)")).as("h1"),
          xxhash64(lit(1), expr(s"slice(ws, p, $w)")).as("h2"))
      time("shingle explode alone") { noop(shingles) }
      // A: two-pass — global frequency agg, then join-back (re-explodes)
      val dupSh = shingles.groupBy(col("h1"), col("h2"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      time("A dupSh agg") { noop(dupSh) }
      val dupPosA = shingles.join(dupSh, Seq("h1", "h2"))
        .select(col("id"), col("p"))
      time("A dupPos join (re-explodes)") { noop(dupPosA) }
      // B: single-pass — count window over the content key
      val dupPosB = shingles
        .withColumn("c", count(lit(1)).over(
          Window.partitionBy(col("h1"), col("h2"))))
        .filter(col("c") >= 2)
        .select(col("id"), col("p"))
      time("B dupPos window (single-pass)") { noop(dupPosB) }
      def spansOf(dupPos: DataFrame): DataFrame = {
        val wOrd = Window.partitionBy(col("id")).orderBy(col("p"))
        dupPos
          .withColumn("brk",
            when(lag(col("p"), 1).over(wOrd).isNull ||
              col("p") > lag(col("p"), 1).over(wOrd) + (w - 1), 1).otherwise(0))
          .withColumn("island", sum(col("brk"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("id"), col("island"))
          .agg(min(col("p")).as("s"), (max(col("p")) + (w - 1)).as("e"),
            count(lit(1)).as("npos"))
      }
      time("A spans (agg+join back)") { noop(spansOf(dupPosA)) }
      time("B spans (count window)") { noop(spansOf(dupPosB)) }
      time("full entry (ordered)") {
        noop(graft.ops.Dedup.substringDedupSpans(docs, "doc_id", "text", w)
          .orderBy(col("doc_id")))
      }
      time("line_dedup full") {
        noop(SparkEntry.queries("ml_line_dedup")(spark, dir))
      }
      time("quality_gopher full") {
        noop(SparkEntry.queries("ml_quality_gopher")(spark, dir))
      }
    }
    spark.stop()
  }
}
