package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r16 diagnostic: per-stage timing of ml_substring_dedup (w=8) and
  * ml_line_dedup at sf0.1. */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
          md5(expr(s"array_join(slice(ws, p, $w), ' ')")).as("hs"))
      time("shingle explode alone") { noop(shingles) }
      val dupSh = shingles.groupBy(col("hs"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      time("dupSh agg") { noop(dupSh) }
      val dupPos = shingles.join(dupSh, "hs").select(col("id"), col("p"))
      time("dupPos join (re-explodes)") { noop(dupPos) }
      val wOrd = Window.partitionBy(col("id")).orderBy(col("p"))
      val spans = dupPos
        .withColumn("brk",
          when(lag(col("p"), 1).over(wOrd).isNull ||
            col("p") > lag(col("p"), 1).over(wOrd) + (w - 1), 1).otherwise(0))
        .withColumn("island", sum(col("brk"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("id"), col("island"))
        .agg(min(col("p")).as("s"), (max(col("p")) + (w - 1)).as("e"),
          count(lit(1)).as("npos"))
      time("span windows + agg") { noop(spans) }
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
