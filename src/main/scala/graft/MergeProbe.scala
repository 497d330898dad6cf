package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Round-16 diagnostic: per-JOB input-byte attribution for the hudi
  * MERGE one-pass gate (MergeOnePassSpec regression). Prints each
  * Spark job's input bytes + call site so the extra target scans are
  * attributable to a specific action in the merge dataflow. */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobBytes = mutable.LinkedHashMap.empty[Int, Long]
    val jobSite = mutable.LinkedHashMap.empty[Int, String]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
        val stages = js.stageInfos.map(si =>
          si.name.take(60) + "@" + si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("MergeProbe"))
            .getOrElse("").trim.take(90)).mkString(" | ")
        jobSite(js.jobId) = site.getOrElse("") + " :: " + stages
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          val j = stageToJob.getOrElse(te.stageId, -1)
          jobBytes(j) = jobBytes.getOrElse(j, 0L) +
            te.taskMetrics.inputMetrics.bytesRead
        }
    }

    val fmt = "hudi"
    val name = s"mop_probe_$fmt"
    spark.range(0, 300000)
      .selectExpr("id AS k", "CAST(id % 7 AS STRING) AS p",
        "CAST(id % 1000 AS INT) AS v", "repeat('x', 24) AS pad")
      .createOrReplaceTempView(s"mop_src_$name")
    spark.sql(s"CREATE OR REPLACE TABLE graft_$fmt.$name PRIMARY KEY (k) " +
      s"PARTITIONED BY (p) AS SELECT * FROM mop_src_$name")
    spark.range(0, 2000)
      .selectExpr("CASE WHEN id < 1500 THEN id * 100 ELSE 900000 + id END AS k",
        "CAST((CASE WHEN id < 1500 THEN id * 100 ELSE 900000 + id END) % 7 AS STRING) AS p",
        "CAST(id AS INT) AS v", "repeat('y', 24) AS pad")
      .createOrReplaceTempView(s"mop_upd_$name")

    def walk(f: java.io.File): Long =
      Option(f.listFiles()).getOrElse(Array.empty).map { c =>
        if (c.isDirectory) walk(c)
        else if (c.getName.endsWith(".parquet")) c.length() else 0L
      }.sum
    val base = walk(new java.io.File(s"target/lakehouse/$fmt/$name"))
    println(s"== table bytes: $base")

    spark.sparkContext.addSparkListener(listener)
    spark.sql(s"MERGE INTO graft_$fmt.$name t USING mop_upd_$name s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND s.v % 3 = 0 THEN UPDATE SET v = s.v + 1000000 " +
      "WHEN MATCHED AND s.v % 3 = 1 THEN DELETE " +
      "WHEN NOT MATCHED AND s.k >= 900000 THEN INSERT *").collect()
    org.apache.spark.sql.graftshim.ListenerShim.flush(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)

    val total = jobBytes.values.sum
    println(f"== total input bytes during MERGE: $total (${total * 1.0 / base}%.2fx of table)")
    jobBytes.toSeq.sortBy(-_._2).foreach { case (j, b) =>
      println(f"  job $j%4d  ${b}%10d bytes  (${b * 1.0 / base}%.2fx)  ${jobSite.getOrElse(j, "?")}")
    }
    spark.stop()
  }
}
