package graft.ops

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Avro container-file source/sink (SURVEY §2.1 FileScanOperatorX — the
  * reference's broker/stream loads speak Avro through its format layer,
  * be/src/format/; on Spark the idiomatic route is the spark-avro
  * connector's `.format("avro")`, which is structurally identical to
  * the orc/csv/json paths already covered). The connector jar is absent
  * from this sandbox's fixed jar set, but the CORE Avro runtime
  * (avro-1.12.1.jar) is present — so, same discipline as the gzip/tar
  * codecs, the container format itself is REAL: object-container files
  * with schema header, sync markers, and deflate-compressed blocks,
  * written and decoded via the public Avro API.
  *
  * Scale shape: the read side is the product path — `binaryFile` splits
  * the .avro files across tasks and each task runs one DataFileStream
  * decoder over its files (mapPartitions; no shuffle, no driver data
  * path). The write side stages container files from the driver, which
  * is sanctioned for the 25-row dimension fixture only; a corpus-scale
  * write would be `foreachPartition` emitting one container per
  * partition onto the shared FS (the exact pattern `ml_shard_roundtrip`
  * proves for tar.gz shards).
  */
object AvroSource {

  private val NationSchema: String =
    """{"type":"record","name":"Nation","fields":[
      |{"name":"n_nationkey","type":"long"},
      |{"name":"n_name","type":"string"},
      |{"name":"n_regionkey","type":"long"}]}""".stripMargin

  /** stage `df`'s (n_nationkey, n_name, n_regionkey) rows as
    * deflate-compressed Avro container files under `outDir`, `perFile`
    * rows per container (several files so the read side demonstrably
    * splits). */
  def writeNationAvro(df: DataFrame, outDir: String, perFile: Int): Unit = {
    val schema = new Schema.Parser().parse(NationSchema)
    val rows = df.select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect() // dimension fixture: 25 rows at any SF
    val dir = new java.io.File(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    rows.grouped(perFile).zipWithIndex.foreach { case (chunk, i) =>
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(CodecFactory.deflateCodec(6))
      w.create(schema, new java.io.File(dir, f"part-$i%05d.avro"))
      chunk.foreach { r =>
        val rec = new GenericData.Record(schema)
        rec.put("n_nationkey", r.getLong(0))
        rec.put("n_name", r.getString(1))
        rec.put("n_regionkey", r.getLong(2))
        w.append(rec)
      }
      w.close()
    }
  }

  /** distributed read: binaryFile scan over the container files, one
    * Avro decoder per file inside mapPartitions. The reader uses the
    * WRITER schema embedded in each container header (the Avro
    * contract), so a header/blocks/sync corruption fails loudly. */
  def readNationAvro(spark: org.apache.spark.sql.SparkSession,
                     inDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(inDir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val in = new DataFileStream(
            new java.io.ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord]())
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
          while (in.hasNext) {
            val r = in.next()
            out += ((r.get("n_nationkey").asInstanceOf[Long],
              r.get("n_name").toString,
              r.get("n_regionkey").asInstanceOf[Long]))
          }
          in.close()
          out
        }
      }
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }
}
