package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata
  * structs, decode/feature-extract/frame-sample operators.
  *
  * The Spark-side plumbing (binary columns, struct schemas, batch
  * shape, partitioning) is real; the actual media decode is a
  * ===== STUB ===== — this container has no image/audio codecs, so
  * `decodeMeta` derives deterministic fake dimensions from the payload
  * bytes (documented formula, oracle-checkable). A production build
  * swaps `decodeMeta`'s body for a real codec behind the same schema.
  */
object MultimodalOps {

  /** synthetic payload: 4-byte format tag + utf8 body. */
  def makeBlob(format: Column, body: Column): Column =
    concat(format.cast("binary"), body.cast("binary"))

  /** STUB decode: format tag from the first 4 bytes; fake
    * width/height/channels from payload length (deterministic). */
  def decodeMeta(blob: Column): Column = struct(
    decode(substring(blob, 1, 4), "UTF-8").as("format"),
    (pmod(octet_length(blob) * 7, lit(1920)) + 1).cast("int").as("width"),
    (pmod(octet_length(blob) * 13, lit(1080)) + 1).cast("int").as("height"),
    octet_length(blob).as("n_bytes"))

  /** frame-sample: n evenly spaced byte offsets into the payload
    * (stands in for video frame extraction offsets). */
  def frameOffsets(blob: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => i * floor(octet_length(blob) / n).cast("long"))

  /** STUB resize: metadata for a scale-to-fit (w,h) transform — output
    * dims preserve aspect ratio against the stub-decoded dims, byte
    * size scales by pixel ratio (deterministic integer math). */
  def resizeMeta(blob: Column, w: Int, h: Int): Column = {
    val m = decodeMeta(blob)
    val sw = m.getField("width").cast("long")
    val sh = m.getField("height").cast("long")
    // scale = min(w/sw, h/sh) in exact rational form: pick the axis
    // whose cross-product is smaller, then floor-divide
    val useW = sw * lit(h) >= sh * lit(w)
    val ow = when(useW, lit(w)).otherwise((sw * lit(h)) / sh).cast("int")
    val oh = when(useW, (sh * lit(w)) / sw).otherwise(lit(h)).cast("int")
    struct(ow.as("width"), oh.as("height"),
      (ow.cast("long") * oh * 3L).as("n_bytes"))
  }

  /** Per-partition imperative decode (the mapPartitions escape hatch a
    * real codec needs — one codec instance per partition, streaming
    * batches, no per-row JNI setup). The "codec" here is the same
    * deterministic stub; the partition/batch plumbing is the real
    * pattern. Input column must be BINARY. */
  def decodeBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                  blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init happens here (stub: plain function)
        def decode(b: Array[Byte]): (String, Int, Int, Long) = {
          val fmt = new String(b.take(4), "UTF-8")
          val n = b.length.toLong
          (fmt, (n * 7 % 1920).toInt + 1, (n * 13 % 1080).toInt + 1, n)
        }
        it.map { case (id, blob) =>
          val (fmt, w, h, n) = decode(blob)
          (id, fmt, w, h, n)
        }
      }
      .toDF(idCol, "format", "width", "height", "n_bytes")
  }
}
