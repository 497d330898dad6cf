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
}
