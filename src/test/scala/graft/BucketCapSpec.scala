package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, VectorSearch}

/** Bucket-size skew guard (Dedup.requireBoundedBuckets): a pathological
  * LSH bucket — here 1200 byte-identical docs, the boilerplate shape
  * web corpora actually produce — must fail FAST from the count
  * pre-pass (before any candidate self-join is launched), with a
  * message naming exact dedup as the documented pre-pass; and after
  * that pre-pass the same pipeline completes with bounded buckets.
  * Mirrors the reference's posting/ngram-bloom cutoffs. */
class BucketCapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val capKey = "spark.graft.lsh.bucketCap"

  private def withCap[T](cap: Int)(f: => T): T = {
    val prev = spark.conf.getOption(capKey)
    spark.conf.set(capKey, cap.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set(capKey, v)
      case None    => spark.conf.unset(capKey)
    }
  }

  /** 1200 byte-identical docs + 10 distinct ones: every band bucket of
    * the identical group holds all 1200 members. */
  private def pathological = {
    val dup = (1 to 1200).map(i =>
      (i.toLong, "the same boilerplate paragraph repeated verbatim across the whole corpus shard"))
    val uniq = (1201 to 1210).map(i =>
      (i.toLong, s"unique document number $i carrying its own distinct words and token stream $i"))
    (dup ++ uniq).toDF("doc_id", "text")
  }

  test("minhash banding fails fast on an oversized bucket with the exact-dedup remedy") {
    val e = withCap(100) {
      intercept[IllegalStateException] {
        Dedup.minhashPairs(pathological, "doc_id", "text").collect()
      }
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    assert(e.getMessage.toLowerCase.contains("exact dedup"), e.getMessage)
    assert(e.getMessage.contains("1200"), s"should report the bucket size: ${e.getMessage}")
  }

  test("exact-dedup pre-pass absorbs the identical copies; pipeline completes bounded") {
    // the documented precondition: hash-groupBy exact dedup first
    val deduped = pathological.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
    val pairs = withCap(100) {
      Dedup.minhashPairs(deduped, "doc_id", "text").collect()
    }
    // 11 mutually-distinct survivors -> no near-dup pairs, and no bucket
    // ever exceeded the cap (the guard would have thrown)
    assert(pairs.isEmpty)
  }

  test("simhash pigeonhole blocks are guarded too") {
    val e = withCap(100) {
      intercept[IllegalStateException] {
        Dedup.simhashPairs(pathological, "doc_id", "text").collect()
      }
    }
    assert(e.getMessage.contains("simhashPairs"), e.getMessage)
  }

  test("hyperplane-LSH bands are guarded too") {
    // 30 identical embeddings: every (band, sig) bucket holds all 30
    val corpus = spark.range(1, 31)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 16), i -> CAST(0.1 * i AS FLOAT))").as("embedding"))
    val e = withCap(8) {
      intercept[IllegalStateException] {
        VectorSearch.nearDupPairsLsh(corpus, 0.9).collect()
      }
    }
    assert(e.getMessage.contains("nearDupPairsLsh"), e.getMessage)
    // and under the default cap the same tiny cluster passes (true
    // near-dup clusters below the cap are enumerated, not rejected)
    val pairs = VectorSearch.nearDupPairsLsh(corpus, 0.9).collect()
    assert(pairs.length == 30 * 29 / 2)
  }
}
