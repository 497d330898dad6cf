package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (reference: regression-test/suites/shape_check/
  * EXPLAIN-vs-golden tests — here as targeted predicates on the
  * physical plan, which is less brittle than full golden plans). */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("partition top-n plans WindowGroupLimit (Doris PartitionTopN)") {
    assert(plan("win_partition_topn").contains("WindowGroupLimit"))
  }

  test("partitioned write is pruned at read (partition filters)") {
    val p = plan("extra_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      s"no partition pruning:\n$p")
  }

  test("star joins broadcast, never sort-merge, on q5") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ:\n$p")
  }

  test("selective filter is pushed to the parquet scan on q6") {
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushdown:\n$p")
  }

  test("explode plans a Generate operator") {
    assert(plan("gen_explode_split").contains("Generate"))
  }

  test("colocate bucket join: sort-merge with no join-side shuffle") {
    // force the non-broadcast path so bucketing must carry the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("bucket_colocate_join")
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // only the post-join groupBy may hash-shuffle; bucketed sides must not
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges <= 1, s"join sides shuffled ($hashExchanges):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }

  test("count/min/max aggregate pushes down to the parquet footer") {
    // zonemap-style scan-level aggregation (reference: SegmentIterator
    // min-max index) — Spark's parquet aggregate pushdown, which needs
    // the V2 parquet source (scoped to this test)
    import org.apache.spark.sql.functions._
    val prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try {
      val df = spark.read.parquet(s"$sf/orders.parquet")
        .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey")))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)") ||
        p.contains("PushedAggregation: [MIN"), s"no aggregate pushdown:\n$p")
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prev)
  }

  test("q21 plans a single windowed lineitem pass, no fact self-join") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("Window"), s"expected window operators:\n$p")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"fact self-joins should be gone:\n$p")
  }

  test("join strategy hints are honored (shuffle_hash vs broadcast)") {
    // Doris join hints [shuffle]/[broadcast] -> Spark hint() surface
    import org.apache.spark.sql.functions._
    val c = Tables.load(spark, sf, "customer")
    val o = Tables.load(spark, sf, "orders")
    val sh = c.join(o.hint("shuffle_hash"), col("c_custkey") === col("o_custkey"))
      .queryExecution.executedPlan.toString
    assert(sh.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$sh")
    val bc = c.join(o.hint("broadcast"), col("c_custkey") === col("o_custkey"))
      .queryExecution.executedPlan.toString
    assert(bc.contains("BroadcastHashJoin"), s"broadcast hint ignored:\n$bc")
  }

  test("null-aware anti join planned for NOT IN") {
    val p = plan("join_null_aware_anti")
    assert(p.contains("BroadcastHashJoin LeftAnti BuildRight, ((") ||
      p.contains("NULL_AWARE") || p.contains("LeftAnti"), s"no anti join:\n$p")
  }

  test("BM25 broadcasts the tiny df/avgdl sides, never sort-merges") {
    // the TF table is the only big side; doc-frequency and corpus
    // stats must reach it as broadcasts (the scale path for scoring)
    val p = plan("ds_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in BM25:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ in BM25:\n$p")
  }

  test("minhash LSH candidate join keys on (band, sig)") {
    val docs = Tables.load(spark, sf, "documents")
    val p = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    // band-bucket equality drives the self-join (no cartesian pair blowup)
    assert(p.contains("band") && p.contains("sig"), s"no band-bucket join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in LSH path:\n$p")
  }

  test("embedding near-dup LSH pair join keys on (band, sig), no cartesian") {
    val p = SparkEntry.queries("ml_embed_neardup_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("band") && p.contains("sig"), s"no band-bucket join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in LSH path:\n$p")
  }

  test("ml_embed_neardup (IVF default) joins within cells, no cartesian") {
    val p = SparkEntry.queries("ml_embed_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    // cell-id equality drives the candidate self-join; the only
    // broadcast-NLJ is the tiny centroid assignment side (by design)
    assert(p.contains("cid"), s"no cell-bounded join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in IVF pair path:\n$p")
  }

  test("ml_semdedup joins within clusters, no cartesian") {
    val p = SparkEntry.queries("ml_semdedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("cid"), s"no cluster-bounded join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in semdedup path:\n$p")
  }

  test("ml_ngram_jaccard routes through banded LSH, no cartesian") {
    val p = SparkEntry.queries("ml_ngram_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in ngram-jaccard:\n$p")
    assert(p.contains("band") && p.contains("sig"), s"no band-bucket join:\n$p")
  }

  test("ml_decontaminate: contamination check is a broadcast join, corpus never cartesians") {
    val p = SparkEntry.queries("ml_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in decontamination:\n$p")
  }

  test("ml_pii_redact is one scan with no join or extra exchange") {
    val p = SparkEntry.queries("ml_pii_redact")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"unexpected join in pii redaction:\n$p")
    // one partial/final agg pair => at most one hash exchange
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex <= 1, s"pii redaction shuffled $ex times:\n$p")
  }

  test("ml_shuffle_seeded takes the permutation head via TakeOrderedAndProject") {
    val p = SparkEntry.queries("ml_shuffle_seeded")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"permutation head must be a distributed top-k, not a global sort:\n$p")
  }

  test("ml_doc_chunk explodes per-row with no shuffle at all") {
    val p = SparkEntry.queries("ml_doc_chunk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate"), s"no explode:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle:\n$p")
  }

  test("FK-constrained inner join is eliminated from the plan") {
    val p = plan("opt_fk_join_elim")
    assert(!p.contains("Join"), s"orders join not eliminated:\n$p")
    assert(!p.toLowerCase.contains("orders.parquet"),
      s"orders still scanned:\n$p")
  }

  test("unique-key left join is eliminated from the plan") {
    val p = plan("opt_unique_join_elim")
    assert(!p.contains("Join"), s"nation join not eliminated:\n$p")
    assert(!p.toLowerCase.contains("nation.parquet"),
      s"nation still scanned:\n$p")
  }

  test("FK elimination does NOT fire when the parent is filtered or referenced") {
    import org.apache.spark.sql.functions._
    // filtered parent: the join genuinely filters rows -> must remain
    val filtered = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders").filter(col("o_orderstatus") === "O"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(filtered.queryExecution.executedPlan.toString.contains("Join"),
      "join over a FILTERED parent must not be eliminated")
    // referenced parent: a parent column is consumed -> must remain.
    // grouped by o_custkey, which no registered join-MV carries — keeps
    // this assert independent of concurrently-registered MV definitions
    val referenced = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    assert(referenced.queryExecution.executedPlan.toString.contains("Join"),
      "join whose parent columns are consumed must not be eliminated")
  }

  test("q13 pre-aggregates orders below the join (round-6 rewrite)") {
    // the orders fact must be reduced to per-custkey counts BEFORE the
    // customer join — the physical plan shows a HashAggregate on the
    // orders side feeding the join, not a join feeding the aggregate
    val qe = SparkEntry.queries("q13_customer_distribution")(spark, sf).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty, "expected a join in q13")
    val aggBelowJoin = joins.exists(_.children.exists(side =>
      side.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined))
    assert(aggBelowJoin, s"orders not pre-aggregated below the join:\n${qe.optimizedPlan}")
  }

  test("heavy TPC-DS shapes carry no cartesian product") {
    // the wide multi-join (q64), the union+rollup channel report (q5),
    // the year-over-year CTE chain (q74 family), the cross-supplier
    // EXISTS (q94) and the inventory-undercut week join (q72) must all
    // plan keyed joins — a cartesian here is a rewrite bug that only
    // hurts at scale
    for (q <- Seq("ds_wide_resale", "ds_channel_rollup_net", "ds_two_channel_growth",
                  "ds_cross_warehouse_orders", "ds_promo_inventory_week")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n$p")
    }
  }

  test("ds_wide_resale: one cross_sales aggregate subtree feeds both join sides (r9)") {
    // the cs1⋈cs2 self-join must be served by exchange reuse — one
    // aggregate subtree, the second side a ReusedExchange. This GATES
    // the canonicalization ReuseExchange depends on: if a future change
    // breaks it, this fails loudly and the structural fallback (eager
    // materialization of the CTE — measured 2x slower at sf0.1 because
    // of row serialization, hence not the default) gets swapped in.
    // AQE finalizes reuse at runtime, so execute (an action on THIS
    // Dataset — a write would plan a fresh QueryExecution), then
    // inspect the final adaptive plan.
    val df = SparkEntry.queries("ds_wide_resale")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), s"plan did not finalize:\n$p")
    assert(p.contains("ReusedExchange"),
      s"cross_sales self-join no longer reuses the aggregate subtree:\n$p")
  }

  test("TPC-H q2 tail: correlated min resolves without cartesian") {
    val p = plan("q2_min_cost_supplier")
    assert(!p.contains("CartesianProduct"), s"cartesian in q2:\n$p")
  }

  test("clickbench group-topn plans TakeOrderedAndProject, one shuffle") {
    // Q33 (top URLs): the ORDER BY c DESC LIMIT 10 above the group-by
    // must plan as a top-k (per-partition heap + merge), never a global
    // sort — the difference between O(k) and O(n log n) driver memory
    // at 100 TB.
    val p = plan("cb_q33")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
    assert(!p.contains("Sort "), s"unexpected global sort:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected exactly one group-by shuffle:\n$p")
  }

  test("clickbench 90-sum scan is one codegen pass, one exchange") {
    // Q29: ninety SUM columns over one scan — all sums must fold into a
    // single partial-agg + single-partition exchange + final-agg, with
    // the arithmetic inside whole-stage codegen (no per-sum passes).
    val df = SparkEntry.queries("cb_q29")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected a single exchange:\n$p")
    df.collect() // finalize AQE so codegen spans are visible
    val finalPlan = df.queryExecution.executedPlan.toString
    // "*(n) HashAggregate" is the whole-stage-codegen marker in the
    // simple plan string — both agg phases must carry it
    assert("\\*\\(\\d+\\) HashAggregate".r.findAllIn(finalPlan).size == 2,
      s"sums fell out of codegen:\n$finalPlan")
  }

  test("or-expansion join plans hash joins under a union, no nested-loop") {
    // a JOIN ... ON e1 OR e2 would otherwise be a BroadcastNestedLoopJoin
    // (O(n*m) at scale); the expansion must yield equi joins only
    val p = plan("extra_or_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nested-loop survived OR expansion:\n$p")
    assert(p.contains("Union"), s"expected union of join branches:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected hash joins:\n$p")
  }

  test("ml_segment_dedup is join-free: explode, one content shuffle, reassembly") {
    val p = SparkEntry.queries("ml_segment_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"segment dedup must not join:\n$p")
    assert(p.contains("Generate"), s"no segment explode:\n$p")
    // r17 (846f62c): first-occurrence keep is a partial-aggregating
    // min(struct) over the 128-bit hashed content key — map-side
    // partial_min prunes duplicates before the exchange (the job the
    // old row_number window needed WindowGroupLimit for), and the sort
    // is over two longs, not segment strings
    assert(p.contains("partial_min(struct"),
      s"first-occurrence keep must prune map-side via partial min(struct):\n$p")
    assert(!p.contains("Window"),
      s"segment keep must not need a window pass:\n$p")
  }

  test("kmeans / PQ / IVF-PQ centroid assignment is a per-row kernel, not a join (r9)") {
    // r8-verdict fix: assignment used to be crossJoin(broadcast(cent)) +
    // row_number window — k× row inflation plus an id-keyed corpus
    // shuffle per Lloyd iteration / PQ subspace. Now it is one CellTop /
    // PqCodes kernel call per row: no CartesianProduct anywhere, and the
    // final kmeans projection runs with NO Exchange and NO Window at all
    for (q <- Seq("ml_kmeans_assign", "ml_cluster_sample", "ml_ann_pq", "ml_ann_ivfpq")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"cartesian in $q:\n$p")
    }
    val km = SparkEntry.queries("ml_kmeans_assign")(spark, sf)
      .queryExecution.executedPlan.toString
    // the ONLY allowed exchange is the final presentation orderBy
    // (rangepartitioning); a hashpartitioning exchange would mean the
    // assignment still shuffles the corpus on id
    assert(!km.contains("hashpartitioning"),
      s"kmeans assignment must be a pure map stage (no hash shuffle):\n$km")
    assert(!km.contains("Window"),
      s"kmeans assignment must not rank via window:\n$km")
    // PQ/IVF-PQ keep exactly ONE window — the final per-query top-k rank;
    // the old per-(id,sub) encode window and probe windows are gone
    for (q <- Seq("ml_ann_pq", "ml_ann_ivfpq")) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val nWin = "\\bWindow\\b".r.findAllIn(p).length
      assert(nWin <= 1, s"$q should keep only the final top-k window, saw $nWin:\n$p")
    }
  }

  test("ml_unigram_logprob broadcasts the vocabulary counts") {
    val p = SparkEntry.queries("ml_unigram_logprob")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"vocabulary join must be broadcast (tiny vocab vs corpus):\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in unigram scoring:\n$p")
  }

  test("lakehouse merge reads shuffle once on the key, never join or cartesian (r10)") {
    // Paimon partial-update: the per-key sequential fold is ONE hash
    // shuffle (groupBy key) + a codegen aggregate/array_sort HOF — no
    // join, no window, no second exchange of the corpus
    val pu = SparkEntry.queries("src_paimon_partial_update")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pu.contains("Join") && !pu.contains("CartesianProduct"),
      s"partial-update fold must not join:\n$pu")
    // Hudi MoR: base ∪ logs then ONE key window — no join; the window's
    // hash exchange is the only corpus shuffle before the wrap-up agg
    val mor = SparkEntry.queries("src_hudi_mor")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!mor.contains("Join") && !mor.contains("CartesianProduct"),
      s"MoR merge must not join:\n$mor")
    assert(mor.contains("Union"), s"MoR merge must union base and logs:\n$mor")
  }

  test("arrow roundtrip preserves schema") {
    val res = spark.sql("SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c")
    val (schemaJson, batches) = graft.ops.ArrowResult.serialize(res)
    val back = graft.ops.ArrowResult.deserialize(spark, schemaJson, batches)
    assert(back.schema == res.schema)
    assert(back.collect().toSeq == res.collect().toSeq)
  }
}
