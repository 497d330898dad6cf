package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q.t

/** Round-9b: Apache Paimon table-format read path (ops/PaimonLite
  * .scala — reference: fe/fe-core/.../datasource/paimon/), completing
  * the in-repo lakehouse read-path quartet. The fixture stages a real
  * layout (snapshot JSON chain → base/delta manifest lists → manifest
  * avro → partition/bucket parquet with LSM system columns) and every
  * oracle recomputes expected CONTENT from the base lineitem table by
  * predicate — snapshot selection, manifest ADD/DELETE replay, the
  * deduplicate key merge, and changelog windowing must all be right
  * to match. */
object Round9bQueries {

  // The testdata lineitem is NOT strict TPC-H: (l_returnflag,
  // l_orderkey, l_linenumber) is not unique (sf0.01: 60000 rows but
  // only 54701 distinct triples under l_orderkey < 15000), so the PK
  // carries a deterministic per-row uid — the fixture stages it and
  // asserts uniqueness loudly (a false premise must fail as `err`,
  // never record a silently-merged wrong answer).
  private val PK = Seq("l_returnflag", "l_orderkey", "l_linenumber", "__uid")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Current snapshot (post-compaction): commit 1 inserts, commit 2
    // upserts (+100 qty on %10==0 keys) and deletes (%7==0, not
    // upserted), commit 3 COMPACTs partition 'A' (ADD merged level-5
    // files + DELETE entries for the old ones). A missed DELETE entry
    // would double every compacted 'A' row; a broken merge would show
    // pre-upsert quantities or deleted keys.
    "src_paimon_scan" -> ((s, dir) => {
      val tableDir = paimonFixture(s, dir)
      graft.ops.PaimonLite.readSnapshot(s, tableDir, PK)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // snapshot 1 = the insert-only state; later upserts/deletes and
    // the compaction must not leak backward
    "src_paimon_time_travel" -> ((s, dir) => {
      val tableDir = paimonFixture(s, dir)
      graft.ops.PaimonLite.readSnapshot(s, tableDir, PK, snapshotId = Some(1L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // manifest partition pruning: an 'R' read plans ONLY R files
    // (asserted on the planned list, before any footer is opened)
    "src_paimon_prune" -> ((s, dir) => {
      import graft.ops.PaimonLite
      val tableDir = paimonFixture(s, dir)
      val all = PaimonLite.planFiles(tableDir).size
      val pruned = PaimonLite.planFiles(tableDir, partFilter = Some(_ == "R"))
      require(pruned.nonEmpty && pruned.size < all,
        s"paimon partition pruning did not narrow: ${pruned.size} of $all")
      require(pruned.forall(_.part.contains("R")),
        s"pruned plan leaked a non-R file: $pruned")
      PaimonLite.readSnapshot(s, tableDir, PK, partFilter = Some(_ == "R"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Iceberg manifest COLUMN-STATS pruning (spec lower_bounds/
    // upper_bounds — the file-skipping/zonemap analog one level above
    // parquet row groups; reference: the FE consults segment zone maps
    // the same way). The fixture range-clusters ingestion into four
    // l_orderkey bands; a band predicate must plan exactly ONE of the
    // four data files before any footer opens. At 100 TB this is the
    // difference between opening every file's footer and opening the
    // clustered range's.
    "src_iceberg_stats_prune" -> ((s, dir) => {
      import graft.ops.IcebergLite
      val tableDir = icebergBandsFixture(s, dir)
      // the second quartile band, exactly as the fixture (and the
      // oracle, in SQL) derives it from the key range
      val (mn, mx) = icebergBandRange(s, dir)
      val w = (mx - mn + 1) / 4
      val lo = mn + w; val hi = mn + 2 * w - 1
      val pred: (Map[String, Long], Map[String, Long]) => Boolean =
        (l, u) => l.get("l_orderkey").forall(_ <= hi) &&
          u.get("l_orderkey").forall(_ >= lo)
      val all = IcebergLite.planFiles(tableDir).count(_.content == 0)
      val kept = IcebergLite.planFiles(tableDir, statsFilter = Some(pred))
        .filter(_.content == 0)
      require(all == 4 && kept.size == 1,
        s"stats prune should plan exactly 1 of $all banded files, got ${kept.size}")
      IcebergLite.readSnapshot(s, tableDir, statsFilter = Some(pred))
        .filter(col("l_orderkey").between(lo, hi))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Delta CHECKPOINT replay — the protocol's scale path (at 100 TB
    // the log is thousands of commits; `_last_checkpoint` makes replay
    // one metadata parquet + the tail). The proof is non-circular by
    // construction: the fixture EXPIRES the pre-checkpoint JSON
    // commits, so the add-actions of versions 0..1 exist ONLY inside
    // the checkpoint — a reader that ignored it would see just the
    // final remove and plan zero files (asserted below).
    "src_delta_checkpoint" -> ((s, dir) => {
      import graft.ops.DeltaLite
      val tableDir = deltaCheckpointFixture(s, dir)
      require(DeltaLite.planFiles(tableDir).isEmpty,
        "premise: JSON-only replay must be blind after log expiry")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // incremental CHANGELOG over (1, 3]: snapshot 2's delta files with
    // their RowKind (+U upserts, -D deletes); snapshot 3 is COMPACT and
    // must be skipped — a reader that shipped compaction rewrites as
    // new data would inflate every count here.
    "src_paimon_incremental" -> ((s, dir) => {
      val tableDir = paimonFixture(s, dir)
      graft.ops.PaimonLite.readIncremental(s, tableDir, 1L, 3L)
        .groupBy(col("_VALUE_KIND").as("kind"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("kind"))
    })
  )

  /** Paimon fixture, staged once per (sfDir, JVM): primary key
    * (l_returnflag, l_orderkey, l_linenumber) — partition column first,
    * as Paimon requires — fixture bucketing l_orderkey % 3 (real Paimon
    * hashes the key; the modulo keeps each key's writes in one bucket,
    * which is the property the LSM relies on). */
  private val paimonBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def paimonFixture(s: SparkSession, dir: String): String =
    paimonBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.PaimonLite
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 15000)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("l_qty"))
      val sysSchema = StructType(src.schema.fields ++ Array(
        StructField("__uid", LongType, nullable = false),
        StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
        StructField("_VALUE_KIND", IntegerType, nullable = false)))
      // deterministic per-row uid = rank in a stable full sort; rows
      // that tie on every column are interchangeable, so any stable
      // assignment yields the same merged CONTENT
      val base = src
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_qty"))
        .collect().toSeq
        .zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i.toLong) }
      // premise gate (VERDICT r9 #1): the PK must be genuinely unique,
      // or the deduplicate merge silently collapses base rows and the
      // oracle (which counts every row) records a wrong answer
      locally {
        val ki = PK.map(sysSchema.fieldIndex) // tracks the DECLARED key
        val nDistinct = base.map(r => ki.map(r.get)).distinct.size
        require(base.size == nDistinct,
          s"paimon fixture premise violated: ${base.size} rows but only " +
            s"$nDistinct distinct ${PK.mkString("(", ",", ")")} tuples — " +
            "PK is not unique")
      }
      def sys(r: Row, seq: Long, kind: Int): Row =
        Row.fromSeq(r.toSeq ++ Seq[Any](seq, kind)) // Seq[Any]: don't let Seq(Long, Int) unify to Seq[Long]
      val c1 = base.zipWithIndex.map { case (r, i) => sys(r, 1000000L + i, PaimonLite.KindInsert) }
      val c2 = base.zipWithIndex.flatMap { case (r, i) =>
        val ok = r.getLong(1)
        if (ok % 10 == 0)
          Some(Row(r.getString(0), ok, r.getInt(2), r.getLong(3) + 100L,
            r.getLong(4), 2000000L + i, PaimonLite.KindUpdateAfter))
        else if (ok % 7 == 0) Some(sys(r, 2000000L + i, PaimonLite.KindDelete))
        else None
      }
      def writes(rows: Seq[Row], level: Int): Seq[PaimonLite.Write] =
        rows.groupBy(r => (r.getString(0), (r.getLong(1) % 3).toInt)).toSeq
          .sortBy(_._1)
          .map { case ((p, b), rs) => PaimonLite.Write(Some(p), b, level, rs) }
      val w1 = writes(c1, level = 0)
      val w2 = writes(c2, level = 0)
      // COMPACT partition 'A': per bucket, the driver-local reference
      // merge (max-seq wins, retractions drop) at level 5, plus DELETE
      // entries for every 'A' file of commits 1 and 2
      val merged = PaimonLite.mergeDriverLocal(
        (c1 ++ c2).filter(_.getString(0) == "A"), sysSchema, PK)
      val w3 = merged.groupBy(r => (r.getLong(1) % 3).toInt).toSeq.sortBy(_._1)
        .map { case (b, rs) =>
          PaimonLite.Write(Some("A"), b, level = 5,
            rs.sortBy(r => (r.getLong(1), r.getInt(2), r.getLong(4)))) }
      def removesOf(ws: Seq[PaimonLite.Write], snap: Int): Seq[PaimonLite.FileMeta] =
        ws.zipWithIndex.collect { case (w, j) if w.part.contains("A") =>
          PaimonLite.FileMeta(s"A/bucket-${w.bucket}/data-s$snap-$j.parquet",
            w.part, w.bucket, w.level, 0L, 0L, 0L)
        }
      val tableDir = new java.io.File(
        s"target/paimon/lineitem_${new java.io.File(dir).getName}").getAbsolutePath
      PaimonLite.writeFixtureTable(s, tableDir, sysSchema, Seq(
        PaimonLite.Commit("APPEND", w1),
        PaimonLite.Commit("APPEND", w2),
        PaimonLite.Commit("COMPACT", w3, removesOf(w1, 1) ++ removesOf(w2, 2))))
      tableDir
    })

  /** Range-clustered iceberg fixture: four appends banded by
    * l_orderkey (one 5000-wide band each, constant partition value) so
    * manifest bounds carry disjoint ranges — the shape a sorted/
    * clustered ingestion produces. */
  private val icebergBandsBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def icebergBandRange(s: SparkSession, dir: String): (Long, Long) = {
    val r = t(s, dir, "lineitem").filter(col("l_orderkey") < 20000)
      .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    (r.getLong(0), r.getLong(1))
  }
  private def icebergBandsFixture(s: SparkSession, dir: String): String =
    icebergBandsBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.IcebergLite
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 20000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      // quartile bands over the ACTUAL key range so every band is
      // populated at any SF (uniform keys); the last band absorbs the
      // remainder
      val (mn, mx) = icebergBandRange(s, dir)
      val w = (mx - mn + 1) / 4
      def band(b: Int): Seq[(String, Seq[Row])] = {
        val lo = mn + b * w
        val hi = if (b == 3) mx else mn + (b + 1) * w - 1
        Seq("all" -> src.filter(col("l_orderkey").between(lo, hi))
          .orderBy(col("l_orderkey"), col("l_linenumber")).collect().toSeq)
      }
      val tableDir = new java.io.File(
        s"target/iceberg/bands_${new java.io.File(dir).getName}").getAbsolutePath
      IcebergLite.writeFixtureTable(s, tableDir, src,
        (0 until 4).map(b => IcebergLite.Append(band(b))))
      tableDir
    })

  /** Checkpoint fixture: commit 0 adds the even half, commit 1 the odd
    * half (both partitioned by l_returnflag), checkpoint at version 1,
    * commit 2 removes commit 0's 'R' file, then versions 0–1's JSON
    * commits are EXPIRED — state is reconstructible only through the
    * checkpoint. */
  private val deltaCpBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def deltaCheckpointFixture(s: SparkSession, dir: String): String =
    deltaCpBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.DeltaLite
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 20000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      def batch(m: Int): Seq[(String, Seq[Row])] = {
        val rows = src.filter(col("l_orderkey") % 2 === m)
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
          .collect().toSeq
        rows.groupBy(_.getString(2)).toSeq.sortBy(_._1)
      }
      val tableDir = new java.io.File(
        s"target/delta/cp_lineitem_${new java.io.File(dir).getName}").getAbsolutePath
      val b0 = batch(0)
      val rIdx = b0.map(_._1).indexOf("R")
      require(rIdx >= 0, "fixture premise: commit 0 has an R partition")
      DeltaLite.writeFixtureTable(s, tableDir, src, Seq(
        DeltaLite.Commit(adds = b0),
        DeltaLite.Commit(adds = batch(1)),
        DeltaLite.Commit(removes = Seq(s"data/c0_f${rIdx}_R.parquet"))))
      DeltaLite.writeCheckpoint(s, tableDir, 1L)
      val expired = DeltaLite.expireLog(tableDir, 1L)
      require(expired.size == 2, s"expected to expire commits 0 and 1: $expired")
      tableDir
    })

  def oracle: Map[String, String] = Map(

    // the second quartile band of the key range — same derivation the
    // fixture uses; the read must survive planning only that band's file
    "src_iceberg_stats_prune" -> """
      WITH b AS (SELECT min(l_orderkey) AS mn, max(l_orderkey) AS mx
                 FROM lineitem WHERE l_orderkey < 20000),
      r AS (SELECT mn + (mx - mn + 1) // 4 AS lo,
                   mn + 2 * ((mx - mn + 1) // 4) - 1 AS hi FROM b)
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem, r
      WHERE l_orderkey BETWEEN r.lo AND r.hi
      GROUP BY 1 ORDER BY 1""",

    // checkpoint state (adds of both halves) + the post-checkpoint
    // remove of the even 'R' file — same surviving set as a full replay
    "src_delta_checkpoint" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_orderkey < 20000
        AND NOT (l_orderkey % 2 = 0 AND l_returnflag = 'R')
      GROUP BY 1 ORDER BY 1""",

    // surviving state from the base table by predicate (non-circular):
    // deletes remove %7==0 keys that were not upserted; upserts add
    // +100 to each %10==0 row's quantity
    "src_paimon_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN l_orderkey % 10 = 0
                           THEN CAST(l_quantity AS BIGINT) + 100
                           ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 15000
        AND NOT (l_orderkey % 7 = 0 AND l_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    // snapshot 1 = all inserts, original quantities
    "src_paimon_time_travel" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 15000
      GROUP BY 1 ORDER BY 1""",

    // 'R' partition at the current snapshot (same merge semantics)
    "src_paimon_prune" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 15000 AND l_returnflag = 'R'
        AND NOT (l_orderkey % 7 = 0 AND l_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    // the (1, 3] changelog = snapshot 2's delta only (3 is COMPACT):
    // RowKind 2 (+U) for the upserted rows, 3 (-D) for the deleted.
    // HAVING guards each branch so an SF where a predicate matches
    // nothing emits NO row — matching the engine's groupBy semantics
    "src_paimon_incremental" -> """
      SELECT 2 AS kind, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 15000 AND l_orderkey % 10 = 0
      HAVING count(*) > 0
      UNION ALL
      SELECT 3 AS kind, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 15000 AND l_orderkey % 7 = 0 AND l_orderkey % 10 <> 0
      HAVING count(*) > 0
      ORDER BY kind"""
  )
}
