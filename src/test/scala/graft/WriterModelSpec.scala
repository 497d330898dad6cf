package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DeltaLite, DeltaWriter, HudiLite, IcebergLite, IcebergWriter, PaimonLite, PaimonWriter}

/** Differential model test for the four lakehouse writers: a SEEDED
  * pseudo-random sequence of writes (appends of fresh keys, upserts,
  * row deletes, maintenance ops) runs against each format while an
  * in-memory Map[key → value] tracks the intended state; after EVERY
  * op the independent reader must equal the model exactly. This is the
  * class of bug the fixture queries cannot catch: an op interaction
  * (delete after upsert after rewrite...) that only shows up on a
  * particular history. Seeded, so failures reproduce. */
class WriterModelSpec extends AnyFunSuite {
  import TestSpark._

  private def partOf(k: Long): String = s"P${k % 3}"

  private def df(rows: Seq[(Long, Int)]) = {
    val s2 = spark
    import s2.implicits._
    rows.map { case (k, v) => (k, partOf(k), v) }.toDF("k", "p", "v")
  }

  private def freshKeys(rnd: scala.util.Random, model: Map[Long, Int],
                        n: Int): Seq[Long] =
    Iterator.continually(rnd.nextInt(10000).toLong)
      .filterNot(model.contains).distinct.take(n).toSeq

  private def existingKeys(rnd: scala.util.Random, model: Map[Long, Int],
                           n: Int): Seq[Long] =
    rnd.shuffle(model.keys.toSeq).take(n)

  test("iceberg: 14 random ops, reader == model after each") {
    val dir = new java.io.File("target/iceberg/model_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val rnd = new scala.util.Random(42)
    var model = Map.empty[Long, Int]
    def check(op: String): Unit = {
      val got = IcebergLite.readSnapshot(spark, dir)
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == model, s"iceberg diverged after $op")
    }
    // seed commit
    val seed = freshKeys(rnd, model, 8).map(k => k -> rnd.nextInt(100))
    model ++= seed
    IcebergWriter.append(spark, dir, df(seed), partCol = Some("p"))
    check("seed")
    (1 to 13).foreach { i =>
      rnd.nextInt(5) match {
        case 0 => // append fresh keys
          val rows = freshKeys(rnd, model, 1 + rnd.nextInt(4))
            .map(k => k -> rnd.nextInt(100))
          model ++= rows
          IcebergWriter.append(spark, dir, df(rows), partCol = Some("p"))
          check(s"op$i append")
        case 1 => // upsert: mix of updates and inserts
          val ups = existingKeys(rnd, model, 1 + rnd.nextInt(3))
            .map(k => k -> rnd.nextInt(100))
          val ins = freshKeys(rnd, model, rnd.nextInt(3))
            .map(k => k -> rnd.nextInt(100))
          val rows = ups ++ ins
          if (rows.nonEmpty) {
            model ++= rows
            IcebergWriter.upsert(spark, dir, df(rows),
              keyCols = Seq("k"), partCol = Some("p"))
            check(s"op$i upsert")
          }
        case 2 => // row delete by residue predicate
          val m = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(m)
          if (model.keys.exists(_ % m == r)) {
            model = model.filterNot { case (k, _) => k % m == r }
            IcebergWriter.deleteRows(spark, dir, col("k") % m === r)
            check(s"op$i delete %$m==$r")
          }
        case 3 => // rewrite (state no-op)
          IcebergWriter.rewriteDataFiles(spark, dir, partCol = Some("p"))
          check(s"op$i rewrite")
        case 4 => // expiry (state no-op on the current snapshot)
          IcebergWriter.expireSnapshots(dir, keepLast = 1 + rnd.nextInt(3))
          check(s"op$i expire")
      }
    }
  }

  test("delta: 14 random ops, reader == model after each") {
    val dir = new java.io.File("target/delta/model_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val rnd = new scala.util.Random(1337)
    var model = Map.empty[Long, Int]
    def check(op: String): Unit =
      if (model.isEmpty) {
        // an all-tombstoned table reads loudly (no live files) — both
        // the empty result and the loud refusal match the empty model
        val emptyOk =
          try DeltaLite.readVersion(spark, dir).count() == 0L
          catch { case _: IllegalArgumentException => true }
        assert(emptyOk, s"delta must read empty or refuse loudly after $op")
      } else {
        val got = DeltaLite.readVersion(spark, dir)
          .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == model, s"delta diverged after $op")
      }
    val seed = freshKeys(rnd, model, 8).map(k => k -> rnd.nextInt(100))
    model ++= seed
    DeltaWriter.append(spark, dir, df(seed), partCol = Some("p"))
    check("seed")
    (1 to 13).foreach { i =>
      if (model.isEmpty) { // state-dependent ops refuse an empty table
        val rows = freshKeys(rnd, model, 4).map(k => k -> rnd.nextInt(100))
        model ++= rows
        DeltaWriter.append(spark, dir, df(rows), partCol = Some("p"))
        check(s"op$i refill")
      }
      rnd.nextInt(5) match {
        case 0 =>
          val rows = freshKeys(rnd, model, 1 + rnd.nextInt(4))
            .map(k => k -> rnd.nextInt(100))
          model ++= rows
          DeltaWriter.append(spark, dir, df(rows), partCol = Some("p"))
          check(s"op$i append")
        case 1 => // DV row delete
          val m = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(m)
          if (model.keys.exists(_ % m == r)) {
            model = model.filterNot { case (k, _) => k % m == r }
            DeltaWriter.deleteRows(spark, dir, col("k") % m === r)
            check(s"op$i dv-delete %$m==$r")
          }
        case 2 => // partition delete
          val p = s"P${rnd.nextInt(3)}"
          if (model.keys.exists(partOf(_) == p)) {
            model = model.filterNot { case (k, _) => partOf(k) == p }
            DeltaWriter.deleteWhere(spark, dir, _.get("p").contains(p))
            check(s"op$i deleteWhere $p")
          }
        case 3 =>
          if (model.nonEmpty) {
            DeltaWriter.optimize(spark, dir, partColIn = Some("p"))
            check(s"op$i optimize")
          }
        case 4 =>
          if (model.nonEmpty) {
            DeltaWriter.vacuum(spark, dir)
            check(s"op$i vacuum")
          }
      }
    }
  }

  test("paimon: 12 random ops, reader == model after each") {
    val dir = new java.io.File("target/paimon/model_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    var model = Map.empty[Long, Int]
    def check(op: String): Unit = {
      val got = PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == model, s"paimon diverged after $op")
    }
    def commit(ins: Seq[(Long, Int)], ups: Seq[(Long, Int)],
               dels: Seq[Long], op: String): Unit = {
      val rows =
        ins.map { case (k, v) => (k, partOf(k), v, PaimonLite.KindInsert) } ++
          ups.map { case (k, v) => (k, partOf(k), v, PaimonLite.KindUpdateAfter) } ++
          dels.map(k => (k, partOf(k), 0, PaimonLite.KindDelete))
      if (rows.nonEmpty) {
        model = model ++ ins ++ ups -- dels
        PaimonWriter.append(spark, dir,
          rows.toDF("k", "p", "v", "_VALUE_KIND"), "p", Seq("p", "k"))
        check(op)
      }
    }
    commit(freshKeys(rnd, model, 8).map(k => k -> rnd.nextInt(100)), Nil, Nil, "seed")
    (1 to 11).foreach { i =>
      rnd.nextInt(3) match {
        case 0 =>
          commit(freshKeys(rnd, model, 1 + rnd.nextInt(3)).map(k => k -> rnd.nextInt(100)),
            Nil, Nil, s"op$i insert")
        case 1 =>
          commit(Nil,
            existingKeys(rnd, model, 1 + rnd.nextInt(3)).map(k => k -> rnd.nextInt(100)),
            Nil, s"op$i update")
        case 2 =>
          // delete some, re-insert one of them in the SAME commit order
          val dels = existingKeys(rnd, model, 1 + rnd.nextInt(2))
          commit(Nil, Nil, dels, s"op$i delete")
          PaimonWriter.expireSnapshots(dir, keepLast = 1 + rnd.nextInt(4))
          check(s"op$i expire")
      }
    }
  }

  test("hudi: 12 random ops, reader == model after each") {
    val dir = new java.io.File("target/hudi/model_spec").getAbsolutePath
    val rnd = new scala.util.Random(99)
    var model = Map.empty[Long, Int]
    var instant = 1
    def next(): String = { instant += 1; f"$instant%03d" }
    def check(op: String): Unit = {
      val got = HudiLite.readSnapshotMor(spark, dir, Seq("k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == model, s"hudi diverged after $op")
    }
    val seed = freshKeys(rnd, model, 10).map(k => k -> rnd.nextInt(100))
    model ++= seed
    HudiLite.createTable(spark, dir, df(seed), Seq("k"), "p", "001",
      groupsPerPart = 2)
    check("seed")
    (1 to 11).foreach { i =>
      rnd.nextInt(4) match {
        case 0 => // upsert mix (inserts route into existing partitions)
          val ups = existingKeys(rnd, model, 1 + rnd.nextInt(3))
            .map(k => k -> rnd.nextInt(100))
          val ins = freshKeys(rnd, model, rnd.nextInt(3))
            .filter(k => model.keys.exists(partOf(_) == partOf(k)))
            .map(k => k -> rnd.nextInt(100))
          val rows = ups ++ ins
          if (rows.nonEmpty) {
            model ++= rows
            HudiLite.upsert(spark, dir, df(rows), Seq("k"), "p", next())
            check(s"op$i upsert")
          }
        case 1 =>
          val dels = existingKeys(rnd, model, 1 + rnd.nextInt(2))
          // keep at least one key per partition alive so routing holds
          val safe = dels.filter(k =>
            model.keys.count(x => partOf(x) == partOf(k)) > 1)
          if (safe.nonEmpty) {
            val s2 = spark
            import s2.implicits._
            model --= safe
            HudiLite.deleteKeys(spark, dir, safe.toDF("k"), Seq("k"), next())
            check(s"op$i delete")
          }
        case 2 =>
          if (HudiLite.planFilesMor(dir).exists(_._5.nonEmpty)) {
            HudiLite.compact(spark, dir, Seq("k"), next())
            check(s"op$i compact")
          }
        case 3 =>
          HudiLite.clean(dir)
          check(s"op$i clean")
      }
    }
  }
}
