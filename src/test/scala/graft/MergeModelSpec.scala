package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the MERGE clause grammar
  * (plans/LakehouseSql.scala): seeded random clause chains — 1..3
  * guarded MATCHED clauses (UPDATE/DELETE mixes), 0..2 guarded NOT
  * MATCHED clauses (INSERT * / column-subset VALUES), interleaved
  * order — run against a graft_delta table AND an in-memory
  * first-match-wins model. The single-purpose fixtures pin known
  * shapes; this pins the shapes nobody thought to write. */
class MergeModelSpec extends AnyFunSuite {
  import TestSpark._

  private def sql(s: String) = spark.sql(s)

  // model row: k -> (p, v)
  private type Model = Map[Long, (String, Int)]

  private final case class MC(guard: Int => Boolean, guardSql: String,
                              isDelete: Boolean, delta: Int)
  private final case class NC(guard: Int => Boolean, guardSql: String,
                              star: Boolean)

  private def applyModel(m: Model, src: Seq[(Long, String, Int)],
                         mcs: Seq[MC], ncs: Seq[NC]): Model = {
    var out = m
    src.foreach { case (k, p, v) =>
      m.get(k) match {
        case Some(_) =>
          mcs.find(_.guard(v)).foreach { c =>
            if (c.isDelete) out -= k
            else out += k -> (out(k)._1, v + c.delta)
          }
        case None =>
          ncs.find(_.guard(v)).foreach { c =>
            if (c.star) out += k -> (p, v)
            else out += k -> (p, v * 1000) // VALUES variant re-scales v
          }
      }
    }
    out
  }

  test("seeded random clause chains agree with the first-match-wins model") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(140814)
    (1 to 6).foreach { round =>
      // target: 40 keys over 3 partitions
      val tgt = (0L until 40L).map(k =>
        (k, s"P${k % 3}", rnd.nextInt(90)))
      var model: Model = tgt.map { case (k, p, v) => k -> (p, v) }.toMap
      tgt.toDF("k", "p", "v").createOrReplaceTempView(s"mms_tgt_$round")
      sql(s"CREATE OR REPLACE TABLE graft_delta.mms_$round " +
        s"PARTITIONED BY (p) AS SELECT * FROM mms_tgt_$round")
      (1 to 3).foreach { step =>
        // source: unique keys, half matched half fresh
        val src = rnd.shuffle((0L until 80L).toList).take(25)
          .map(k => (k, s"P${k % 3}", rnd.nextInt(90)))
        src.toDF("k", "p", "v")
          .createOrReplaceTempView(s"mms_src_${round}_$step")
        // random guards: v % m <op> r — total, deterministic
        def mkGuard(): (Int => Boolean, String) = {
          val m = 2 + rnd.nextInt(4)
          val r = rnd.nextInt(m)
          ((v: Int) => v % m == r, s"s.v % $m = $r")
        }
        val nMc = 1 + rnd.nextInt(3)
        val mcs = (1 to nMc).map { i =>
          val (g, gs) = mkGuard()
          val del = rnd.nextBoolean()
          val delta = 100 * i
          // only the LAST clause may drop its guard
          if (i == nMc && rnd.nextBoolean())
            MC(_ => true, "", del, delta)
          else MC(g, gs, del, delta)
        }
        val nNc = rnd.nextInt(3)
        val ncs = (1 to nNc).map { i =>
          val (g, gs) = mkGuard()
          val star = rnd.nextBoolean()
          if (i == nNc && rnd.nextBoolean()) NC(_ => true, "", star)
          else NC(g, gs, star)
        }
        val mcSql = mcs.zipWithIndex.map { case (c, i) =>
          val guard = if (c.guardSql.isEmpty) "" else s"AND ${c.guardSql} "
          if (c.isDelete) s"WHEN MATCHED ${guard}THEN DELETE"
          else s"WHEN MATCHED ${guard}THEN UPDATE SET v = s.v + ${100 * (i + 1)}"
        }
        val ncSql = ncs.map { c =>
          val guard = if (c.guardSql.isEmpty) "" else s"AND ${c.guardSql} "
          if (c.star) s"WHEN NOT MATCHED ${guard}THEN INSERT *"
          else s"WHEN NOT MATCHED ${guard}THEN " +
            "INSERT (k, p, v) VALUES (s.k, s.p, s.v * 1000)"
        }
        // interleave the clause KINDS like the grammar allows — but
        // keep each kind's internal order (first-match-wins is
        // positional within a kind)
        def interleave(a: List[String], b: List[String]): List[String] =
          (a, b) match {
            case (Nil, ys) => ys
            case (xs, Nil) => xs
            case (x :: xs, y :: ys) =>
              if (rnd.nextBoolean()) x :: interleave(xs, y :: ys)
              else y :: interleave(x :: xs, ys)
          }
        val clauses = interleave(mcSql.toList, ncSql.toList).mkString(" ")
        sql(s"MERGE INTO graft_delta.mms_$round t " +
          s"USING mms_src_${round}_$step s ON t.k = s.k $clauses")
        model = applyModel(model, src, mcs, ncs)
        val got = sql(s"SELECT k, p, v FROM graft_delta.mms_$round")
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
          .toMap
        assert(got == model,
          s"round $round step $step diverged\nclauses: $clauses\n" +
            s"missing: ${(model.keySet -- got.keySet).toSeq.sorted}\n" +
            s"extra: ${(got.keySet -- model.keySet).toSeq.sorted}\n" +
            s"diff: ${model.collect { case (k, v) if got.get(k).exists(_ != v) =>
              (k, v, got(k)) }.take(5)}")
      }
    }
  }
}
