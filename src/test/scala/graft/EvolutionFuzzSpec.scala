package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz over the SCHEMA-EVOLUTION surface (the r15
  * completion: add/rename/widen on all four formats, retype on all
  * four): seeded random histories interleaving DML (insert / update /
  * delete) with ALTERs (ADD COLUMN, RENAME COLUMN, widen INT→BIGINT,
  * retype INT|BIGINT→STRING) and OPTIMIZE, checked against an
  * in-memory model after EVERY op — the [[MergeModelSpec]] discipline
  * applied to evolution. Values are modeled as longs regardless of the
  * column's current declared type, so a retype must preserve exactly
  * the digits and an evolution must never lose or resurrect a cell. */
class EvolutionFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def sql(s: String) = spark.sql(s)

  private final case class Col(name: String, tpe: String) // int|bigint|string

  private def run(fmt: String, seed: Int): Unit = {
    val rnd = new scala.util.Random(1000 * seed + fmt.hashCode)
    val t = s"evofz_${fmt}_$seed"
    val pk = fmt match {
      case "paimon" => "PRIMARY KEY (p, k) "
      case "hudi" | "iceberg" => "PRIMARY KEY (k) "
      case _ => "" // delta: keyless positional
    }
    var cols = Vector(Col("v0", "int"))
    var nextCol = 1
    var nextKey = 100L
    // model: k -> (partition, colName -> value); None = never written
    var rows = Map(
      1L -> (("A", Map("v0" -> Option(11L)))),
      2L -> (("B", Map("v0" -> Option(22L)))),
      3L -> (("A", Map("v0" -> Option(33L)))))
    sql(s"CREATE OR REPLACE TABLE graft_$fmt.$t $pk" +
      "PARTITIONED BY (p) AS SELECT * FROM VALUES " +
      "(1L,'A',11),(2L,'B',22),(3L,'A',33) x(k, p, v0)")
    var hudiHasLogs = false

    def lit(c: Col, v: Option[Long]): String = v match {
      case None => s"CAST(NULL AS ${c.tpe.toUpperCase})"
      case Some(x) => if (c.tpe == "string") s"'$x'" else
        s"CAST($x AS ${c.tpe.toUpperCase})"
    }
    def check(op: String): Unit = {
      val got = sql(s"SELECT k, p, ${cols.map(_.name).mkString(", ")} " +
        s"FROM graft_$fmt.$t ORDER BY k").collect()
        .map { r =>
          r.getLong(0) -> ((r.getString(1), cols.zipWithIndex.map {
            case (c, i) =>
              c.name -> (if (r.isNullAt(i + 2)) None
                         else Some(r.get(i + 2).toString))
          }.toMap))
        }.toMap
      val want = rows.map { case (k, (p, vs)) =>
        k -> ((p, cols.map(c =>
          c.name -> vs.getOrElse(c.name, None).map(_.toString)).toMap))
      }
      assert(got == want, s"$fmt seed=$seed after $op:\n got $got\nwant $want")
    }

    def insertNew(): Unit = {
      val k = nextKey; nextKey += 1
      val p = if (rnd.nextBoolean()) "A" else "B"
      val vs = cols.map(c => c.name -> Option(k * 10 + rnd.nextInt(9))).toMap
      rows += k -> ((p, vs))
      sql(s"INSERT INTO graft_$fmt.$t SELECT $k AS k, '$p' AS p, " +
        cols.map(c => s"${lit(c, vs(c.name))} AS ${c.name}").mkString(", "))
      if (fmt == "hudi") hudiHasLogs = true
    }
    def updateOne(): Unit = {
      if (rows.isEmpty) return
      val k = rows.keys.toSeq.sorted.apply(rnd.nextInt(rows.size))
      val c = cols(rnd.nextInt(cols.size))
      val nv = Option(k * 100 + rnd.nextInt(9))
      val (p, vs) = rows(k)
      rows += k -> ((p, vs + (c.name -> nv)))
      sql(s"UPDATE graft_$fmt.$t SET ${c.name} = ${lit(c, nv)} WHERE k = $k")
      if (fmt == "hudi") hudiHasLogs = true
    }
    def deleteOne(): Unit = {
      if (rows.isEmpty) return
      val k = rows.keys.toSeq.sorted.apply(rnd.nextInt(rows.size))
      rows -= k
      sql(s"DELETE FROM graft_$fmt.$t WHERE k = $k")
      if (fmt == "hudi") hudiHasLogs = true
    }
    def addColumn(): Unit = {
      val c = Col(s"c$nextCol", if (rnd.nextBoolean()) "int" else "bigint")
      nextCol += 1
      cols :+= c
      sql(s"ALTER TABLE graft_$fmt.$t ADD COLUMN ${c.name} ${c.tpe.toUpperCase}")
    }
    def renameColumn(): Unit = {
      val i = rnd.nextInt(cols.size)
      val from = cols(i)
      val to = s"r$nextCol"; nextCol += 1
      cols = cols.updated(i, from.copy(name = to))
      rows = rows.view.mapValues { case (p, vs) =>
        (p, (vs - from.name) ++ vs.get(from.name).map(to -> _)) }.toMap
      sql(s"ALTER TABLE graft_$fmt.$t RENAME COLUMN ${from.name} TO $to")
    }
    def dropColumn(): Unit = {
      if (cols.size < 2) return // never drop the last value column
      val i = rnd.nextInt(cols.size)
      val c = cols(i)
      cols = cols.patch(i, Nil, 1)
      rows = rows.view.mapValues { case (p, vs) => (p, vs - c.name) }.toMap
      sql(s"ALTER TABLE graft_$fmt.$t DROP COLUMN ${c.name}")
    }
    def widenColumn(): Unit = {
      val ints = cols.zipWithIndex.filter(_._1.tpe == "int")
      if (ints.isEmpty) return
      val (c, i) = ints(rnd.nextInt(ints.size))
      cols = cols.updated(i, c.copy(tpe = "bigint"))
      sql(s"ALTER TABLE graft_$fmt.$t ALTER COLUMN ${c.name} TYPE BIGINT")
    }
    def retypeColumn(): Unit = {
      val nums = cols.zipWithIndex.filter(x =>
        x._1.tpe == "int" || x._1.tpe == "bigint")
      if (nums.isEmpty) return
      val (c, i) = nums(rnd.nextInt(nums.size))
      cols = cols.updated(i, c.copy(tpe = "string"))
      sql(s"ALTER TABLE graft_$fmt.$t ALTER COLUMN ${c.name} TYPE STRING")
      if (fmt == "hudi") hudiHasLogs = false // the rewrite folded the logs
    }
    def optimize(): Unit = {
      // hudi compaction requires a file group WITH logs — loud otherwise
      if (fmt == "hudi" && !hudiHasLogs) return
      sql(s"OPTIMIZE graft_$fmt.$t")
      if (fmt == "hudi") hudiHasLogs = false
    }

    check("create")
    (1 to 12).foreach { step =>
      val op = rnd.nextInt(10)
      val name = op match {
        case 0 | 1 | 2 => insertNew(); "insert"
        case 3 | 4 => updateOne(); "update"
        case 5 => deleteOne(); "delete"
        case 6 => addColumn(); "addColumn"
        case 7 =>
          if (rnd.nextBoolean()) { renameColumn(); "rename" }
          else { dropColumn(); "drop" }
        case 8 =>
          if (rnd.nextBoolean()) { widenColumn(); "widen" }
          else { retypeColumn(); "retype" }
        case _ => optimize(); "optimize"
      }
      check(s"step $step ($name)")
    }
  }

  test("seeded random evolution histories match an in-memory model (4 formats)") {
    // GRAFT_FUZZ_SEEDS widens the sweep for local bug hunts; CI runs 3
    val n = sys.env.get("GRAFT_FUZZ_SEEDS").map(_.toInt).getOrElse(3)
    for (fmt <- Seq("iceberg", "delta", "hudi", "paimon"); seed <- 0 until n)
      run(fmt, seed)
  }
}
