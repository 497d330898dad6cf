package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession

/** Doris JSON mutation/introspection family that Spark lacks natively
  * (reference: be/src/exprs/function/function_jsonb.cpp — json_set /
  * json_insert / json_replace / json_type / json_length; MySQL-
  * compatible semantics: insert only-if-absent, replace only-if-
  * present, set always).
  *
  * Paths are top-level `$.key` (the flat-document case the fixtures
  * exercise); the value argument is raw JSON (`'9'` -> number,
  * `'"s"'` -> string), falling back to a JSON string when unparseable.
  * Implemented over Jackson (already on Spark's classpath) as Scala
  * UDFs — these are row-local scalar transforms with no state, so they
  * shard perfectly; they sit outside codegen, which is fine off the
  * TB-scan hot path (and a native Expression port is mechanical if a
  * profile ever shows them hot).
  */
object JsonFunctions {

  private val mapper = new ObjectMapper()

  private def parse(s: String): Option[JsonNode] =
    if (s == null) None
    else try Some(mapper.readTree(s)) catch { case _: Exception => None }

  private def parseValue(v: String): JsonNode =
    if (v == null) mapper.nullNode()
    else try mapper.readTree(v) catch { case _: Exception => mapper.getNodeFactory.textNode(v) }

  private def key(path: String): Option[String] =
    if (path != null && path.startsWith("$.") && path.length > 2 && !path.drop(2).contains('.'))
      Some(path.drop(2))
    else None

  /** mode: 0=set (always), 1=insert (only absent), 2=replace (only present). */
  private def mutate(doc: String, path: String, value: String, mode: Int): String =
    (parse(doc), key(path)) match {
      case (Some(obj: ObjectNode), Some(k)) =>
        val present = obj.has(k)
        val write = mode match {
          case 0 => true
          case 1 => !present
          case _ => present
        }
        if (write) obj.set[JsonNode](k, parseValue(value))
        mapper.writeValueAsString(obj)
      case _ => null
    }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("json_set", (d: String, p: String, v: String) => mutate(d, p, v, 0))
    u.register("json_insert", (d: String, p: String, v: String) => mutate(d, p, v, 1))
    u.register("json_replace", (d: String, p: String, v: String) => mutate(d, p, v, 2))
    u.register("json_valid", (d: String) =>
      if (d == null) null else java.lang.Boolean.valueOf(parse(d).isDefined))
    // Doris json_type names: OBJECT/ARRAY/STRING/INT/DOUBLE/BOOL/NULL
    u.register("json_type", (d: String) => parse(d).map { n =>
      if (n.isObject) "OBJECT"
      else if (n.isArray) "ARRAY"
      else if (n.isTextual) "STRING"
      else if (n.isIntegralNumber) "INT"
      else if (n.isNumber) "DOUBLE"
      else if (n.isBoolean) "BOOL"
      else "NULL"
    }.orNull)
    // number of object keys / array elements; 1 for scalars (MySQL/Doris)
    u.register("json_length", (d: String) => parse(d).map { n =>
      if (n.isContainerNode) java.lang.Long.valueOf(n.size().toLong)
      else java.lang.Long.valueOf(1L)
    }.orNull)
  }
}
