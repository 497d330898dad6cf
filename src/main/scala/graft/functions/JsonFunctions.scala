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

  /** mode: 0=set (always), 1=insert (only absent), 2=replace (only present).
    *
    * MySQL no-op contract (ADVICE r03): a valid document whose root is
    * not an object, or a path this flat-`$.key` implementation does not
    * resolve (nested, array subscript), returns the document UNCHANGED —
    * NULL only for NULL/unparseable documents. Root path `$` follows
    * MySQL: set/replace substitute the whole document, insert no-ops. */
  private def mutate(doc: String, path: String, value: String, mode: Int): String =
    parse(doc) match {
      case None => null
      case Some(_) if path == "$" =>
        if (mode == 1) doc else mapper.writeValueAsString(parseValue(value))
      case Some(root) =>
        (root, key(path)) match {
          case (obj: ObjectNode, Some(k)) =>
            val present = obj.has(k)
            val write = mode match {
              case 0 => true
              case 1 => !present
              case _ => present
            }
            if (write) obj.set[JsonNode](k, parseValue(value))
            mapper.writeValueAsString(obj)
          case _ => doc
        }
    }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("json_set", (d: String, p: String, v: String) => mutate(d, p, v, 0))
    u.register("json_insert", (d: String, p: String, v: String) => mutate(d, p, v, 1))
    u.register("json_replace", (d: String, p: String, v: String) => mutate(d, p, v, 2))
    u.register("json_valid", (d: String) =>
      if (d == null) null else java.lang.Boolean.valueOf(parse(d).isDefined))
    // json_type(doc, path): reference arity + its lowercase typeName
    // table (jsonb_document.h:738 — int32-fitting integers are "int",
    // int64 "bigint", wider "largeint"); path = '$' or top-level '$.k'
    u.register("json_type", (d: String, p: String) => parse(d).flatMap { root =>
      val node =
        if (p == "$") Option(root)
        else key(p).flatMap(k => if (root.isObject && root.has(k)) Some(root.get(k)) else None)
      node.map { n =>
        if (n.isObject) "object"
        else if (n.isArray) "array"
        else if (n.isTextual) "string"
        else if (n.isIntegralNumber) {
          if (n.canConvertToInt) "int"
          else if (n.canConvertToLong) "bigint"
          else "largeint"
        } else if (n.isNumber) "double"
        else if (n.isBoolean) "bool"
        else "null"
      }
    }.orNull)
    // number of object keys / array elements; 1 for scalars (MySQL/Doris)
    u.register("json_length", (d: String) => parse(d).map { n =>
      if (n.isContainerNode) java.lang.Long.valueOf(n.size().toLong)
      else java.lang.Long.valueOf(1L)
    }.orNull)
    // json_quote: wrap a raw string as a JSON string literal (escapes);
    // json_unquote: parse a JSON string literal back (non-strings and
    // unparseable input pass through, MySQL-compatible)
    u.register("json_quote", (s: String) =>
      if (s == null) null else mapper.writeValueAsString(mapper.getNodeFactory.textNode(s)))
    u.register("json_unquote", (s: String) =>
      if (s == null) null
      else parse(s) match {
        case Some(n) if n.isTextual => n.asText()
        case _ => s
      })
    // json_contains(doc, candidate): MySQL containment — objects contain
    // a candidate object when every candidate key/value is contained;
    // arrays contain scalars/objects that match any element; scalars
    // must be equal
    def contains(target: JsonNode, cand: JsonNode): Boolean = {
      if (target.isObject && cand.isObject) {
        val it = cand.fields()
        var ok = true
        while (ok && it.hasNext) {
          val e = it.next()
          ok = target.has(e.getKey) && contains(target.get(e.getKey), e.getValue)
        }
        ok
      } else if (target.isArray) {
        if (cand.isArray) {
          val it = cand.elements()
          var ok = true
          while (ok && it.hasNext) {
            val c = it.next()
            var found = false
            val te = target.elements()
            while (!found && te.hasNext) found = contains(te.next(), c)
            ok = found
          }
          ok
        } else {
          var found = false
          val te = target.elements()
          while (!found && te.hasNext) found = contains(te.next(), cand)
          found
        }
      } else target == cand
    }
    u.register("json_contains", (d: String, c: String) =>
      (parse(d), parse(c)) match {
        case (Some(t), Some(cn)) => java.lang.Boolean.valueOf(contains(t, cn))
        case _ => null
      })
    u.register("json_exists_path", (d: String, p: String) =>
      parse(d).map { n =>
        java.lang.Boolean.valueOf(
          if (p != null && p.startsWith("$.") && p.length > 2 && !p.drop(2).contains('.'))
            n.isObject && n.has(p.drop(2))
          else false)
      }.orNull)
  }
}
