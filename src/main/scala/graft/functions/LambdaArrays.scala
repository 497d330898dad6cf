package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

/** Doris lambda-first array composites (BuiltinScalarFunctions.java:
  * 625-660): array_count / array_first / array_last /
  * array_first_index / array_last_index / array_sortby / array_split /
  * array_reverse_split, under the Doris spelling
  * `array_count(x -> pred, arr)`.
  *
  * Spark's analyzer accepts a lambda argument only when the resolved
  * function's ROOT expression is itself a HigherOrderFunction, so a
  * plain alias like Size(ArrayFilter(..)) is rejected
  * (INVALID_LAMBDA_FUNCTION_CALL — the round-3/4 blocker). These
  * builders therefore compile each composite into a single
  * ArrayAggregate / ArraySort root and splice the USER's lambda body
  * into the fold's merge lambda — one scan of the array, codegen'd,
  * no second-pass filter.
  *
  * Scope: the single-array lambda forms (the reference also allows
  * multi-array lambdas; the alias layer's fixed canonical arity
  * policy applies — documented). Null elements: first/last treat a
  * matched NULL as "no match yet" (the sentinel is emptiness of the
  * carried 1-element array); sortby compares NULL keys as equal.
  */
object LambdaArrays {

  private def hof(args: Seq[Expression], name: String): (LambdaFunction, Expression) =
    args match {
      case Seq(l: LambdaFunction, arr) => (l, arr)
      case _ => throw new IllegalArgumentException(
        s"$name expects (lambda, array) in Doris argument order")
    }

  private def v(name: String) = UnresolvedNamedLambdaVariable(Seq(name))
  private def asBool(e: Expression) = Cast(e, BooleanType)
  /** empty ARRAY<elem> with the (yet-unresolved) element type of arr */
  private def emptyOf(arr: Expression) = Slice(arr, Literal(1), Literal(0))
  private def lastGroup(acc: Expression) = ElementAt(acc, Size(acc))
  /** acc with x appended to its last group */
  private def appendToLast(acc: Expression, x: Expression) =
    Concat(Seq(Slice(acc, Literal(1), Subtract(Size(acc), Literal(1))),
      CreateArray(Seq(Concat(Seq(lastGroup(acc), CreateArray(Seq(x))))))))

  /** count of elements where the lambda holds — one aggregate pass. */
  def count(args: Seq[Expression]): Expression = {
    val (l, arr) = hof(args, "array_count")
    val acc = v("acc_gr5")
    ArrayAggregate(arr, Literal(0L),
      LambdaFunction(
        If(asBool(l.function), Add(acc, Literal(1L)), acc),
        Seq(acc, l.arguments.head)),
      LambdaFunction.identity)
  }

  /** first/last element where the lambda holds, else NULL. State is a
    * 0/1-element array (emptiness = not found), so the element type
    * never needs to be known at build time. */
  def firstLast(args: Seq[Expression], name: String, keepFirst: Boolean): Expression = {
    val (l, arr) = hof(args, name)
    val acc = v("acc_gr5")
    val fin = v("fin_gr5")
    val hit = CreateArray(Seq(l.arguments.head))
    val onMatch = if (keepFirst) If(GreaterThan(Size(acc), Literal(0)), acc, hit) else hit
    ArrayAggregate(arr, emptyOf(arr),
      LambdaFunction(If(asBool(l.function), onMatch, acc), Seq(acc, l.arguments.head)),
      LambdaFunction(
        If(GreaterThan(Size(fin), Literal(0)), ElementAt(fin, Literal(1)), Literal(null)),
        Seq(fin)))
  }

  /** 1-based index of the first/last match, 0 when none (Doris
    * contract). State = [elements_seen, found_index]. */
  def index(args: Seq[Expression], name: String, first: Boolean): Expression = {
    val (l, arr) = hof(args, name)
    val acc = v("acc_gr5")
    val fin = v("fin_gr5")
    val pos = Add(ElementAt(acc, Literal(1)), Literal(1L))
    val prev = ElementAt(acc, Literal(2))
    val found =
      if (first) If(And(EqualTo(prev, Literal(0L)), asBool(l.function)), pos, prev)
      else If(asBool(l.function), pos, prev)
    ArrayAggregate(arr, CreateArray(Seq(Literal(0L), Literal(0L))),
      LambdaFunction(CreateArray(Seq(pos, found)), Seq(acc, l.arguments.head)),
      LambdaFunction(ElementAt(fin, Literal(2)), Seq(fin)))
  }

  /** sort ascending by the lambda's key (ClickHouse arraySort(λ, ..)
    * analog): ArraySort with a comparator evaluating the key on both
    * sides; equal/NULL keys compare 0, so the sort is stable there. */
  def sortBy(args: Seq[Expression]): Expression = {
    val (l, arr) = hof(args, "array_sortby")
    val a = v("sb_a_gr5")
    val b = v("sb_b_gr5")
    def key(to: Expression) = l.function.transformUp {
      case u: UnresolvedNamedLambdaVariable if u == l.arguments.head => to
    }
    ArraySort(arr,
      LambdaFunction(
        If(LessThan(key(a), key(b)), Literal(-1),
          If(GreaterThan(key(a), key(b)), Literal(1), Literal(0))),
        Seq(a, b)))
  }

  /** arraySplit/arrayReverseSplit (ClickHouse semantics, the Doris
    * origin): split BEFORE elements where the lambda holds (split) or
    * AFTER them (reverse_split); concatenation of the groups is always
    * the input, no empty groups. One aggregate pass; state =
    * ARRAY<ARRAY<elem>>. */
  def split(args: Seq[Expression], name: String, before: Boolean): Expression = {
    val (l, arr) = hof(args, name)
    val acc = v("acc_gr5")
    val fin = v("fin_gr5")
    val x = l.arguments.head
    val zero = Slice(CreateArray(Seq(emptyOf(arr))), Literal(1), Literal(0))
    val newGroup = Concat(Seq(acc, CreateArray(Seq(CreateArray(Seq(x))))))
    val merge =
      if (before)
        If(Or(EqualTo(Size(acc), Literal(0)), asBool(l.function)),
          newGroup, appendToLast(acc, x))
      else {
        val appended = If(EqualTo(Size(acc), Literal(0)), newGroup, appendToLast(acc, x))
        If(asBool(l.function),
          Concat(Seq(appended, CreateArray(Seq(emptyOf(arr))))), appended)
      }
    val finish =
      if (before) LambdaFunction(fin, Seq(fin))
      else LambdaFunction(
        If(And(GreaterThan(Size(fin), Literal(0)),
               EqualTo(Size(lastGroup(fin)), Literal(0))),
          Slice(fin, Literal(1), Subtract(Size(fin), Literal(1))), fin),
        Seq(fin))
    ArrayAggregate(arr, zero, LambdaFunction(merge, Seq(acc, x)), finish)
  }

  /** Builders for FunctionRegistry (name -> builder). */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_count" -> (count(_)),
    "array_first" -> (firstLast(_, "array_first", keepFirst = true)),
    "array_last" -> (firstLast(_, "array_last", keepFirst = false)),
    "array_first_index" -> (index(_, "array_first_index", first = true)),
    "array_last_index" -> (index(_, "array_last_index", first = false)),
    "array_sortby" -> (sortBy(_)),
    "array_split" -> (split(_, "array_split", before = true)),
    "array_reverse_split" -> (split(_, "array_reverse_split", before = false))
  )
}
