package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Standard MurmurHash3 x86_32 (public algorithm, Austin Appleby).
  *
  * Spark's builtin `hash()` is murmur3-*like* but processes the tail
  * byte-by-byte through the int mixer, so it does NOT match the
  * reference murmur3_x86_32 used by Doris's murmur_hash3_32
  * (be/src/exprs/function/function_hash.cpp, seed 0). This is the
  * spec-compliant version; equivalence with an independent
  * implementation (scala.util.hashing.MurmurHash3.bytesHash) is
  * property-tested.
  */
object Murmur3 {
  def hash32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2; h ^= k1
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  def hash32(s: UTF8String, seed: Int): Int = hash32(s.getBytes, seed)
}

/** murmur_hash3_32(str, seed) as a native Catalyst expression with
  * whole-stage codegen (the (b)-path of SURVEY §4.4: custom Expression
  * before UDF). */
case class MurmurHash3_32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"murmur_hash3_32 expects (STRING, INT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(str: Any, seed: Any): Any =
    Murmur3.hash32(str.asInstanceOf[UTF8String], seed.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sd) => s"graft.functions.Murmur3.hash32($s, $sd)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MurmurHash3_32 =
    copy(left = newLeft, right = newRight)
}
