package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, NullType, StringType}
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

  /** The reference's murmur_hash3_x64_64: a single-lane 64-bit variant
    * (8-byte blocks through the x64_128 k1 mixer, rotl27/5x+0x52dce729
    * accumulation, fmix64 finalize — util/hash/murmur_hash3.cpp
    * murmur_hash3_x64_64). NOT the x64_128 h1 lane; verified against
    * the reference's published output vectors. */
  def hash64(data: Array[Byte], seed: Long): Long = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    val nBlocks = data.length / 8
    var i = 0
    while (i < nBlocks) {
      val base = i * 8
      var k1 = 0L
      var b = 0
      while (b < 8) { k1 |= (data(base + b) & 0xffL) << (b * 8); b += 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2
      h1 ^= k1; h1 = java.lang.Long.rotateLeft(h1, 27); h1 = h1 * 5 + 0x52dce729L
      i += 1
    }
    val tailLen = data.length & 7
    if (tailLen > 0) {
      val tail = nBlocks * 8
      var k1 = 0L
      var b = tailLen - 1
      while (b >= 0) { k1 |= (data(tail + b) & 0xffL) << (b * 8); b -= 1 }
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length.toLong
    h1 ^= h1 >>> 33; h1 *= 0xff51afd7ed558ccdL
    h1 ^= h1 >>> 33; h1 *= 0xc4ceb9fe1a85ec53L
    h1 ^= h1 >>> 33
    h1
  }

  def hash64(s: UTF8String, seed: Long): Long = hash64(s.getBytes, seed)

  /** Standard XXH32 (public xxHash spec; the reference's xxhash_32 —
    * function_hash.cpp XxHashImpl, seed 0, verified against the
    * reference's test_hash_function.out vectors). The reference's
    * xxhash_64 aliases XXH3_64 (a different, secret-array-based
    * algorithm) and is intentionally not replicated. */
  def xxhash32(data: Array[Byte], seed: Int): Int = {
    val P1 = 0x9e3779b1; val P2 = 0x85ebca77; val P3 = 0xc2b2ae3d
    val P4 = 0x27d4eb2f; val P5 = 0x165667b1
    val n = data.length
    var i = 0
    def get32(o: Int): Int =
      (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
    var h = 0
    if (n >= 16) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (i + 16 <= n) {
        v1 = Integer.rotateLeft(v1 + get32(i) * P2, 13) * P1
        v2 = Integer.rotateLeft(v2 + get32(i + 4) * P2, 13) * P1
        v3 = Integer.rotateLeft(v3 + get32(i + 8) * P2, 13) * P1
        v4 = Integer.rotateLeft(v4 + get32(i + 12) * P2, 13) * P1
        i += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P5
    h += n
    while (i + 4 <= n) {
      h = Integer.rotateLeft(h + get32(i) * P3, 17) * P4
      i += 4
    }
    while (i < n) {
      h = Integer.rotateLeft(h + (data(i) & 0xff) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  def xxhash32(s: UTF8String, seed: Int): Int = xxhash32(s.getBytes, seed)
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

/** xxhash_32(str, seed) — standard XXH32, seed 0 default, chained for
  * multi-arg like the murmur forms. */
case class XxHash32Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"xxhash_32 expects (STRING, INT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(str: Any, seed: Any): Any =
    Murmur3.xxhash32(str.asInstanceOf[UTF8String], seed.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sd) => s"graft.functions.Murmur3.xxhash32($s, $sd)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxHash32Expr =
    copy(left = newLeft, right = newRight)
}

/** xxhash_64(str, seed) — XXH3-64 (function_hash.cpp uses xxh3.h),
  * seed 0 default, chained for multi-arg like the murmur forms. */
case class XxHash3Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == StringType || left.dataType == NullType) &&
        right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"xxhash_64 expects (STRING, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(str: Any, seed: Any): Any =
    XxHash3.hashSeeded(str.asInstanceOf[UTF8String], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sd) => s"graft.functions.XxHash3.hashSeeded($s, $sd)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxHash3Expr =
    copy(left = newLeft, right = newRight)
}

/** murmur_hash3_64(str, seed) — reference x64_64 variant, seed 0
  * default, chained for multi-arg like the 32-bit form. */
case class MurmurHash3_64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"murmur_hash3_64 expects (STRING, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(str: Any, seed: Any): Any =
    Murmur3.hash64(str.asInstanceOf[UTF8String], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, sd) => s"graft.functions.Murmur3.hash64($s, $sd)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MurmurHash3_64 =
    copy(left = newLeft, right = newRight)
}

/** Iceberg partition-transform bucket hash (spec Appendix B): integral
  * values hash as murmur3_x86_32 over the LITTLE-ENDIAN 8-byte long
  * (ints promote to long first), strings over their UTF-8 bytes, seed
  * 0; the bucket is (hash & Int.MaxValue) % N. The published vectors
  * (hash(34L) = 2017239379, hash("iceberg") = 1210000089) are pinned in
  * IcebergLiteSpec. */
object IcebergBucket {
  def ofLong(v: Long, n: Int): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    (Murmur3.hash32(b, 0) & Integer.MAX_VALUE) % n
  }
  def ofString(s: UTF8String, n: Int): Int =
    (Murmur3.hash32(s.getBytes, 0) & Integer.MAX_VALUE) % n
}

/** iceberg_bucket(col, N) as a native codegen Expression — the
  * write-path transform stamp ((b)-path of SURVEY §4.4: custom
  * Expression before UDF), so a 100 TB bucketed write keeps the
  * partition column inside whole-stage codegen. */
case class IcebergBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == LongType || left.dataType == IntegerType ||
         left.dataType == StringType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket expects (BIGINT|INT|STRING, INT), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any, n: Any): Any = left.dataType match {
    case LongType => IcebergBucket.ofLong(v.asInstanceOf[Long], n.asInstanceOf[Int])
    case IntegerType => IcebergBucket.ofLong(v.asInstanceOf[Int].toLong, n.asInstanceOf[Int])
    case _ => IcebergBucket.ofString(v.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    left.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, (v, n) =>
          s"graft.functions.IcebergBucket.ofLong($v, $n)")
      case IntegerType =>
        defineCodeGen(ctx, ev, (v, n) =>
          s"graft.functions.IcebergBucket.ofLong((long) $v, $n)")
      case _ =>
        defineCodeGen(ctx, ev, (v, n) =>
          s"graft.functions.IcebergBucket.ofString($v, $n)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IcebergBucketExpr =
    copy(left = newLeft, right = newRight)
}
