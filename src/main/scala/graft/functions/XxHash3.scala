package graft.functions

/** XXH3-64 (the reference's xxhash_64 — be/src/exprs/function/
  * function_hash.cpp uses XXH3 via xxh3.h), implemented from the
  * public xxHash specification: 0-16/17-128/129-240 mixing paths over
  * the 192-byte canonical secret, and the 8-lane striped accumulator
  * for long inputs. Scalar only (no SIMD) — bit-identical by spec.
  *
  * Verification status: pinned in `XxHash3Props` to the xxHash repo's
  * PUBLISHED sanity vectors (xsum_sanity_check.c XSUM_XXH3_testdata —
  * lengths 0/1/6/12/24/48/80/195/403/512/2048 over the documented
  * prime-generator buffer, at seed 0 AND seed PRIME64), which covers
  * every mixing path including the seeded >240 custom-secret long
  * path. The earlier self-derived boundary pins are kept as extra
  * regression coverage.
  */
object XxHash3 {

  private val P32_1 = 0x9E3779B1L
  private val P32_2 = 0x85EBCA77L
  private val P32_3 = 0xC2B2AE3DL
  private val P64_1 = 0x9E3779B185EBCA87L
  private val P64_2 = 0xC2B2AE3D27D4EB4FL
  private val P64_3 = 0x165667B19E3779F9L
  private val P64_4 = 0x85EBCA77C2B2AE63L
  private val P64_5 = 0x27D4EB2F165667C5L

  /** the canonical 192-byte secret (XXH3_kSecret). */
  private val kSecret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e
  ).map(_.toByte)

  private def read32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def read64(b: Array[Byte], off: Int): Long =
    read32(b, off) | (read32(b, off + 4) << 32)

  private def swap32(x: Long): Long = {
    val i = x.toInt
    java.lang.Integer.reverseBytes(i).toLong & 0xffffffffL
  }
  private def swap64(x: Long): Long = java.lang.Long.reverseBytes(x)
  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  /** 64x64 -> 128 multiply, folded (lo ^ hi). */
  private def mul128fold64(a: Long, b: Long): Long = {
    val lo = a * b
    val hi = java.lang.Math.multiplyHigh(a, b) +
      (if (a < 0) b else 0L) + (if (b < 0) a else 0L) // unsigned-high correction
    lo ^ hi
  }

  private def mult32to64(a: Long, b: Long): Long = (a & 0xffffffffL) * (b & 0xffffffffL)

  private def xxh64Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^= h >>> 32; h
  }

  private def xxh3Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= 0x165667919E3779F9L; h ^= h >>> 32; h
  }

  private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= rotl(h, 49) ^ rotl(h, 24)
    h *= 0x9FB21C651E98DF25L
    h ^= (h >>> 35) + len
    h *= 0x9FB21C651E98DF25L
    h ^ (h >>> 28)
  }

  private def mix16B(in: Array[Byte], inOff: Int, sec: Int, seed: Long): Long =
    mul128fold64(
      read64(in, inOff) ^ (read64(kSecret, sec) + seed),
      read64(in, inOff + 8) ^ (read64(kSecret, sec + 8) - seed))

  private def len0to16(in: Array[Byte], seed: Long): Long = {
    val len = in.length
    if (len > 8) {
      val bitflip1 = (read64(kSecret, 24) ^ read64(kSecret, 32)) + seed
      val bitflip2 = (read64(kSecret, 40) ^ read64(kSecret, 48)) - seed
      val inputLo = read64(in, 0) ^ bitflip1
      val inputHi = read64(in, len - 8) ^ bitflip2
      val acc = len.toLong + swap64(inputLo) + inputHi + mul128fold64(inputLo, inputHi)
      xxh3Avalanche(acc)
    } else if (len >= 4) {
      val s = seed ^ (swap32(seed & 0xffffffffL) << 32)
      val input1 = read32(in, 0)
      val input2 = read32(in, len - 4)
      val bitflip = (read64(kSecret, 8) ^ read64(kSecret, 16)) - s
      val input64 = input2 + (input1 << 32)
      rrmxmx(input64 ^ bitflip, len.toLong)
    } else if (len > 0) {
      val c1 = in(0) & 0xffL
      val c2 = in(len >> 1) & 0xffL
      val c3 = in(len - 1) & 0xffL
      val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bitflip = ((read32(kSecret, 0) ^ read32(kSecret, 4)) & 0xffffffffL) + seed
      xxh64Avalanche(combined ^ bitflip)
    } else {
      xxh64Avalanche(seed ^ read64(kSecret, 56) ^ read64(kSecret, 64))
    }
  }

  private def len17to128(in: Array[Byte], seed: Long): Long = {
    val len = in.length
    var acc = len.toLong * P64_1
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          acc += mix16B(in, 48, 96, seed)
          acc += mix16B(in, len - 64, 112, seed)
        }
        acc += mix16B(in, 32, 64, seed)
        acc += mix16B(in, len - 48, 80, seed)
      }
      acc += mix16B(in, 16, 32, seed)
      acc += mix16B(in, len - 32, 48, seed)
    }
    acc += mix16B(in, 0, 0, seed)
    acc += mix16B(in, len - 16, 16, seed)
    xxh3Avalanche(acc)
  }

  private def len129to240(in: Array[Byte], seed: Long): Long = {
    val len = in.length
    var acc = len.toLong * P64_1
    val nbRounds = len / 16
    var i = 0
    while (i < 8) { acc += mix16B(in, 16 * i, 16 * i, seed); i += 1 }
    acc = xxh3Avalanche(acc)
    while (i < nbRounds) {
      acc += mix16B(in, 16 * i, 16 * (i - 8) + 3, seed) // MIDSIZE_STARTOFFSET = 3
      i += 1
    }
    acc += mix16B(in, len - 16, 136 - 17, seed) // SECRET_SIZE_MIN - MIDSIZE_LASTOFFSET
    xxh3Avalanche(acc)
  }

  private def accumulate512(acc: Array[Long], in: Array[Byte], inOff: Int,
                            sec: Array[Byte], secOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      val dataVal = read64(in, inOff + 8 * i)
      val dataKey = dataVal ^ read64(sec, secOff + 8 * i)
      acc(i ^ 1) += dataVal
      acc(i) += mult32to64(dataKey, dataKey >>> 32)
      i += 1
    }
  }

  private def scramble(acc: Array[Long], sec: Array[Byte], secOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      var a = acc(i)
      a ^= a >>> 47
      a ^= read64(sec, secOff + 8 * i)
      a *= P32_1
      acc(i) = a
      i += 1
    }
  }

  private def write64(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** XXH3_initCustomSecret: per 16-byte chunk, low word += seed and
    * high word -= seed (little-endian), over the canonical secret. */
  private def deriveSecret(seed: Long): Array[Byte] = {
    val out = new Array[Byte](192)
    var i = 0
    while (i < 12) {
      write64(out, 16 * i, read64(kSecret, 16 * i) + seed)
      write64(out, 16 * i + 8, read64(kSecret, 16 * i + 8) - seed)
      i += 1
    }
    out
  }

  private def hashLong(in: Array[Byte], sec: Array[Byte]): Long = {
    val len = in.length
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)
    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen
    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) {
        accumulate512(acc, in, n * blockLen + s * 64, sec, s * 8)
        s += 1
      }
      scramble(acc, sec, 192 - 64)
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, in, nbBlocks * blockLen + s * 64, sec, s * 8)
      s += 1
    }
    accumulate512(acc, in, len - 64, sec, 192 - 64 - 7) // SECRET_LASTACC_START = 7
    // merge (SECRET_MERGEACCS_START = 11)
    var result = len.toLong * P64_1
    var i = 0
    while (i < 4) {
      result += mul128fold64(
        acc(2 * i) ^ read64(sec, 11 + 16 * i),
        acc(2 * i + 1) ^ read64(sec, 11 + 16 * i + 8))
      i += 1
    }
    xxh3Avalanche(result)
  }

  /** XXH3_64bits / XXH3_64bits_withSeed: short inputs use the
    * seed-mixed paths over the canonical secret; the >240 long path
    * with a nonzero seed runs over the derived custom secret
    * (XXH3_initCustomSecret), exactly as the spec prescribes. */
  def hash(in: Array[Byte], seed: Long = 0L): Long = {
    val len = in.length
    if (len <= 16) len0to16(in, seed)
    else if (len <= 128) len17to128(in, seed)
    else if (len <= 240) len129to240(in, seed)
    else if (seed == 0L) hashLong(in, kSecret)
    else hashLong(in, deriveSecret(seed))
  }

  def hashString(s: String): Long = hash(s.getBytes("UTF-8"))

  /** entry point for the chained xxhash_64 Catalyst expression. */
  def hashSeeded(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    hash(s.getBytes, seed)
}
