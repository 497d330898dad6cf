package graft.ops

/** Delta Lake DELETION VECTOR codecs from the PUBLIC protocol spec
  * (PROTOCOL.md "Deletion Vectors" + the RoaringBitmap "portable"
  * serialization spec it references, and the ZeroMQ Z85 spec for the
  * inline encoding). A deletion vector marks row POSITIONS of a parquet
  * file as deleted without rewriting the file — the protocol's
  * row-level delete.
  *
  * Three pieces, all bit-level formats:
  *  - Z85: 4 bytes → 5 ASCII chars (inline DVs ride inside the JSON
  *    action); pinned to the published "HelloWorld" test vector in
  *    DeltaDvSpec.
  *  - 64-bit RoaringBitmap, "portable" format: u64 little-endian bucket
  *    count, then per bucket a u32 high part + a 32-bit roaring
  *    bitmap (cookie 12346/12347, array + bitmap containers; run
  *    containers are parsed on read via the run-cookie but never
  *    produced by this writer).
  *  - the DV blob: u32 magic 1681511377 (little-endian) + the portable
  *    bitmap; stored either inline (z85) or in a `.bin` DV FILE —
  *    1-byte format version, then length-prefixed blobs (u32 big-endian
  *    size at each descriptor's offset) each followed by a CRC32
  *    checksum of the blob.
  */
object DeltaDv {

  // ------------------------------------------------------------------- Z85
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 needs 4-byte multiples, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 52200625L // 85^4
      while (div >= 1) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 needs 5-char multiples, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Decode(s.charAt(i + j).toInt)
        require(d >= 0, s"invalid z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
      o += 4
    }
    out
  }

  // -------------------------------------------------- portable roaring64
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347 // with run containers (read-only here)
  private val NoOffsetThreshold = 4

  /** Serialize sorted distinct non-negative longs as a portable
    * 64-bit roaring bitmap (array + bitmap containers only). */
  def roaringSerialize(positions: Seq[Long]): Array[Byte] = {
    require(positions == positions.sorted && positions.distinct == positions,
      "positions must be sorted distinct")
    val byHigh = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def writeIntLE(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
    def writeLongLE(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
    def writeShortLE(v: Int): Unit = out.writeShort(java.lang.Short.reverseBytes(v.toShort))
    writeLongLE(byHigh.size.toLong)
    byHigh.foreach { case (high, ps) =>
      writeIntLE(high)
      // 32-bit roaring over the low words, bucketed by the upper 16 bits
      val lows = ps.map(p => (p & 0xffffffffL).toInt)
      val byKey = lows.groupBy(l => (l >>> 16) & 0xffff).toSeq.sortBy(_._1)
      writeIntLE(SerialCookieNoRun)
      writeIntLE(byKey.size)
      byKey.foreach { case (key, vs) =>
        writeShortLE(key)
        writeShortLE(vs.size - 1)
      }
      // offsets header (present for the no-run cookie)
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        writeIntLE(off)
        off += (if (vs.size > 4096) 8192 else 2 * vs.size)
      }
      byKey.foreach { case (_, vs) =>
        val lows16 = vs.map(_ & 0xffff).sorted
        if (vs.size > 4096) {
          val words = new Array[Long](1024)
          lows16.foreach(l => words(l >>> 6) |= (1L << (l & 63)))
          words.foreach(writeLongLE)
        } else lows16.foreach(writeShortLE)
      }
    }
    out.flush()
    bos.toByteArray
  }

  /** Deserialize a portable 64-bit roaring bitmap to sorted positions. */
  def roaringDeserialize(bytes: Array[Byte]): Seq[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Long]
    val nBuckets = in.getLong
    (0L until nBuckets).foreach { _ =>
      val high = in.getInt.toLong << 32
      val cookieRaw = in.getInt
      val cookie = cookieRaw & 0xffff
      val hasRun = cookie == SerialCookie
      val nContainers =
        if (hasRun) ((cookieRaw >>> 16) & 0xffff) + 1 else in.getInt
      require(cookie == SerialCookieNoRun || hasRun,
        s"unknown roaring cookie $cookie")
      val runBitmap: Array[Byte] =
        if (hasRun) { val b = new Array[Byte]((nContainers + 7) / 8); in.get(b); b }
        else Array.empty
      def isRun(i: Int): Boolean =
        hasRun && (runBitmap(i / 8) & (1 << (i % 8))) != 0
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      (0 until nContainers).foreach { i =>
        keys(i) = in.getShort & 0xffff
        cards(i) = (in.getShort & 0xffff) + 1
      }
      if (!hasRun || nContainers >= NoOffsetThreshold)
        (0 until nContainers).foreach(_ => in.getInt) // offsets, sequential read
      (0 until nContainers).foreach { i =>
        val base = high | (keys(i).toLong << 16)
        if (isRun(i)) {
          val nRuns = in.getShort & 0xffff
          (0 until nRuns).foreach { _ =>
            val start = in.getShort & 0xffff
            val len = in.getShort & 0xffff
            (start to start + len).foreach(v => out += (base | v))
          }
        } else if (cards(i) > 4096) {
          (0 until 1024).foreach { w =>
            val word = in.getLong
            var b = 0
            while (b < 64) {
              if ((word & (1L << b)) != 0) out += (base | (w * 64 + b))
              b += 1
            }
          }
        } else {
          (0 until cards(i)).foreach(_ => out += (base | (in.getShort & 0xffff)))
        }
      }
    }
    out.result()
  }

  // ----------------------------------------------------------- DV blobs
  /** PROTOCOL.md deletion-vector magic. */
  val DvMagic = 1681511377

  /** magic + portable bitmap. */
  def dvBlob(positions: Seq[Long]): Array[Byte] = {
    val bm = roaringSerialize(positions)
    val bb = java.nio.ByteBuffer.allocate(4 + bm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(DvMagic)
    bb.put(bm)
    bb.array()
  }

  def dvBlobPositions(blob: Array[Byte]): Seq[Long] = {
    val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == DvMagic, "bad deletion-vector magic")
    roaringDeserialize(java.util.Arrays.copyOfRange(blob, 4, blob.length))
  }

  /** Append DV blobs to a `.bin` DV file (creating it with the 1-byte
    * format version). Returns (offset, sizeInBytes) per blob — what the
    * descriptor records. Each blob is framed [u32 BE size][blob]
    * [u32 BE crc32(blob)]. */
  def writeDvFile(path: String, blobs: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val created = !f.exists()
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f, true)))
    var offset: Long = if (created) { out.writeByte(1); 1L } else f.length()
    try blobs.map { blob =>
      // the protocol's descriptor carries offset/sizeInBytes as 32-bit
      // ints — a DV file past 2 GB is unrepresentable, so refuse loudly
      // instead of wrapping (writers shard DVs across files well before
      // this; deleteRows writes one DV file per task)
      require(offset + 8L + blob.length <= Int.MaxValue.toLong,
        s"DV file $path would exceed the protocol's 32-bit " +
          "offset/sizeInBytes descriptor fields — start a new DV file")
      val at = offset.toInt
      out.writeInt(blob.length)
      out.write(blob)
      val crc = new java.util.zip.CRC32()
      crc.update(blob)
      out.writeInt(crc.getValue.toInt)
      offset += 4L + blob.length + 4L
      (at, blob.length)
    } finally out.close()
  }

  /** Read one DV's positions from a DV file at a descriptor's offset,
    * verifying size and checksum. */
  def readDvFile(path: String, offset: Int, sizeInBytes: Int): Seq[Long] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      raf.seek(offset.toLong)
      val size = raf.readInt()
      require(size == sizeInBytes,
        s"DV size mismatch at $offset: framed $size vs descriptor $sizeInBytes")
      val blob = new Array[Byte](size)
      raf.readFully(blob)
      val stored = raf.readInt()
      val crc = new java.util.zip.CRC32()
      crc.update(blob)
      require(stored == crc.getValue.toInt, "DV checksum mismatch")
      dvBlobPositions(blob)
    } finally raf.close()
  }
}
