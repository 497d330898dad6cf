package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata
  * structs, decode/feature-extract/frame-sample operators.
  *
  * The format codecs in this file are REAL byte-level implementations
  * from the public specs — gzip (JDK), tar/ustar with verified header
  * checksums, PNG (zlib inflate + all five filters, cross-validated
  * against javax.imageio), 24-bit BMP, GIF with full variable-width
  * LZW (cross-validated against javax.imageio), baseline JPEG
  * (in-file Huffman tables, DC prediction, dequant, full IDCT —
  * ops/JpegCodec.scala, also imageio-cross-validated), WAV/PCM decode +
  * decimation resample, frame containers, plus windowed audio features
  * and DFT-bin spectral magnitudes over decoded PCM.
  *
  * Video is REAL too as of round 8 (`ops/VideoCodec.scala`): AVI/RIFF
  * with Motion-JPEG frames through the real JPEG decoder (incl. idx1
  * random access) and YUV4MPEG2 with genuine 4:2:0 plane arithmetic.
  * Only the GENERIC fallbacks below (`decodeMeta`/`resizeMeta`) remain
  * the documented ===== STUB =====, kept for formats with no codec in
  * this container (e.g. compressed inter-frame codecs): they derive
  * deterministic fake dimensions from the payload bytes so the
  * Spark-side plumbing (binary columns, struct schemas, batch shape,
  * partitioning) stays real and tested; a production build swaps their
  * bodies behind the same schema.
  */
object MultimodalOps {

  /** synthetic payload: 4-byte format tag + utf8 body. */
  def makeBlob(format: Column, body: Column): Column =
    concat(format.cast("binary"), body.cast("binary"))

  /** STUB decode: format tag from the first 4 bytes; fake
    * width/height/channels from payload length (deterministic). */
  def decodeMeta(blob: Column): Column = struct(
    decode(substring(blob, 1, 4), "UTF-8").as("format"),
    (pmod(octet_length(blob) * 7, lit(1920)) + 1).cast("int").as("width"),
    (pmod(octet_length(blob) * 13, lit(1080)) + 1).cast("int").as("height"),
    octet_length(blob).as("n_bytes"))

  /** frame-sample: n evenly spaced byte offsets into the payload
    * (stands in for video frame extraction offsets). */
  def frameOffsets(blob: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => i * floor(octet_length(blob) / n).cast("long"))

  /** STUB resize: metadata for a scale-to-fit (w,h) transform — output
    * dims preserve aspect ratio against the stub-decoded dims, byte
    * size scales by pixel ratio (deterministic integer math). */
  def resizeMeta(blob: Column, w: Int, h: Int): Column = {
    val m = decodeMeta(blob)
    val sw = m.getField("width").cast("long")
    val sh = m.getField("height").cast("long")
    // scale = min(w/sw, h/sh) in exact rational form: pick the axis
    // whose cross-product is smaller, then floor-divide
    val useW = sw * lit(h) >= sh * lit(w)
    val ow = when(useW, lit(w)).otherwise((sw * lit(h)) / sh).cast("int")
    val oh = when(useW, (sh * lit(w)) / sw).otherwise(lit(h)).cast("int")
    struct(ow.as("width"), oh.as("height"),
      (ow.cast("long") * oh * 3L).as("n_bytes"))
  }

  // ---- REAL codec: gzip ---------------------------------------------
  // Pretraining corpora arrive gzip-compressed (WARC/WET shards,
  // jsonl.gz). The JDK carries the full codec, so both directions are
  // REAL here: compress with GZIPOutputStream (scaffolding), stream-
  // decompress with GZIPInputStream inside mapPartitions (the product
  // path) — one decompressor per partition, no shuffle.

  def gzipBytes(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  def gunzipString(b: Array[Byte]): String = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    new String(out.toByteArray, "UTF-8")
  }

  /** raw-bytes variants (tar.gz shards need a binary payload). */
  def gzipRaw(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  def gunzipRaw(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** (id, text) -> (id, gz: binary) — the compressed-shard scaffold. */
  def gzipTexts(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, s) => (id, gzipBytes(s)) })
      .toDF(idCol, "gz")
  }

  /** REAL per-partition gzip decode + text stats: decompressed length,
    * word count, compression ratio, and an md5 fingerprint proving the
    * round-trip is byte-exact. */
  def gunzipBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                  gzCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(gzCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, gz) =>
          val s = gunzipString(gz)
          (id, gz.length.toLong, s.length.toLong,
            s.split(" ").length.toLong, s)
        }
      }
      .toDF(idCol, "gz_bytes", "n_chars2", "n_words", "text2")
  }

  // ---- REAL container: tar (ustar) ----------------------------------
  // tar.gz of per-doc text files is the other format corpora ship in
  // (WARC-adjacent dumps, HF dataset shards). tar is pure byte layout:
  // 512-byte ustar headers with octal size fields and a checksum. Both
  // directions are real; the decoder VERIFIES each header checksum
  // (sum of header bytes with the checksum field read as spaces).

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    (("0" * (width - 1 - s.length)) + s + " ").getBytes("US-ASCII")
  }

  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, content) =>
      val h = new Array[Byte](512)
      def put(off: Int, b: Array[Byte]): Unit = System.arraycopy(b, 0, h, off, b.length)
      put(0, name.getBytes("US-ASCII"))
      put(100, octal(0x1a4, 8))        // mode 0644
      put(108, octal(0, 8))            // uid
      put(116, octal(0, 8))            // gid
      put(124, octal(content.length.toLong, 12))
      put(136, octal(0, 12))           // mtime
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum placeholder
      h(156) = '0'                     // regular file
      put(257, Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')) // magic+version
      val sum = h.map(_ & 0xff).sum
      val chk = java.lang.Long.toOctalString(sum.toLong)
      put(148, (("0" * (6 - chk.length)) + chk).getBytes("US-ASCII"))
      h(154) = 0; h(155) = ' '         // canonical "%06o<NUL><space>" form
      out.write(h)
      out.write(content)
      val pad = (512 - content.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  /** Walk a tar stream, verifying every header checksum. */
  def untar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val res = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      if (bytes(off) == 0) done = true // zero block = end
      else {
        var end = off
        while (end < off + 100 && bytes(end) != 0) end += 1
        val name = new String(bytes, off, end - off, "US-ASCII")
        val sizeStr = new String(bytes, off + 124, 12, "US-ASCII")
          .takeWhile(c => c >= '0' && c <= '7')
        val size = java.lang.Long.parseLong(sizeStr, 8).toInt
        val stored = java.lang.Long.parseLong(
          new String(bytes, off + 148, 8, "US-ASCII")
            .filter(c => c >= '0' && c <= '7'), 8)
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(off + i) & 0xff)
          i += 1
        }
        require(sum == stored, s"tar checksum mismatch at entry $name")
        res += name -> java.util.Arrays.copyOfRange(bytes, off + 512, off + 512 + size)
        off += 512 + size + (512 - size % 512) % 512
      }
    }
    res.result()
  }

  // ---- REAL codec: PNG ----------------------------------------------
  // Full compressed-image path with nothing but the JDK: chunk layout +
  // CRC32, zlib (Deflater/Inflater), and the five scanline filters
  // (None/Sub/Up/Average/Paeth). The encoder deliberately cycles the
  // filter type per row (row mod 5), so a decoder that mishandles ANY
  // unfilter path — or the Paeth predictor — produces wrong pixels and
  // fails the closed-form oracle. 8-bit grayscale, non-interlaced.

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Scaffolding: encode the deterministic gradient as a valid PNG,
    * filter type = row mod 5. */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    // reconstructed (true) pixels, raster order top-down
    val recon = Array.tabulate(h, w)((y, x) => ((id * 31 + x * 7 + y * 3) % 256).toInt)
    // filtered scanlines: [filter byte][w filtered bytes] per row
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val f = y % 5
      raw.write(f)
      for (x <- 0 until w) {
        val cur = recon(y)(x)
        val left = if (x > 0) recon(y)(x - 1) else 0
        val up = if (y > 0) recon(y - 1)(x) else 0
        val ul = if (x > 0 && y > 0) recon(y - 1)(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, adaptive, no interlace
      .array()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  def syntheticPngs(df: org.apache.spark.sql.DataFrame, idCol: String,
                    w: Int, h: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodePng(id, w, h))))
      .toDF(idCol, "png")
  }

  /** REAL per-partition PNG decode: signature + chunk walk + CRC check,
    * zlib inflate, all five unfilters, grayscale stats. */
  def decodePngBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                     blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian default
          require((bb.getLong(0) & 0xffffffffffffffffL) == 0x89504e470d0a1a0aL,
            s"not a PNG for id=$id")
          var off = 8
          var w = -1; var h = -1
          val idat = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done && off + 8 <= bytes.length) {
            val len = bb.getInt(off)
            val typ = new String(bytes, off + 4, 4, "US-ASCII")
            val crc = new java.util.zip.CRC32()
            crc.update(bytes, off + 4, 4 + len)
            require(crc.getValue.toInt == bb.getInt(off + 8 + len),
              s"CRC mismatch in $typ chunk for id=$id")
            typ match {
              case "IHDR" =>
                w = bb.getInt(off + 8); h = bb.getInt(off + 12)
                val depth = bytes(off + 16) & 0xff
                val color = bytes(off + 17) & 0xff
                val interlace = bytes(off + 20) & 0xff
                require(depth == 8 && color == 0 && interlace == 0,
                  s"unsupported PNG layout (depth=$depth color=$color interlace=$interlace)")
              case "IDAT" => idat.write(bytes, off + 8, len)
              case "IEND" => done = true
              case _ => () // ancillary chunk: skip
            }
            off += 12 + len
          }
          val inflater = new java.util.zip.Inflater()
          inflater.setInput(idat.toByteArray)
          val raw = new Array[Byte]((w + 1) * h)
          var got = 0
          while (got < raw.length && !inflater.finished())
            got += inflater.inflate(raw, got, raw.length - got)
          inflater.end()
          require(got == raw.length, s"short inflate for id=$id: $got")
          // unfilter
          val recon = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            val f = raw(y * (w + 1)) & 0xff
            var x = 0
            while (x < w) {
              val v = raw(y * (w + 1) + 1 + x) & 0xff
              val left = if (x > 0) recon(y)(x - 1) else 0
              val up = if (y > 0) recon(y - 1)(x) else 0
              val ul = if (x > 0 && y > 0) recon(y - 1)(x - 1) else 0
              val pred = f match {
                case 0 => 0
                case 1 => left
                case 2 => up
                case 3 => (left + up) / 2
                case 4 => paeth(left, up, ul)
                case other => throw new IllegalStateException(s"bad filter $other")
              }
              recon(y)(x) = (v + pred) & 0xff
              x += 1
            }
            y += 1
          }
          var sum = 0L
          for (row <- recon; v <- row) sum += v
          (id, w, h, sum.toDouble / (w.toLong * h), sum)
        }
      }
      .toDF(idCol, "width", "height", "mean_px", "checksum")
  }

  // ---- REAL codec: BMP ----------------------------------------------
  // BMP (24-bit BI_RGB) is a pure byte-layout format — no codec
  // library required — so unlike the stub above, this decode path is
  // genuinely exercised in-sandbox: magic check, little-endian header
  // fields (pixel offset @10, width @18, height @22, bpp @28), 4-byte
  // row stride, bottom-up row order. The synthetic encoder writes
  // pixel(x, y) = (id*31 + 7x + 3y) mod 256 so every decoded statistic
  // has a closed-form oracle.

  /** Scaffolding: a valid 24bpp BMP with the deterministic gradient. */
  def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val size = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var sy = 0
    while (sy < h) {
      val y = h - 1 - sy // bottom-up storage
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 3) % 256).toInt
        b.put(v.toByte).put(v.toByte).put(v.toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < stride) { b.put(0.toByte); pad += 1 }
      sy += 1
    }
    b.array()
  }

  /** (id) -> (id, img: binary) with one encoder per partition. */
  def syntheticBmps(df: org.apache.spark.sql.DataFrame, idCol: String,
                    w: Int, h: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeBmp(id, w, h))))
      .toDF(idCol, "img")
  }

  /** REAL per-partition BMP decode: header parse + red-channel stats.
    * Same mapPartitions batch shape as `decodeBatch` — one decoder per
    * partition, no per-row setup; at 1000 executors each partition
    * decodes its own shard. Returns (id, width, height, n_bytes,
    * mean_px, checksum) where checksum = sum of red-channel bytes. */
  def decodeBmpBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                     blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          require(bytes.length > 54 && bytes(0) == 'B' && bytes(1) == 'M',
            s"not a BMP payload for id=$id")
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val off = bb.getInt(10)
          val w = bb.getInt(18)
          val h = bb.getInt(22)
          val bpp = bb.getShort(28).toInt
          require(bpp == 24, s"unsupported bpp=$bpp")
          val stride = ((w * 3 + 3) / 4) * 4
          var sum = 0L
          var row = 0
          while (row < h) {
            var x = 0
            while (x < w) {
              sum += (bytes(off + row * stride + x * 3 + 2) & 0xff) // red
              x += 1
            }
            row += 1
          }
          (id, w, h, bytes.length.toLong, sum.toDouble / (w.toLong * h), sum)
        }
      }
      .toDF(idCol, "width", "height", "n_bytes", "mean_px", "checksum")
  }

  /** REAL nearest-neighbor downsample: decode 24bpp pixels, sample
    * every (sw/w, sh/h)-th, re-encode a valid BMP. The output is real
    * image BYTES (round-trippable through decodeBmpBatch), not resize
    * metadata — one mapPartitions pass, no shuffle. */
  def resizeBmpBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                     blobCol: String, w: Int, h: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          require(bytes(0) == 'B' && bytes(1) == 'M', s"not a BMP for id=$id")
          val off = bb.getInt(10); val sw = bb.getInt(18); val sh = bb.getInt(22)
          val sStride = ((sw * 3 + 3) / 4) * 4
          val oStride = ((w * 3 + 3) / 4) * 4
          val out = java.nio.ByteBuffer.allocate(54 + oStride * h)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put('B'.toByte).put('M'.toByte).putInt(54 + oStride * h)
            .putInt(0).putInt(54)
          out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
          out.putInt(0).putInt(oStride * h).putInt(2835).putInt(2835)
            .putInt(0).putInt(0)
          var row = 0
          while (row < h) {
            val srow = row * sh / h // storage-order rows map 1:1
            var x = 0
            while (x < w) {
              val sx = x * sw / w
              val p = off + srow * sStride + sx * 3
              out.put(bytes(p)).put(bytes(p + 1)).put(bytes(p + 2))
              x += 1
            }
            var pad = w * 3
            while (pad < oStride) { out.put(0.toByte); pad += 1 }
            row += 1
          }
          (id, out.array())
        }
      }
      .toDF(idCol, blobCol)
  }

  /** REAL feature extraction: decode a 24bpp BMP and mean-pool the red
    * channel over a (w/bs × h/bs) block grid into a flat double vector
    * (row-major over LOGICAL rows — bottom-up storage is re-flipped so
    * the embedding is orientation-stable). The image→vector bridge that
    * feeds the ANN/dedup family. */
  def embedBmpBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                    blobCol: String, bs: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val off = bb.getInt(10); val w = bb.getInt(18); val h = bb.getInt(22)
          val stride = ((w * 3 + 3) / 4) * 4
          val gw = w / bs; val gh = h / bs
          val vec = new Array[Double](gw * gh)
          var by = 0
          while (by < gh) {
            var bx = 0
            while (bx < gw) {
              var sum = 0L
              var dy = 0
              while (dy < bs) {
                val y = by * bs + dy              // logical row
                val srow = h - 1 - y              // bottom-up storage
                var dx = 0
                while (dx < bs) {
                  val x = bx * bs + dx
                  sum += (bytes(off + srow * stride + x * 3 + 2) & 0xff)
                  dx += 1
                }
                dy += 1
              }
              vec(by * gw + bx) = sum.toDouble / (bs * bs)
              bx += 1
            }
            by += 1
          }
          (id, vec)
        }
      }
      .toDF(idCol, "embedding")
  }

  // ---- REAL container: frame sequence ("video") ---------------------
  // A minimal length-prefixed frame container: 'GVID' magic, frame
  // count, then [len][BMP bytes] per frame. Frame sampling — the video
  // operation a training pipeline actually runs — walks the prefixes to
  // the wanted indices and decodes ONLY those frames; the container
  // needs no codec, and the per-frame payloads exercise the real BMP
  // decoder. Frame f's pixels use id*31 + f*17 in the gradient, so each
  // sampled frame has its own closed-form stats.

  def encodeFrames(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val frames = (0 until nFrames).map(f => encodeBmp(id + f * 17, w, h))
    val total = 8 + frames.map(4 + _.length).sum
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GVID".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach { fr => b.putInt(fr.length); b.put(fr) }
    b.array()
  }

  def syntheticVideos(df: org.apache.spark.sql.DataFrame, idCol: String,
                      nFrames: Int, w: Int, h: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeFrames(id, nFrames, w, h))))
      .toDF(idCol, "video")
  }

  /** REAL frame sampling: walk the length prefixes, decode only the
    * requested frame indices, one output row per sampled frame with
    * that frame's red-channel stats. */
  def sampleFramesBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                        blobCol: String, wanted: Seq[Int]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wantedSet = wanted.toSet
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          require(new String(bytes, 0, 4, "US-ASCII") == "GVID",
            s"not a frame container for id=$id")
          val n = bb.getInt(4)
          var off = 8
          (0 until n).flatMap { f =>
            val len = bb.getInt(off)
            val frameOff = off + 4
            off += 4 + len
            if (!wantedSet.contains(f)) None
            else {
              val pixOff = bb.getInt(frameOff + 10)
              val w = bb.getInt(frameOff + 18)
              val h = bb.getInt(frameOff + 22)
              val stride = ((w * 3 + 3) / 4) * 4
              var sum = 0L
              var row = 0
              while (row < h) {
                var x = 0
                while (x < w) {
                  sum += (bytes(frameOff + pixOff + row * stride + x * 3 + 2) & 0xff)
                  x += 1
                }
                row += 1
              }
              Some((id, f, w, h, sum.toDouble / (w.toLong * h), sum))
            }
          }
        }
      }
      .toDF(idCol, "frame", "width", "height", "mean_px", "checksum")
  }

  // ---- REAL codec: WAV/PCM ------------------------------------------
  // RIFF/WAVE with 8-bit mono PCM is the audio analog of BMP: a pure
  // byte-layout container. The decoder does a proper CHUNK WALK (not
  // fixed offsets) — "fmt " for sample_rate/channels/bits, "data" for
  // samples — so files with extra chunks (LIST/INFO) would decode too.
  // Synthetic waveform: sample(t) = (id*13 + 7t) mod 256 (unsigned),
  // giving DC mean and RMS closed-form oracles.

  /** Scaffolding: a valid 44-byte-header WAV with the deterministic
    * waveform (8-bit mono PCM). */
  def encodeWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val size = 44 + nSamples
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(size - 8)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate) // byteRate = rate * 1 ch * 1 byte
    b.putShort(1) // blockAlign
    b.putShort(8) // bits
    b.put("data".getBytes("US-ASCII")).putInt(nSamples)
    var t = 0
    while (t < nSamples) {
      b.put(((id * 13 + t * 7) % 256).toByte)
      t += 1
    }
    b.array()
  }

  def syntheticWavs(df: org.apache.spark.sql.DataFrame, idCol: String,
                    nSamples: Int, sampleRate: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeWav(id, nSamples, sampleRate))))
      .toDF(idCol, "audio")
  }

  /** REAL per-partition WAV decode: RIFF chunk walk + PCM stats.
    * Returns (id, sample_rate, channels, bits, n_samples, dc_mean,
    * rms) — rms over samples centered at the 8-bit midpoint 128. */
  def decodeWavBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                     blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def tag(off: Int): String =
            new String(bytes, off, 4, "US-ASCII")
          require(tag(0) == "RIFF" && tag(8) == "WAVE",
            s"not a WAV payload for id=$id")
          var off = 12
          var rate = -1; var ch = -1; var bits = -1
          var dataOff = -1; var dataLen = -1
          while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
            val cid = tag(off)
            val clen = bb.getInt(off + 4)
            if (cid == "fmt ") {
              rate = bb.getInt(off + 12)
              ch = bb.getShort(off + 10).toInt
              bits = bb.getShort(off + 22).toInt
            } else if (cid == "data") {
              dataOff = off + 8; dataLen = clen
            }
            off += 8 + clen + (clen & 1) // chunks are 2-byte aligned
          }
          require(rate > 0 && dataOff >= 0 && bits == 8 && ch == 1,
            s"unsupported WAV layout for id=$id (rate=$rate bits=$bits ch=$ch)")
          var sum = 0L; var ss = 0L; var i = 0
          while (i < dataLen) {
            val v = bytes(dataOff + i) & 0xff
            sum += v
            val c = v - 128
            ss += c.toLong * c
            i += 1
          }
          (id, rate, ch, bits, dataLen.toLong,
            sum.toDouble / dataLen, math.sqrt(ss.toDouble / dataLen))
        }
      }
      .toDF(idCol, "sample_rate", "channels", "bits", "n_samples",
        "dc_mean", "rms")
  }

  /** shared RIFF walk -> centered 8-bit mono samples (v - 128). */
  private def pcmCentered(id: Long, bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", s"not a WAV payload for id=$id")
    var off = 12
    var bits = -1; var ch = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (bits < 0 || dataOff < 0)) {
      val cid = tag(off)
      val clen = bb.getInt(off + 4)
      if (cid == "fmt ") { ch = bb.getShort(off + 10).toInt; bits = bb.getShort(off + 22).toInt }
      else if (cid == "data") { dataOff = off + 8; dataLen = clen }
      off += 8 + clen + (clen & 1)
    }
    require(bits == 8 && ch == 1 && dataOff >= 0,
      s"unsupported WAV layout for id=$id (bits=$bits ch=$ch)")
    Array.tabulate(dataLen)(i => (bytes(dataOff + i) & 0xff) - 128)
  }

  /** Windowed audio FEATURE EXTRACTION over 8-bit mono PCM: per
    * `win`-sample window — RMS of centered samples, zero-crossing count
    * (adjacent pairs within the window whose signs straddle zero), and
    * peak |sample|. The frame-level descriptor pass an audio-filtering
    * pipeline runs before any model sees the clip (silence/clipping/
    * noisiness gates). Pure integer + one sqrt per window, so the
    * oracle reconstructs the synthetic waveform in SQL exactly.
    * mapPartitions batch shape: decode + features stream one clip at a
    * time, nothing leaves the partition until the tiny feature rows. */
  def audioFeaturesBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                         blobCol: String, win: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val cs = pcmCentered(id, bytes)
          val nWin = (cs.length + win - 1) / win
          (0 until nWin).iterator.map { w =>
            val lo = w * win
            val hi = math.min(lo + win, cs.length)
            var ss = 0L; var zcr = 0L; var peak = 0L
            var i = lo
            while (i < hi) {
              val c = cs(i)
              ss += c.toLong * c
              if (math.abs(c) > peak) peak = math.abs(c)
              if (i > lo && ((cs(i - 1) < 0) != (c < 0))) zcr += 1
              i += 1
            }
            val n = (hi - lo).toLong
            (id, w.toLong, n, math.sqrt(ss.toDouble / n), zcr, peak)
          }
        }
      }
      .toDF(idCol, "win_idx", "n", "rms", "zcr", "peak")
  }

  /** DFT-bin magnitude extraction (spectral features): for each
    * requested bin k, |sum_t c_t * e^{-2 pi i k t / N}| over the whole
    * clip — the tone/hum detector shape (Goertzel computes the same
    * quantity; the direct form keeps the arithmetic order portable so
    * the SQL oracle can reproduce it to within ulps, absorbed by 4dp
    * rounding). Doubles throughout; one pass per (clip, bin). */
  def dftMagnitudeBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                        blobCol: String, bins: Seq[Int]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val cs = pcmCentered(id, bytes)
          val n = cs.length
          bins.iterator.map { k =>
            var re = 0.0; var im = 0.0
            var t = 0
            while (t < n) {
              val ang = 2.0 * math.Pi * k * t / n
              re += cs(t) * math.cos(ang)
              im += cs(t) * math.sin(ang)
              t += 1
            }
            (id, k, math.sqrt(re * re + im * im))
          }
        }
      }
      .toDF(idCol, "bin", "mag")
  }

  /** REAL integer-factor resample (decimation): keep every k-th PCM
    * sample and re-encode a valid WAV at rate/k — real audio BYTES out,
    * round-trippable through decodeWavBatch. (Proper resampling would
    * low-pass first; plain decimation keeps the oracle closed-form and
    * the container/layout path is what's under test.) */
  def resampleWavBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                       blobCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
          require(tag(0) == "RIFF" && tag(8) == "WAVE", s"not a WAV for id=$id")
          var off = 12
          var rate = -1; var dataOff = -1; var dataLen = -1
          while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
            val cid = tag(off); val clen = bb.getInt(off + 4)
            if (cid == "fmt ") rate = bb.getInt(off + 12)
            else if (cid == "data") { dataOff = off + 8; dataLen = clen }
            off += 8 + clen + (clen & 1)
          }
          val nOut = (dataLen + k - 1) / k
          val out = java.nio.ByteBuffer.allocate(44 + nOut)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nOut)
          out.put("WAVE".getBytes("US-ASCII"))
          out.put("fmt ".getBytes("US-ASCII")).putInt(16)
          out.putShort(1).putShort(1).putInt(rate / k).putInt(rate / k)
          out.putShort(1).putShort(8)
          out.put("data".getBytes("US-ASCII")).putInt(nOut)
          var i = 0
          while (i < dataLen) { out.put(bytes(dataOff + i)); i += k }
          (id, out.array())
        }
      }
      .toDF(idCol, blobCol)
  }

  /** Per-partition imperative decode (the mapPartitions escape hatch a
    * real codec needs — one codec instance per partition, streaming
    * batches, no per-row JNI setup). The "codec" here is the same
    * deterministic stub; the partition/batch plumbing is the real
    * pattern. Input column must be BINARY. */
  def decodeBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                  blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init happens here (stub: plain function)
        def decode(b: Array[Byte]): (String, Int, Int, Long) = {
          val fmt = new String(b.take(4), "UTF-8")
          val n = b.length.toLong
          (fmt, (n * 7 % 1920).toInt + 1, (n * 13 % 1080).toInt + 1, n)
        }
        it.map { case (id, blob) =>
          val (fmt, w, h, n) = decode(blob)
          (id, fmt, w, h, n)
        }
      }
      .toDF(idCol, "format", "width", "height", "n_bytes")
  }

  // ---- REAL codec: GIF (LZW) ----------------------------------------
  // GIF89a with a 256-entry grayscale global color table and REAL LZW:
  // the decoder implements the full variable-width LZW algorithm
  // (dictionary growth, the code==dictSize self-reference case, width
  // bumps at 2^w, clear-code resets) from the public GIF89a spec; the
  // encoder uses the classic "uncompressed GIF" literal-code stream
  // (valid LZW the decoder's dictionary still grows through, with
  // clear codes before the 12-bit ceiling). Pixels are the
  // deterministic pattern v = (id*7 + 3x + 5y) mod 256, giving
  // closed-form SQL oracles; GifCodecSpec round-trips the bytes
  // through javax.imageio's independent GIF reader pixel-for-pixel.

  /** variable-width LSB-first LZW decode of concatenated GIF image
    * data, stopping after `expected` pixels. */
  private[graft] def lzwDecode(minCodeSize: Int, data: Array[Byte],
                               expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < clear) { dict(i) = Array(i.toByte); i += 1 }
    var dictSize = end + 1
    var codeSize = minCodeSize + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitPos = 0
    def nextCode(): Int = {
      var v = 0
      var k = 0
      while (k < codeSize) {
        val byteI = (bitPos + k) >> 3
        if (byteI >= data.length) return end
        v |= (((data(byteI) >> ((bitPos + k) & 7)) & 1) << k)
        k += 1
      }
      bitPos += codeSize
      v
    }
    var prev: Array[Byte] = null
    var done = false
    while (!done && out.size < expected) {
      val code = nextCode()
      if (code == clear) { dictSize = end + 1; codeSize = minCodeSize + 1; prev = null }
      else if (code == end) done = true
      else {
        val entry =
          if (code < dictSize && code < clear) dict(code)
          else if (code < dictSize && dict(code) != null) dict(code)
          else if (code == dictSize && prev != null) prev :+ prev(0)
          else throw new IllegalStateException(s"bad LZW code $code (dict $dictSize)")
        out.write(entry, 0, entry.length)
        if (prev != null && dictSize < 4096) {
          dict(dictSize) = prev :+ entry(0)
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = entry
      }
    }
    out.toByteArray
  }

  /** literal-code LZW encode (the valid "uncompressed" stream): the
    * DECODER's dictionary still grows one entry per emitted code, so
    * the encoder mirrors that growth to keep code widths in sync and
    * clears before the 12-bit ceiling. */
  private def lzwEncodeLiterals(minCodeSize: Int, pixels: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      cur |= code << curBits
      curBits += codeSize
      while (curBits >= 8) {
        out.write(cur & 0xff)
        cur >>= 8
        curBits -= 8
      }
    }
    var dictSize = end + 1
    emit(clear)
    var sinceClear = 0
    var i = 0
    while (i < pixels.length) {
      emit(pixels(i) & 0xff)
      if (sinceClear > 0) {
        dictSize += 1
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      sinceClear += 1
      if (dictSize >= 4094) {
        emit(clear)
        dictSize = end + 1
        codeSize = minCodeSize + 1
        sinceClear = 0
      }
      i += 1
    }
    emit(end)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** Scaffolding: a valid GIF89a (grayscale palette, no interlace)
    * with pixel(x, y) = (id*7 + 3x + 5y) mod 256. */
  def encodeGif(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // global table, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0)    // no local table, no interlace
    out.write(8)    // LZW min code size
    val pixels = Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      ((id * 7 + 3 * x + 5 * y) % 256).toByte
    }
    val lzw = lzwEncodeLiterals(8, pixels)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  def syntheticGifs(df: org.apache.spark.sql.DataFrame, idCol: String,
                    w: Int, h: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeGif(id, w, h))))
      .toDF(idCol, "img")
  }

  /** REAL GIF decode: header + screen descriptor + palette walk,
    * extension-block skipping, sub-block reassembly, full LZW decode.
    * Returns gray pixel values (palette is grayscale by construction;
    * a color palette would return indices mapped through it the same
    * way). */
  private[graft] def decodeGif(id: Long, bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(new String(bytes, 0, 6, "US-ASCII").startsWith("GIF"),
      s"not a GIF payload for id=$id")
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    var off = 6
    off += 4 // screen w/h
    val packed = bytes(off) & 0xff
    off += 3
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    val palette = Array.tabulate(gctSize)(i => bytes(off + 3 * i) & 0xff)
    off += 3 * gctSize
    // walk blocks to the first image descriptor, skipping extensions
    while ((bytes(off) & 0xff) == 0x21) {
      off += 2 // introducer + label
      while ((bytes(off) & 0xff) != 0) off += 1 + (bytes(off) & 0xff)
      off += 1
    }
    require((bytes(off) & 0xff) == 0x2C, s"no image descriptor for id=$id")
    val w = u16(off + 5); val h = u16(off + 7)
    val ipacked = bytes(off + 9) & 0xff
    require((ipacked & 0x40) == 0, s"interlaced GIF unsupported for id=$id")
    off += 10
    val minCode = bytes(off) & 0xff
    off += 1
    val data = new java.io.ByteArrayOutputStream()
    while ((bytes(off) & 0xff) != 0) {
      val n = bytes(off) & 0xff
      data.write(bytes, off + 1, n)
      off += 1 + n
    }
    val idx = lzwDecode(minCode, data.toByteArray, w * h)
    require(idx.length == w * h, s"LZW underrun for id=$id: ${idx.length} of ${w * h}")
    (w, h, idx.map(b => palette(b & 0xff)))
  }

  /** batch GIF decode -> per-image integer pixel stats (n, sum, min,
    * max, and a position-weighted checksum) so the oracle can rebuild
    * the pattern in closed form. */
  def decodeGifBatch(df: org.apache.spark.sql.DataFrame, idCol: String,
                     blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, px) = decodeGif(id, bytes)
          var sum = 0L; var mn = 256L; var mx = -1L; var chk = 0L
          var i = 0
          while (i < px.length) {
            val v = px(i).toLong
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            chk += (i + 1) * v
            i += 1
          }
          (id, w, h, px.length.toLong, sum, mn, mx, chk)
        }
      }
      .toDF(idCol, "w", "h", "n_px", "sum_v", "mn_v", "mx_v", "chk")
  }
}
