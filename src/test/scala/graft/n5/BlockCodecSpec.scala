package graft.n5

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests against the reference fixture
  * `/root/reference/data/test.n5/mri/c0/s0` (4 gzip blocks). Expected
  * values were computed INDEPENDENTLY of this codec (python gzip+struct
  * decode of the raw block files):
  *   block (0,0,0): shape 128x128x27, sum 18077459
  *   block (0,1,0): shape 128x98x27,  sum 13598034
  *   block (1,0,0): shape 58x128x27,  sum 5266225
  *   block (1,1,0): shape 58x98x27,   sum 3843199
  *   total elements 1134972 (= 186*226*27), sum 40784917, min 0, max 255
  */
class BlockCodecSpec extends AnyFunSuite {

  private val fixtureRoot = "/root/reference/data/test.n5"
  private val fixtureDs = "mri/c0/s0"

  private val golden = Map(
    (0, 0, 0) -> (Array(128, 128, 27), 18077459L),
    (0, 1, 0) -> (Array(128, 98, 27), 13598034L),
    (1, 0, 0) -> (Array(58, 128, 27), 5266225L),
    (1, 1, 0) -> (Array(58, 98, 27), 3843199L))

  test("attrs parse matches the fixture attributes.json") {
    val a = N5Meta.datasetAttributes(fixtureRoot, fixtureDs)
    assert(a.dimensions.toSeq == Seq(186L, 226L, 27L))
    assert(a.blockSize.toSeq == Seq(128, 128, 128))
    assert(a.dataType == Dtype.UInt8)
    assert(a.compression.codec == "gzip")
    assert(a.gridDims.toSeq == Seq(2, 2, 1))
    assert(a.blockShape(Array(1, 1, 0)).toSeq == Seq(58, 98, 27))
    assert(a.extra.contains("pixelResolution"))
  }

  test("decode matches independent golden values for all 4 fixture blocks") {
    val a = N5Meta.datasetAttributes(fixtureRoot, fixtureDs)
    var total = 0L
    var count = 0L
    golden.foreach { case ((gx, gy, gz), (shape, sum)) =>
      val raw = Files.readAllBytes(
        Paths.get(fixtureRoot, fixtureDs, s"$gx/$gy/$gz"))
      val dec = BlockCodec.decode(raw, a.dataType, a.compression)
      assert(dec.shape.toSeq == shape.toSeq, s"block $gx/$gy/$gz shape")
      assert(dec.longs.sum == sum, s"block $gx/$gy/$gz sum")
      assert(dec.longs.forall(v => v >= 0 && v <= 255), "uint8 range")
      total += dec.longs.sum
      count += dec.numElements
    }
    assert(count == 1134972L)
    assert(total == 40784917L)
  }

  test("encode/decode round-trips across dtypes and codecs") {
    val shapes = Seq(Array(4, 3, 2), Array(1, 1, 1), Array(7, 5, 3))
    val rng = new scala.util.Random(42)
    for {
      comp <- Seq(Compression("gzip"), Compression("raw"),
        Compression("zlib"), Compression("bzip2", 9),
        Compression("lz4", 65536), Compression("zstd", 3),
        Compression("xz", 6))
      shape <- shapes
      dtype <- Seq(Dtype.UInt8, Dtype.UInt16, Dtype.Int32, Dtype.Int64)
    } {
      val n = shape.product
      val max = dtype match {
        case Dtype.UInt8 => 256L
        case Dtype.UInt16 => 65536L
        case _ => 1000000L
      }
      val vals = Array.fill(n)(math.abs(rng.nextLong()) % max)
      val enc = BlockCodec.encode(shape, vals, null, dtype, comp)
      val dec = BlockCodec.decode(enc, dtype, comp)
      assert(dec.shape.toSeq == shape.toSeq)
      assert(dec.longs.toSeq == vals.toSeq, s"$dtype/$comp")
    }
    // float dtypes
    for (dtype <- Seq(Dtype.Float32, Dtype.Float64)) {
      val shape = Array(5, 4, 3)
      val vals = Array.fill(shape.product)(
        if (dtype == Dtype.Float32) rng.nextFloat().toDouble else rng.nextDouble())
      val enc = BlockCodec.encode(shape, null, vals, dtype, Compression("gzip"))
      val dec = BlockCodec.decode(enc, dtype, Compression("gzip"))
      assert(dec.doubles.toSeq == vals.toSeq, dtype.toString)
    }
  }

  test("encode rejects out-of-range values instead of wrapping") {
    // 300 fits the block table's SMALLINT element schema but not uint8 —
    // the old mask would write 300 & 0xff = 44 silently
    val ex = intercept[IllegalArgumentException] {
      BlockCodec.encode(Array(2, 1, 1), Array(300L, 1L), null,
        Dtype.UInt8, Compression("raw"))
    }
    assert(ex.getMessage.contains("outside uint8 range"))
    intercept[IllegalArgumentException] {
      BlockCodec.encode(Array(1, 1, 1), Array(-1L), null,
        Dtype.UInt16, Compression("raw"))
    }
  }

  test("legacy attrs: gzip useZlib=true and v1 compressionType parse correctly") {
    val tmp = java.nio.file.Files.createTempDirectory("legacyattrs")
    // n5-java gzip with useZlib=true -> raw zlib deflate wire format
    java.nio.file.Files.createDirectories(tmp.resolve("a"))
    java.nio.file.Files.writeString(tmp.resolve("a/attributes.json"),
      """{"dimensions":[4,4,1],"blockSize":[4,4,1],"dataType":"uint8",
        |"compression":{"type":"gzip","useZlib":true,"level":-1}}""".stripMargin)
    val a = N5Meta.datasetAttributes(tmp.toString, "a")
    assert(a.compression.codec == "zlib")
    // and the wire format round-trips: zlib-encoded block decodes with it
    val vals = Array.tabulate(16)(_.toLong)
    val enc = BlockCodec.encode(Array(4, 4, 1), vals, null, Dtype.UInt8,
      a.compression)
    assert(BlockCodec.decode(enc, Dtype.UInt8, a.compression).longs.toSeq
      == vals.toSeq)
    // writing it back re-emits the n5-java terms
    N5Meta.writeDatasetAttributes(tmp.toString, "a2", a)
    val j = N5Meta.readJson(new org.apache.hadoop.fs.Path(tmp.toString,
      "a2/attributes.json"))
    assert(j.get("compression").get("type").asText() == "gzip")
    assert(j.get("compression").get("useZlib").asBoolean())
    // legacy n5 v1.x string attribute: must not silently read as raw
    java.nio.file.Files.createDirectories(tmp.resolve("b"))
    java.nio.file.Files.writeString(tmp.resolve("b/attributes.json"),
      """{"dimensions":[4,4,1],"blockSize":[4,4,1],"dataType":"uint8",
        |"compressionType":"gzip"}""".stripMargin)
    val b = N5Meta.datasetAttributes(tmp.toString, "b")
    assert(b.compression.codec == "gzip")
    assert(!b.extra.contains("compressionType"))
  }

  test("fixture block encode round-trip is byte-faithful") {
    val a = N5Meta.datasetAttributes(fixtureRoot, fixtureDs)
    val raw = Files.readAllBytes(Paths.get(fixtureRoot, fixtureDs, "1/1/0"))
    val dec = BlockCodec.decode(raw, a.dataType, a.compression)
    val enc = BlockCodec.encode(dec.shape, dec.longs, null, a.dataType,
      a.compression)
    val dec2 = BlockCodec.decode(enc, a.dataType, a.compression)
    assert(dec2.shape.toSeq == dec.shape.toSeq)
    assert(dec2.longs.toSeq == dec.longs.toSeq)
  }

  /** Hand-build a mode-1 (varlength) block: big-endian uint16 mode=1,
    * uint16 ndim, ndim×uint32 dims, uint32 numElements, payload.
    */
  private def mode1Block(
      shape: Array[Int], count: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(4 + 4 * shape.length + 4 + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(1.toShort).putShort(shape.length.toShort)
    shape.foreach(bb.putInt)
    bb.putInt(count)
    bb.put(payload)
    bb.array()
  }

  test("varlength (mode 1) blocks decode with their own element count") {
    val shape = Array(4, 3, 1)
    val vals = Array.tabulate(12)(i => (i * 7 % 256).toLong)
    // full-count varlength block (the common real case: label volumes
    // written mode-1 but carrying shape.product elements), raw codec
    val full = BlockCodec.decode(
      mode1Block(shape, 12, vals.map(_.toByte)), Dtype.UInt8, Compression("raw"))
    assert(full.shape.toSeq == shape.toSeq)
    assert(full.elementCount == 12 && full.numElements == 12)
    assert(full.longs.toSeq == vals.toSeq)
    // short varlength block: decodes exactly `count` elements — the
    // element view layers its own fail-loud check on top
    val short = BlockCodec.decode(
      mode1Block(shape, 5, vals.take(5).map(_.toByte)),
      Dtype.UInt8, Compression("raw"))
    assert(short.elementCount == 5 && short.numElements == 12)
    assert(short.longs.toSeq == vals.take(5).toSeq)
    // the payload rides the same codec pipeline: gzip'd mode-1, uint16
    val u16 = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vals.foreach(v => u16.putShort(v.toShort))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(u16.array()); gz.close()
    val dec16 = BlockCodec.decode(
      mode1Block(shape, 12, bos.toByteArray), Dtype.UInt16, Compression("gzip"))
    assert(dec16.longs.toSeq == vals.toSeq)
    // mode 2 (object) stays a loud rejection
    val m2 = mode1Block(shape, 12, vals.map(_.toByte))
    m2(1) = 2.toByte
    val ex = intercept[IllegalArgumentException] {
      BlockCodec.decode(m2, Dtype.UInt8, Compression("raw"))
    }
    assert(ex.getMessage.contains("unsupported N5 block mode: 2"))
  }

  // ------------------------------------------------------------------
  // blosc (read-only): chunks are built here by a test-side encoder that
  // follows the public c-blosc 1.x container spec (README_HEADER.rst) —
  // 16-byte header, per-block offset table, per-block split streams each
  // prefixed with its LE int32 csize (csize == stream size ⇒ stored raw),
  // byte-shuffle applied per block before compression. numcodecs is not
  // installable in this container (zero egress), so spec-conformance of
  // the golden bytes is by construction, not by c-blosc itself.

  private def bloscLe32(bb: java.nio.ByteBuffer, v: Int): Unit = {
    bb.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
      .put(((v >> 16) & 0xff).toByte).put(((v >> 24) & 0xff).toByte)
    ()
  }

  /** c-blosc byte shuffle (inverse of BloscCodec.unshuffle): whole
    * elements transposed into typesize byte lanes, tail verbatim.
    */
  private def bloscShuffle(b: Array[Byte], typesize: Int): Array[Byte] = {
    val elems = b.length / typesize
    val out = new Array[Byte](b.length)
    for (i <- 0 until elems; t <- 0 until typesize)
      out(t * elems + i) = b(i * typesize + t)
    val whole = elems * typesize
    System.arraycopy(b, whole, out, whole, b.length - whole)
    out
  }

  /** Minimal greedy blosclz compressor emitting the documented token
    * forms (literal runs ≤ 32, near matches with 13-bit offsets and
    * 255-chained length extension). Valid by the same public format the
    * decoder implements — round-trip consistency, not c-blosc interop
    * (see the BloscCodec class doc's validation note); the hand-built
    * token-stream test below pins the decoder against fixed bytes
    * instead.
    */
  private def blosclzTestCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var litStart = 0
    def flushLits(until: Int): Unit = {
      var p = litStart
      while (p < until) {
        val run = math.min(32, until - p)
        out.write(run - 1)
        out.write(data, p, run)
        p += run
      }
      litStart = until
    }
    var i = 0
    while (i < data.length) {
      // longest match ≥ 3 within the near window (dist ≤ 8191; d ≤ 8190
      // so the saturated far-escape byte pair can never appear)
      var bestLen = 0
      var bestDist = 0
      val lo = math.max(0, i - 8190)
      var s = lo
      while (s < i) {
        var l = 0
        while (i + l < data.length && data(s + l) == data(i + l) && l < 1000) l += 1
        if (l > bestLen) { bestLen = l; bestDist = i - s }
        s += 1
      }
      if (bestLen >= 3 && i > 0) {
        flushLits(i)
        val d = bestDist - 1
        val tok = math.min(bestLen - 2, 7)
        out.write((tok << 5) | (d >> 8))
        if (tok == 7) {
          var rem = bestLen - 9
          while (rem >= 255) { out.write(255); rem -= 255 }
          out.write(rem)
        }
        out.write(d & 0xff)
        i += bestLen
        litStart = i
      } else i += 1
    }
    flushLits(data.length)
    out.toByteArray
  }

  private def bloscCompress(code: Int, data: Array[Byte]): Array[Byte] =
    code match {
      case 0 => blosclzTestCompress(data)
      case 1 => // lz4 raw block
        val c = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().fastCompressor()
        val out = new Array[Byte](c.maxCompressedLength(data.length))
        java.util.Arrays.copyOf(out, c.compress(data, 0, data.length, out, 0))
      case 3 => // zlib stream
        val d = new java.util.zip.Deflater()
        d.setInput(data); d.finish()
        val out = new Array[Byte](data.length * 2 + 64)
        val n = d.deflate(out); d.end()
        java.util.Arrays.copyOf(out, n)
      case 2 => org.xerial.snappy.Snappy.compress(data) // raw snappy block
      case 4 => com.github.luben.zstd.Zstd.compress(data, 3)
      case c => fail(s"test encoder: no codec $c")
    }

  /** Build one blosc1 chunk over `data`. `split` > 1 divides each block
    * into that many streams (the c-blosc lz4/blosclz regime).
    */
  private def bloscChunk(
      data: Array[Byte], typesize: Int, blocksize: Int,
      code: Int, shuffle: Boolean, split: Int,
      memcpy: Boolean = false, forceRawSplits: Boolean = false,
      bitshuffle: Boolean = false): Array[Byte] = {
    val flags = (code << 5) | (if (shuffle) 1 else 0) |
      (if (memcpy) 2 else 0) | (if (bitshuffle) 4 else 0)
    def header(cbytes: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + body.length)
      bb.put(2.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
      bloscLe32(bb, data.length); bloscLe32(bb, blocksize)
      bloscLe32(bb, cbytes); bb.put(body)
      bb.array()
    }
    if (memcpy) return header(data.length + 16, data)
    val nblocks = (data.length + blocksize - 1) / blocksize
    val blocks = (0 until nblocks).map { j =>
      val bs = math.min(blocksize, data.length - j * blocksize)
      val block = java.util.Arrays.copyOfRange(data, j * blocksize, j * blocksize + bs)
      val shuffled =
        if (bitshuffle) BloscCodec.bitShuffle(block, typesize)
        else if (shuffle && typesize > 1) bloscShuffle(block, typesize)
        else block
      val ns = if (bs % split == 0) split else 1
      val streamSize = shuffled.length / ns
      val bb = new java.io.ByteArrayOutputStream()
      for (s <- 0 until ns) {
        val stream = java.util.Arrays.copyOfRange(
          shuffled, s * streamSize, (s + 1) * streamSize)
        val comp = if (forceRawSplits) stream else bloscCompress(code, stream)
        val stored = if (comp.length >= streamSize) stream else comp
        val lb = java.nio.ByteBuffer.allocate(4)
        bloscLe32(lb, stored.length)
        bb.write(lb.array()); bb.write(stored)
      }
      bb.toByteArray
    }
    val bstartsLen = 4 * nblocks
    val offsets = blocks.scanLeft(16 + bstartsLen)(_ + _.length)
    val body = java.nio.ByteBuffer.allocate(bstartsLen + blocks.map(_.length).sum)
    offsets.take(nblocks).foreach(bloscLe32(body, _))
    blocks.foreach(body.put)
    header(16 + bstartsLen + blocks.map(_.length).sum, body.array())
  }

  test("blosc chunks decode: memcpy, lz4+shuffle split, zlib, zstd, raw splits") {
    val rng = new scala.util.Random(7)
    // compressible uint16-ish payload, > 1 internal block
    val data = Array.tabulate(4096)(i => ((i / 7) % 251).toByte)
    // memcpy'ed chunk (incompressible path)
    val rnd = Array.fill(512)(rng.nextInt().toByte)
    assert(BloscCodec.decode(bloscChunk(rnd, 4, 256, 1, shuffle = false,
      split = 1, memcpy = true), 0, rnd.length).toSeq == rnd.toSeq)
    // lz4, byte-shuffle, typesize-way split, 2 internal blocks — the
    // numcodecs Blosc(cname='lz4', shuffle=SHUFFLE) shape
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 1, shuffle = true,
      split = 2), 0, data.length).toSeq == data.toSeq)
    // lz4 unsplit (the NEVER_SPLIT side of the forward-compat rule):
    // the adaptive parser must accept this too
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 1, shuffle = true,
      split = 1), 0, data.length).toSeq == data.toSeq)
    // zlib, no shuffle, single stream (c-blosc never splits zlib)
    assert(BloscCodec.decode(bloscChunk(data, 2, 4096, 3, shuffle = false,
      split = 1), 0, data.length).toSeq == data.toSeq)
    // zstd + shuffle, typesize 8, 4 blocks
    assert(BloscCodec.decode(bloscChunk(data, 8, 1024, 4, shuffle = true,
      split = 1), 0, data.length).toSeq == data.toSeq)
    // stored-raw splits (csize == stream size) inside a compressed chunk
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 1, shuffle = false,
      split = 2, forceRawSplits = true), 0, data.length).toSeq == data.toSeq)
    // leftover last block (nbytes not a multiple of blocksize)
    val odd = data.take(3000)
    assert(BloscCodec.decode(bloscChunk(odd, 2, 1024, 1, shuffle = true,
      split = 2), 0, odd.length).toSeq == odd.toSeq)
  }

  test("blosc rides the N5 block path and unsupported variants fail loudly") {
    // a full N5 block whose payload is a blosc chunk: header + chunk
    val shape = Array(8, 8, 4)
    val vals = Array.tabulate(shape.product)(i => ((i * 11) % 251).toLong)
    val payload = java.nio.ByteBuffer.allocate(shape.product * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vals.foreach(v => payload.putShort(v.toShort))
    val chunk = bloscChunk(payload.array(), 2, 256, 1, shuffle = true, split = 2)
    val bb = java.nio.ByteBuffer.allocate(4 + 12 + chunk.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0.toShort).putShort(3.toShort)
    shape.foreach(bb.putInt); bb.put(chunk)
    val dec = BlockCodec.decode(bb.array(), Dtype.UInt16, Compression("blosc"))
    assert(dec.shape.toSeq == shape.toSeq)
    assert(dec.longs.toSeq == vals.toSeq)
    // attrs parse: numcodecs-style blosc compression object reads as the
    // read-only blosc codec...
    val tmp = java.nio.file.Files.createTempDirectory("bloscattrs")
    java.nio.file.Files.createDirectories(tmp.resolve("a"))
    java.nio.file.Files.writeString(tmp.resolve("a/attributes.json"),
      """{"dimensions":[8,8,4],"blockSize":[8,8,4],"dataType":"uint16",
        |"compression":{"type":"blosc","cname":"lz4","clevel":5,
        |"shuffle":1,"blocksize":0}}""".stripMargin)
    val a = N5Meta.datasetAttributes(tmp.toString, "a")
    assert(a.compression.codec == "blosc")
    // ...and (r12 late) blosc WRITES land through the heuristic-free
    // typesize-1/no-shuffle/lz4 profile: a full encode -> decode round
    // trip through the N5 block framing preserves every voxel
    val vals2 = (0 until 512).map(i => ((i * 37) % 251).toLong).toArray
    val rt = BlockCodec.decode(
      BlockCodec.encode(Array(8, 8, 8), vals2, null, Dtype.UInt16,
        Compression("blosc")),
      Dtype.UInt16, Compression("blosc"))
    assert(rt.longs.toSeq == vals2.toSeq)
    // the chunk itself is parseable standalone, single stream, lz4 flags
    val chunk2 = BloscCodec.encode(Array.tabulate(1000)(i => (i % 7).toByte))
    assert((chunk2(2) & 0xff) == 0x20 && (chunk2(3) & 0xff) == 1,
      "encode must emit the lz4/no-shuffle/typesize-1 profile")
    assert(BloscCodec.decode(chunk2, 0, 1000).toSeq ==
      Array.tabulate(1000)(i => (i % 7).toByte).toSeq)
    // incompressible payload falls back to the stored-stream form
    val rnd = new scala.util.Random(11)
    val noise = Array.fill(777)(rnd.nextInt().toByte)
    assert(BloscCodec.decode(BloscCodec.encode(noise), 0, 777).toSeq ==
      noise.toSeq)
    // an unknown inner-codec code (5-7 are unassigned in blosc1) fails
    // loudly; all five assigned codecs decode since r13
    val unknown = bloscChunk(payload.array(), 2, 256, 1, shuffle = false, split = 1)
    unknown(2) = ((5 << 5) & 0xff).toByte
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decode(unknown, 0, payload.array().length)
    }.getMessage.contains("not supported"))
    // nbytes mismatch against the dtype-derived payload size
    assert(intercept[IllegalArgumentException] {
      BloscCodec.decode(chunk, 0, payload.array().length - 2)
    }.getMessage.contains("nbytes"))
  }

  test("blosclz decodes fixed hand-built token streams (r13)") {
    def dec(stream: Array[Int], outLen: Int): Seq[Byte] = {
      val src = stream.map(_.toByte)
      val dst = new Array[Byte](outLen)
      BloscCodec.blosclzDecompress(src, 0, src.length, dst, 0, outLen)
      dst.toSeq
    }
    // pure literal run: ctrl 4 → 5 bytes
    assert(dec(Array(0x04, 10, 20, 30, 40, 50), 5) ==
      Seq[Byte](10, 20, 30, 40, 50))
    // literals "abc" then a len-3 match at distance 3 → "abcabc"
    // (match token: len tok 1 = (1<<5), low offset byte 2 → dist 3)
    assert(dec(Array(0x02, 'a', 'b', 'c', 0x20, 0x02), 6) ==
      "abcabc".getBytes.toSeq)
    // RLE self-extension: one literal 'x', match dist 1 len 10
    // (tok 7 → 0xE0, extension 1 → len 6+1+3, low offset 0 → dist 1)
    assert(dec(Array(0x00, 'x', 0xE0, 0x01, 0x00), 11) ==
      Seq.fill(11)('x'.toByte))
    // 255-chained extension: len 6+255+36+3 = 300 of 'y'
    assert(dec(Array(0x00, 'y', 0xE0, 0xFF, 36, 0x00), 301) ==
      Seq.fill(301)('y'.toByte))
    // far-offset escape: build > 8192 bytes of history via RLE, then a
    // len-3 match at distance 8193 (saturated near pair 31<<8|255,
    // 16-bit far offset 1 → dist 1 + 8191 + 1)
    val n = 8200
    val rem = n - 1 - 9 // RLE match len = n-1: tok 7, extension chain
    val ext = Array.fill(rem / 255)(255) :+ (rem % 255)
    val farStream =
      Array(0x00, 'z') ++ Array(0xE0) ++ ext ++ Array(0x00) ++
        Array(0x3F, 0xFF, 0x00, 0x01) // (1<<5)|31, low 255, far 0x0001
    val out = dec(farStream, n + 3)
    assert(out.take(n) == Seq.fill(n)('z'.toByte))
    assert(out.drop(n) == Seq.fill(3)('z'.toByte)) // ref is all-'z' history
    // a truncated stream dies loudly instead of under-filling
    assert(intercept[IllegalArgumentException] {
      dec(Array(0x04, 1, 2), 5)
    }.getMessage.contains("literal run overruns input"))
    // a stream decoding short of dstLen dies loudly
    assert(intercept[IllegalArgumentException] {
      dec(Array(0x01, 1, 2), 5)
    }.getMessage.contains("want 5"))
  }

  test("bitshuffle kernels: hand vectors, inverse property, tails (r13)") {
    // typesize 1, 8 elements: plane k = bit k of each byte, LSB-first
    val one = new Array[Byte](8); one(0) = 0x01
    assert(BloscCodec.bitShuffle(one, 1).toSeq ==
      (Seq[Byte](0x01) ++ Seq.fill(7)(0.toByte)))
    val twos = Array.fill(8)(0x02.toByte) // bit 1 set in all 8 elements
    val twosShuf = BloscCodec.bitShuffle(twos, 1)
    assert(twosShuf(1) == 0xFF.toByte &&
      twosShuf.zipWithIndex.count(_._1 != 0) == 1)
    // typesize 2: byte-0 planes (p = 0..7) then byte-1 planes (8..15)
    val u16 = new Array[Byte](16)
    for (e <- 0 until 8) u16(e * 2) = 0xFF.toByte // byte 0 all-ones
    val u16Shuf = BloscCodec.bitShuffle(u16, 2)
    assert(u16Shuf.take(8).forall(_ == 0xFF.toByte) &&
      u16Shuf.drop(8).forall(_ == 0), "byte-0 bit planes come first")
    // inverse property across typesizes, incl. non-multiple-of-8 tails
    val rng = new scala.util.Random(13)
    for (ts <- Seq(1, 2, 4, 7, 8); len <- Seq(ts * 8, ts * 64, ts * 64 + 5,
        ts * 67, 3)) {
      val data = Array.fill(len)(rng.nextInt().toByte)
      val rt = BloscCodec.bitUnshuffle(BloscCodec.bitShuffle(data, ts), ts)
      assert(rt.toSeq == data.toSeq, s"typesize $ts len $len")
    }
    // the tail beyond the multiple-of-8 element prefix is verbatim
    val tailed = Array.tabulate(21)(_.toByte) // typesize 2: 10 elems → 8 shuffled
    val shuf = BloscCodec.bitShuffle(tailed, 2)
    assert(shuf.slice(16, 21).toSeq == tailed.slice(16, 21).toSeq)
  }

  test("bitshuffle kernels match an INDEPENDENT implementation's fixture " +
      "(r14, ADVICE r13: numpy unpackbits/transpose/packbits — no shared " +
      "code with the Scala loops; tools/gen_bitshuffle_fixture.py)") {
    val dir = Paths.get("fixtures/bitshuffle")
    val input = Files.readAllBytes(dir.resolve("input.bin"))
    assert(input.length == 1021) // prime: every typesize has a verbatim tail
    for (ts <- Seq(1, 2, 4, 8)) {
      val expected = Files.readAllBytes(dir.resolve(s"shuffled_ts$ts.bin"))
      assert(BloscCodec.bitShuffle(input, ts).toSeq == expected.toSeq,
        s"forward bitshuffle diverges from the independent fixture at " +
          s"typesize $ts")
      assert(BloscCodec.bitUnshuffle(expected, ts).toSeq == input.toSeq,
        s"bitUnshuffle of the independent fixture does not recover the " +
          s"input at typesize $ts")
    }
  }

  test("blosclz and bit-shuffled blosc chunks decode end-to-end (r13)") {
    val data = Array.tabulate(4096)(i => ((i / 7) % 251).toByte)
    // blosclz, no shuffle, split (c-blosc splits blosclz like lz4)
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 0, shuffle = false,
      split = 2), 0, data.length).toSeq == data.toSeq)
    // blosclz + byte-shuffle, 2 internal blocks, unsplit fallback
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 0, shuffle = true,
      split = 1), 0, data.length).toSeq == data.toSeq)
    // blosclz + BIT-shuffle — zarr's Blosc(cname='blosclz',
    // shuffle=BITSHUFFLE) shape; also exercises leftover elements
    val odd = data.take(3000)
    assert(BloscCodec.decode(bloscChunk(odd, 4, 1024, 0, shuffle = false,
      split = 1, bitshuffle = true), 0, odd.length).toSeq == odd.toSeq)
    // lz4 + bit-shuffle, typesize-way split
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 1, shuffle = false,
      split = 2, bitshuffle = true), 0, data.length).toSeq == data.toSeq)
    // zstd + bit-shuffle at typesize 1 (bitshuffle is NOT identity there)
    assert(BloscCodec.decode(bloscChunk(data, 1, 4096, 4, shuffle = false,
      split = 1, bitshuffle = true), 0, data.length).toSeq == data.toSeq)
    // snappy raw-block inner streams (numcodecs Blosc(cname='snappy')),
    // with byte-shuffle, 2 internal blocks
    assert(BloscCodec.decode(bloscChunk(data, 2, 2048, 2, shuffle = true,
      split = 1), 0, data.length).toSeq == data.toSeq)
    // blosclz through the full N5 block framing
    val shape = Array(8, 8, 4)
    val vals = Array.tabulate(shape.product)(i => ((i * 11) % 251).toLong)
    val payload = java.nio.ByteBuffer.allocate(shape.product * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    vals.foreach(v => payload.putShort(v.toShort))
    val chunk = bloscChunk(payload.array(), 2, 256, 0, shuffle = false,
      split = 1, bitshuffle = true)
    val bb = java.nio.ByteBuffer.allocate(4 + 12 + chunk.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putShort(0.toShort).putShort(3.toShort)
    shape.foreach(bb.putInt); bb.put(chunk)
    val dec = BlockCodec.decode(bb.array(), Dtype.UInt16, Compression("blosc"))
    assert(dec.longs.toSeq == vals.toSeq)
  }

  test("blosclz round-trips seeded random + adversarial payloads (r13)") {
    // property sweep over payload classes a compressor actually meets:
    // pure noise (all-literal streams), long runs (RLE matches + chained
    // length extensions), periodic data (short-distance matches), and
    // mixed segments — every token form the decoder implements gets hit,
    // and the stream/byte-count validation must hold on each
    val rng = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] =
      Seq(
        Array.emptyByteArray,
        Array[Byte](7),
        Array.fill(5000)(rng.nextInt().toByte), // incompressible
        Array.fill(4000)('r'.toByte), // one giant run
        Array.tabulate(6000)(i => (i % 13).toByte), // period 13
        Array.tabulate(3000)(i => ((i / 97) % 251).toByte), // runs of 97
        (Array.fill(800)(rng.nextInt().toByte) ++
          Array.fill(900)('x'.toByte) ++
          Array.tabulate(700)(i => (i % 5).toByte)), // mixed
      ) ++ (1 to 20).map { i =>
        // seeded random mixtures of runs and noise
        val r2 = new scala.util.Random(i)
        (0 until 10).flatMap { _ =>
          if (r2.nextBoolean()) Array.fill(r2.nextInt(300) + 1)(r2.nextInt(4).toByte)
          else Array.fill(r2.nextInt(100) + 1)(r2.nextInt().toByte)
        }.toArray
      }
    cases.foreach { data =>
      if (data.nonEmpty) {
        val comp = blosclzTestCompress(data)
        val out = new Array[Byte](data.length)
        BloscCodec.blosclzDecompress(comp, 0, comp.length, out, 0, data.length)
        assert(out.toSeq == data.toSeq, s"round trip failed at ${data.length} B")
      }
    }
  }

  test("gzip honors the requested deflate level") {
    // highly compressible payload: level 1 must produce more bytes than
    // level 9, and both must decode back to the original
    val shape = Array(64, 64, 4)
    val vals = Array.tabulate(shape.product)(i => (i % 7).toLong)
    val fast = BlockCodec.encode(shape, vals, null, Dtype.UInt8,
      Compression("gzip", 1))
    val best = BlockCodec.encode(shape, vals, null, Dtype.UInt8,
      Compression("gzip", 9))
    assert(fast.length > best.length,
      s"level 1 (${fast.length} B) should compress worse than level 9 (${best.length} B)")
    for ((enc, lvl) <- Seq((fast, 1), (best, 9))) {
      val dec = BlockCodec.decode(enc, Dtype.UInt8, Compression("gzip", lvl))
      assert(dec.longs.toSeq == vals.toSeq, s"level $lvl")
    }
  }
}
