package graft.n5

/** Pure-JVM codec for the blosc1 chunk container — the c-blosc 1.x wire
  * format that numcodecs/zarr resolve by codec id (the reference accepts
  * it wherever a compressor name is taken: `tif_to_n5.py:89-92`,
  * `create_n5.py:13-18`, `ometif_to_n5.py:257-260`), and zarr's default
  * compressor family in the wild — so real N5 volumes exist that an
  * engine without this path simply cannot scan. No JNI anywhere: the
  * container is a plain 16-byte header + per-block split streams.
  *
  * READ ([[decode]]) accepts EVERY inner codec the blosc1 flag space
  * names: blosclz (c-blosc's own default LZ77, decoded by
  * [[blosclzDecompress]]), lz4/lz4hc (raw-block framing), snappy (raw
  * block via the snappy-java already on Spark's classpath), zlib and
  * zstd streams — plus byte-shuffled ([[unshuffle]]) and bit-shuffled
  * ([[bitUnshuffle]]) chunks. WRITE ([[encode]]) emits the
  * fixed interop profile documented on that method (typesize-1 /
  * no-shuffle / lz4, single block) — deliberately the corner of the
  * format every conforming decoder, including c-blosc's own frozen
  * forward-compat heuristic, parses without guessing.
  *
  * Chunk layout (public c-blosc `README_HEADER.rst`):
  *
  *   byte 0    format version
  *   byte 1    compressor-specific format version
  *   byte 2    flags: bit0 byte-shuffle, bit1 memcpy'ed, bit2 bit-shuffle,
  *             bits 5-7 inner compressor (0 blosclz, 1 lz4/lz4hc,
  *             2 snappy, 3 zlib, 4 zstd)
  *   byte 3    typesize
  *   4-7       nbytes   (uncompressed size, LE uint32)
  *   8-11      blocksize (internal block size, LE uint32)
  *   12-15     cbytes   (total compressed chunk size incl. header, LE)
  *
  * memcpy'ed chunks carry the raw (unshuffled) buffer straight after the
  * header. Compressed chunks carry `nblocks` LE int32 offsets (from chunk
  * start) to each internal block, and each block is one or more SPLIT
  * streams — `int32 LE csize` + csize bytes each, csize == stream size
  * meaning stored-raw. c-blosc does not RECORD the split count; its
  * decompressor re-derives it from (compressor, typesize, blocksize) via
  * the frozen forward-compat rule (split into `typesize` streams for
  * blosclz/lz4 when 2 <= typesize <= 16 and the block is big enough).
  * Rather than replicate that heuristic bit-for-bit, this decoder parses
  * ADAPTIVELY: it tries the compressor's preferred stream count first and
  * falls back to the other, validating that the streams consume exactly
  * the block's byte range and decompress to exactly the block size — a
  * parse under the wrong split assumption fails both checks.
  *
  * Byte-shuffle (flags bit0) is undone per block after decompression
  * (whole elements transposed, the sub-element tail copied verbatim —
  * c-blosc's `unshuffle` contract); bit-shuffle (bit2) likewise per
  * block, over the largest multiple-of-8 element prefix with the tail
  * verbatim (c-blosc's `bitshuffle` wrapper contract).
  *
  * Validation honesty: this container has no c-blosc build and no
  * numcodecs, so the blosclz and bit-shuffle paths are implemented from
  * the PUBLIC wire formats (blosclz is a documented FastLZ-level-2
  * derivative — token stream of 5-bit-literal-run / 3-bit-length +
  * 13-bit-offset matches with 255-chained length extension and the
  * 16-bit far-offset escape; bitshuffle is the documented bit-matrix
  * transpose) and verified by hand-computed vectors + inverse-property
  * tests in BlockCodecSpec, not against live c-blosc output. The
  * adaptive stream parser's double check (streams must consume exactly
  * the block range AND decompress to exactly the block size) makes a
  * format misreading fail loudly rather than corrupt silently.
  */
object BloscCodec {

  private val CompBloscLz = 0
  private val CompLz4 = 1
  private val CompSnappy = 2
  private val CompZlib = 3
  private val CompZstd = 4

  private def cname(code: Int): String = code match {
    case 0 => "blosclz"
    case 1 => "lz4"
    case 2 => "snappy"
    case 3 => "zlib"
    case 4 => "zstd"
    case c => s"unknown($c)"
  }

  /** Decode one blosc chunk starting at `off`; `expected` is the N5
    * payload size the caller derived from dtype × element count, checked
    * against the chunk's own nbytes.
    */
  def decode(raw: Array[Byte], off: Int, expected: Int): Array[Byte] = {
    require(raw.length - off >= 16,
      s"blosc chunk truncated: ${raw.length - off} bytes < 16-byte header")
    def u8(i: Int): Int = raw(off + i) & 0xff
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val flags = u8(2)
    val typesize = u8(3)
    val nbytes = le32(4)
    val blocksize = le32(8)
    val cbytes = le32(12)
    require(nbytes == expected,
      s"blosc nbytes $nbytes != expected payload $expected")
    if (nbytes == 0) return Array.emptyByteArray
    val out = new Array[Byte](nbytes)
    if ((flags & 0x2) != 0) { // memcpy'ed: raw original buffer follows
      require(cbytes == nbytes + 16,
        s"blosc memcpy chunk: cbytes $cbytes != nbytes $nbytes + 16")
      System.arraycopy(raw, off + 16, out, 0, nbytes)
      return out
    }
    val comp = (flags >> 5) & 0x7
    require(comp >= CompBloscLz && comp <= CompZstd,
      s"blosc inner codec '${cname(comp)}' is not supported; " +
        "blosclz, lz4, snappy, zlib and zstd are")
    require(blocksize > 0, s"blosc blocksize $blocksize must be positive")
    val nblocks = (nbytes + blocksize - 1) / blocksize
    require(raw.length - off >= 16 + 4 * nblocks,
      s"blosc chunk truncated: missing block offsets ($nblocks blocks)")
    var j = 0
    while (j < nblocks) {
      val bs = math.min(blocksize, nbytes - j * blocksize)
      val bstart = le32(16 + 4 * j)
      val bend = if (j + 1 < nblocks) le32(16 + 4 * (j + 1)) else cbytes
      require(bstart >= 16 && bend > bstart && off + bend <= raw.length,
        s"blosc block $j has invalid range [$bstart, $bend)")
      val block = decodeBlock(raw, off + bstart, off + bend, bs, typesize, comp)
      // bit-shuffle is NOT the identity at typesize 1 (it still transposes
      // bit planes of 8-byte groups), so it applies unconditionally
      val plain =
        if ((flags & 0x4) != 0) bitUnshuffle(block, typesize)
        else if ((flags & 0x1) != 0 && typesize > 1) unshuffle(block, typesize)
        else block
      System.arraycopy(plain, 0, out, j * blocksize, bs)
      j += 1
    }
    out
  }

  /** One internal block: try the compressor's preferred split count,
    * fall back to the other; a candidate is accepted only if its streams
    * consume exactly [start, end) and decompress to exactly `bs` bytes.
    */
  private def decodeBlock(
      raw: Array[Byte], start: Int, end: Int, bs: Int,
      typesize: Int, comp: Int): Array[Byte] = {
    // c-blosc's split heuristic applies to blosclz and lz4 only
    val splitFriendly = comp == CompLz4 || comp == CompBloscLz
    val canSplit = typesize >= 2 && typesize <= 16 && bs % typesize == 0
    val candidates =
      if (!canSplit) Seq(1)
      else if (splitFriendly) Seq(typesize, 1)
      else Seq(1, typesize)
    var err: Throwable = null
    candidates.foreach { ns =>
      try return parseStreams(raw, start, end, bs, ns, comp)
      catch { case e: Exception => if (err == null) err = e }
    }
    throw new IllegalArgumentException(
      s"blosc block at $start does not parse as any of " +
        s"${candidates.mkString("/")} ${cname(comp)} streams", err)
  }

  private def parseStreams(
      raw: Array[Byte], start: Int, end: Int, bs: Int,
      nstreams: Int, comp: Int): Array[Byte] = {
    val streamSize = bs / nstreams
    val out = new Array[Byte](bs)
    var p = start
    var s = 0
    while (s < nstreams) {
      require(p + 4 <= end, s"split $s: missing csize prefix")
      val csize = (raw(p) & 0xff) | ((raw(p + 1) & 0xff) << 8) |
        ((raw(p + 2) & 0xff) << 16) | ((raw(p + 3) & 0xff) << 24)
      p += 4
      require(csize > 0 && p + csize <= end,
        s"split $s: csize $csize outside block range")
      if (csize == streamSize)
        System.arraycopy(raw, p, out, s * streamSize, streamSize)
      else
        decompressStream(raw, p, csize, out, s * streamSize, streamSize, comp)
      p += csize
      s += 1
    }
    require(p == end, s"split streams consume ${p - start} of ${end - start}")
    out
  }

  private def decompressStream(
      src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int, comp: Int): Unit =
    comp match {
      case CompBloscLz =>
        blosclzDecompress(src, srcOff, srcLen, dst, dstOff, dstLen)
      case CompSnappy => // raw snappy block (c-blosc calls snappy_uncompress)
        val n = org.xerial.snappy.Snappy.uncompress(src, srcOff, srcLen, dst, dstOff)
        require(n == dstLen, s"snappy stream decoded $n bytes, want $dstLen")
      case CompLz4 => // raw LZ4 block (LZ4_compress_default framing)
        val n = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
          .safeDecompressor().decompress(src, srcOff, srcLen, dst, dstOff, dstLen)
        require(n == dstLen, s"lz4 stream decoded $n bytes, want $dstLen")
      case CompZlib => // zlib-wrapped deflate (zlib compress())
        val inf = new java.util.zip.Inflater()
        try {
          inf.setInput(src, srcOff, srcLen)
          val n = inf.inflate(dst, dstOff, dstLen)
          require(n == dstLen && inf.finished(),
            s"zlib stream decoded $n bytes, want $dstLen")
        } finally inf.end()
      case CompZstd => // standard zstd frame
        val n = com.github.luben.zstd.Zstd.decompressByteArray(
          dst, dstOff, dstLen, src, srcOff, srcLen)
        require(n == dstLen, s"zstd stream decoded $n bytes, want $dstLen")
      case c => throw new IllegalArgumentException(
        s"blosc inner codec '${cname(c)}' is not supported")
    }

  /** Encode a payload as a blosc1 chunk (r12 — closes the write half of
    * blosc compatibility). The emitted profile is chosen so that EVERY
    * conforming decoder agrees on its structure without guessing:
    *
    *   - typesize = 1 — below c-blosc's 2..16 split regime, so its
    *     frozen forward-compat heuristic (and this file's adaptive
    *     parser) derives exactly ONE stream per block; no heuristic
    *     replication is needed for interop;
    *   - no shuffle — shuffle at typesize 1 is the identity anyway;
    *   - lz4 inner codec (raw LZ4 block format, the LZ4_compress
    *     framing c-blosc itself uses), single internal block
    *     (blocksize = nbytes);
    *   - a stream that lz4 EXPANDS is emitted stored (csize == stream
    *     size), the container's own raw form.
    *
    * `level` > 0 selects LZ4-HC at that level; otherwise the fast
    * compressor. An empty payload emits the bare 16-byte memcpy header.
    * The choice trades the last few % of ratio (c-blosc's shuffle+split
    * would sometimes do better) for a byte stream whose validity does
    * not depend on replicating c-blosc's internal block heuristics —
    * and the N5 layer's compression ratio story remains gzip/zstd.
    */
  def encode(payload: Array[Byte], level: Int = -1): Array[Byte] = {
    val nbytes = payload.length
    def header(flags: Int, blocksize: Int, cbytes: Int): Array[Byte] = {
      val h = new Array[Byte](16)
      h(0) = 2; h(1) = 1 // container version, lz4 format version
      h(2) = flags.toByte
      h(3) = 1 // typesize
      def le32(i: Int, v: Int): Unit = {
        h(i) = v.toByte; h(i + 1) = (v >> 8).toByte
        h(i + 2) = (v >> 16).toByte; h(i + 3) = (v >> 24).toByte
      }
      le32(4, nbytes); le32(8, blocksize); le32(12, cbytes)
      h
    }
    if (nbytes == 0) return header(0x2, 0, 16) // memcpy'ed empty chunk
    val factory = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
    val comp =
      if (level > 0) factory.highCompressor(math.min(level, 17))
      else factory.fastCompressor()
    val cbuf = new Array[Byte](comp.maxCompressedLength(nbytes))
    val clen = comp.compress(payload, 0, nbytes, cbuf, 0)
    val stored = clen >= nbytes
    val streamLen = if (stored) nbytes else clen
    val cbytes = 16 + 4 + 4 + streamLen // header + 1 offset + csize prefix
    val out = java.nio.ByteBuffer.allocate(cbytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(header(0x20, nbytes, cbytes)) // flags: lz4, no shuffle
    out.putInt(20) // single block offset (right after the offsets table)
    out.putInt(streamLen)
    if (stored) out.put(payload) else out.put(cbuf, 0, clen)
    out.array()
  }

  /** Undo c-blosc's byte shuffle on one block: the first
    * `(len/typesize)*typesize` bytes are a [typesize × elems] transpose,
    * the sub-element tail is stored verbatim.
    */
  private[n5] def unshuffle(b: Array[Byte], typesize: Int): Array[Byte] = {
    val n = b.length
    val elems = n / typesize
    val out = new Array[Byte](n)
    var t = 0
    while (t < typesize) {
      var i = 0
      val base = t * elems
      while (i < elems) { out(i * typesize + t) = b(base + i); i += 1 }
      t += 1
    }
    val whole = elems * typesize
    if (whole < n) System.arraycopy(b, whole, out, whole, n - whole)
    out
  }

  /** Undo c-blosc's BIT shuffle on one block (r13). Forward bitshuffle
    * (public bitshuffle library, wrapped by c-blosc's `bitshuffle()`):
    * the largest multiple-of-8 element prefix is viewed as an
    * [nelem × 8·typesize] bit matrix and transposed — output bit-plane
    * `p = 8·byte + bit` is `nelem/8` bytes long, its byte `q` packs
    * elements `8q..8q+7` LSB-first, and plane (byte b, bit k) holds bit
    * k of byte b of every element. The remaining bytes (partial
    * elements, plus whole elements beyond the multiple-of-8 prefix) are
    * stored verbatim after the shuffled prefix — c-blosc's
    * `shuffle.c` leftover contract, same as [[unshuffle]]'s tail.
    * This is the inverse: scatter each set plane bit back to
    * (element, byte, bit).
    */
  private[n5] def bitUnshuffle(b: Array[Byte], typesize: Int): Array[Byte] = {
    val n = b.length
    val nelem0 = n / typesize
    val nelem = nelem0 - (nelem0 % 8)
    if (nelem == 0) return b
    val out = new Array[Byte](n)
    val planeBytes = nelem / 8
    var bIdx = 0
    while (bIdx < typesize) {
      var k = 0
      while (k < 8) {
        val planeOff = (bIdx * 8 + k) * planeBytes
        val setBit = 1 << k
        var q = 0
        while (q < planeBytes) {
          val s = b(planeOff + q) & 0xff
          if (s != 0) {
            val eBase = 8 * q
            var j = 0
            while (j < 8) {
              if (((s >> j) & 1) != 0) {
                val at = (eBase + j) * typesize + bIdx
                out(at) = (out(at) | setBit).toByte
              }
              j += 1
            }
          }
          q += 1
        }
        k += 1
      }
      bIdx += 1
    }
    val whole = nelem * typesize
    if (whole < n) System.arraycopy(b, whole, out, whole, n - whole)
    out
  }

  /** Forward bitshuffle of one block — the exact inverse of
    * [[bitUnshuffle]], exposed for the spec's inverse-property and
    * hand-vector tests (and so a future writer could emit shuffled
    * chunks). Same prefix/tail contract.
    */
  private[n5] def bitShuffle(b: Array[Byte], typesize: Int): Array[Byte] = {
    val n = b.length
    val nelem0 = n / typesize
    val nelem = nelem0 - (nelem0 % 8)
    if (nelem == 0) return b
    val out = new Array[Byte](n)
    val planeBytes = nelem / 8
    var e = 0
    while (e < nelem) {
      var bIdx = 0
      while (bIdx < typesize) {
        val s = b(e * typesize + bIdx) & 0xff
        if (s != 0) {
          var k = 0
          while (k < 8) {
            if (((s >> k) & 1) != 0) {
              val at = (bIdx * 8 + k) * planeBytes + (e >> 3)
              out(at) = (out(at) | (1 << (e & 7))).toByte
            }
            k += 1
          }
        }
        bIdx += 1
      }
      e += 1
    }
    val whole = nelem * typesize
    if (whole < n) System.arraycopy(b, whole, out, whole, n - whole)
    out
  }

  /** Decompress one blosclz stream (r13) — c-blosc's own default LZ77,
    * a documented FastLZ-level-2 derivative. Token stream (first token
    * is always a literal run, its high bits masked):
    *
    *   ctrl < 32   literal run of `ctrl + 1` bytes copied from input
    *   ctrl >= 32  match: length token `ctrl >> 5` ∈ [1,7] encodes
    *               length `tok + 2` (min match 3); tok == 7 chains
    *               extension bytes (`len += byte` while byte == 255).
    *               Distance = `((ctrl & 31) << 8) + lowByte + 1`
    *               (13-bit + 1); the saturated pair (high bits 31,
    *               lowByte 255) escapes to a 16-bit big-endian far
    *               offset with distance `far + 8192`.
    *
    * Matches copy byte-sequentially so overlapping (RLE-style)
    * references self-extend, per the format. Every read and write is
    * bounds-checked and the stream must decode to exactly `dstLen` —
    * a wrong-format parse dies loudly (see the class doc's validation
    * note).
    */
  private[n5] def blosclzDecompress(
      src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    require(srcLen > 0, "blosclz: empty stream")
    val ipLimit = srcOff + srcLen
    val opLimit = dstOff + dstLen
    val MaxDistance = 8191
    var ip = srcOff
    var op = dstOff
    var ctrl = src(ip) & 31
    ip += 1
    var done = false
    while (!done) {
      if (ctrl >= 32) { // match
        var len = (ctrl >> 5) - 1
        val ofsHigh = (ctrl & 31) << 8
        if (len == 6) { // saturated length token: chained extension
          var code = 0
          do {
            require(ip < ipLimit, "blosclz: truncated length extension")
            code = src(ip) & 0xff; ip += 1
            len += code
          } while (code == 255)
        }
        require(ip < ipLimit, "blosclz: truncated offset byte")
        val low = src(ip) & 0xff
        ip += 1
        len += 3
        var dist = ofsHigh + low + 1
        if (low == 255 && ofsHigh == (31 << 8)) { // far-offset escape
          require(ip + 2 <= ipLimit, "blosclz: truncated far offset")
          dist = (((src(ip) & 0xff) << 8) | (src(ip + 1) & 0xff)) +
            MaxDistance + 1
          ip += 2
        }
        val ref = op - dist
        require(ref >= dstOff,
          s"blosclz: match distance $dist reaches before output start")
        require(op + len <= opLimit,
          s"blosclz: match of $len bytes overruns output")
        var i = 0
        while (i < len) { dst(op + i) = dst(ref + i); i += 1 }
        op += len
      } else { // literal run
        val run = ctrl + 1
        require(ip + run <= ipLimit, "blosclz: literal run overruns input")
        require(op + run <= opLimit, "blosclz: literal run overruns output")
        System.arraycopy(src, ip, dst, op, run)
        ip += run
        op += run
      }
      if (ip >= ipLimit) done = true
      else { ctrl = src(ip) & 0xff; ip += 1 }
    }
    require(op == opLimit,
      s"blosclz stream decoded ${op - dstOff} bytes, want $dstLen")
  }
}
