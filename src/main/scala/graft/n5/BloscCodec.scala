package graft.n5

/** Pure-JVM READ-ONLY decoder for the blosc1 chunk container — the c-blosc
  * 1.x wire format that numcodecs/zarr resolve by codec id (the reference
  * accepts it wherever a compressor name is taken: `tif_to_n5.py:89-92`,
  * `create_n5.py:13-18`, `ometif_to_n5.py:257-260`), and zarr's default
  * compressor family in the wild — so real N5 volumes exist that an engine
  * without this path simply cannot scan. Decompression needs no JNI: the
  * container is a plain 16-byte header + per-block split streams, and the
  * inner codecs blosc actually uses (lz4 raw blocks, zlib streams, zstd
  * frames) all have JVM implementations already on the classpath. WRITES
  * stay unsupported (the engine re-encodes with its own codecs; a blosc
  * ENCODER would have to reproduce c-blosc's block/split heuristics
  * byte-for-byte to be honest) and fail loudly at DDL time.
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
  * c-blosc's `unshuffle` contract). Bit-shuffle (bit2), blosclz, and
  * snappy inner streams have no JVM decoder and fail with a message that
  * says exactly that.
  */
object BloscCodec {

  private val CompLz4 = 1
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
    require((flags & 0x4) == 0,
      "blosc bit-shuffle is not supported (no pure-JVM bitshuffle kernel); " +
        "re-encode the volume with byte-shuffle or no shuffle")
    val comp = (flags >> 5) & 0x7
    require(comp == CompLz4 || comp == CompZlib || comp == CompZstd,
      s"blosc inner codec '${cname(comp)}' is not supported " +
        "(no pure-JVM decoder); lz4, zlib and zstd are")
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
      val plain =
        if ((flags & 0x1) != 0 && typesize > 1) unshuffle(block, typesize)
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
    val splitFriendly = comp == CompLz4 // (and blosclz, which we reject)
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
}
