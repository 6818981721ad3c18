package graft.n5

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** One decoded N5 block: grid position, actual (edge-trimmed) shape in
  * x,y,z order, and the element payload widened to Long (integer dtypes)
  * or Double (float dtypes), in x-fastest flat order.
  */
final case class DecodedBlock(
    grid: Array[Int],
    shape: Array[Int],
    longs: Array[Long],    // null for float dtypes
    doubles: Array[Double] // null for integer dtypes
) {
  def numElements: Int = shape.product
  /** Elements actually decoded — equals [[numElements]] for default-mode
    * blocks; a varlength (mode-1) block carries its own count.
    */
  def elementCount: Int = if (longs != null) longs.length else doubles.length
  def isFloat: Boolean = doubles != null
}

/** N5 block binary codec.
  *
  * Layout (verified against the golden fixture, FIXTURES.md §A; reference
  * read path `n5_utils.py:6-18` via zarr's N5Store): big-endian
  * `uint16 mode` (0 = default), `uint16 ndim`, `ndim × uint32` actual block
  * dims (x,y,z order, edge blocks trimmed), then the (optionally gzip'd)
  * element payload. Element order is x-fastest C-order of the z,y,x view —
  * i.e. flat index = x + y*sx + z*sx*sy with the LOCAL block shape.
  *
  * Unsigned dtypes are widened on read and narrowed on write (single
  * DtypeCodec path — SURVEY §7 flags scattered sign handling as the main
  * correctness hazard here).
  */
object BlockCodec {

  /** Decode a raw block file. Mode 0 (default) carries shape.product
    * elements; mode 1 (varlength — real Janelia label volumes carry it)
    * declares its own element count in an extra uint32 after the dims
    * (n5-java DefaultBlockReader's layout), decoded through the same
    * codec pipeline. Mode 2 (object) stays unsupported.
    */
  def decode(raw: Array[Byte], dtype: Dtype, comp: Compression): DecodedBlock = {
    val hdr = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    val mode = hdr.getShort() & 0xffff
    require(mode == 0 || mode == 1,
      s"unsupported N5 block mode: $mode (only default (0) and varlength (1) are supported)")
    val ndim = hdr.getShort() & 0xffff
    val shape = Array.fill(ndim)(hdr.getInt())
    val n = if (mode == 1) hdr.getInt() else shape.product
    val headerLen = 4 + 4 * ndim + (if (mode == 1) 4 else 0)
    val payload = decompress(raw, headerLen, comp, n * dtype.bytesPerElement)
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    dtype match {
      case Dtype.Float32 =>
        val out = new Array[Double](n)
        var i = 0; while (i < n) { out(i) = buf.getFloat().toDouble; i += 1 }
        DecodedBlock(null, shape, null, out)
      case Dtype.Float64 =>
        val out = new Array[Double](n)
        var i = 0; while (i < n) { out(i) = buf.getDouble(); i += 1 }
        DecodedBlock(null, shape, null, out)
      case d =>
        val out = new Array[Long](n)
        var i = 0
        d match {
          case Dtype.UInt8 => while (i < n) { out(i) = buf.get() & 0xffL; i += 1 }
          case Dtype.Int8 => while (i < n) { out(i) = buf.get().toLong; i += 1 }
          case Dtype.UInt16 => while (i < n) { out(i) = buf.getShort() & 0xffffL; i += 1 }
          case Dtype.Int16 => while (i < n) { out(i) = buf.getShort().toLong; i += 1 }
          case Dtype.UInt32 => while (i < n) { out(i) = buf.getInt() & 0xffffffffL; i += 1 }
          case Dtype.Int32 => while (i < n) { out(i) = buf.getInt().toLong; i += 1 }
          // uint64 values above Long.MaxValue wrap (documented narrowing)
          case Dtype.UInt64 | Dtype.Int64 => while (i < n) { out(i) = buf.getLong(); i += 1 }
          case _ => throw new IllegalStateException(s"unreachable: $d")
        }
        DecodedBlock(null, shape, out, null)
    }
  }

  /** Decode one zarr v2 chunk into the N5 block shape contract. A zarr
    * chunk has NO header: the payload is the FULL chunk (edge chunks are
    * fill-padded by the writer), compressed whole, elements in C order of
    * the declared shape — which after the metadata-side axis reversal is
    * exactly N5's x-fastest order. This trims the padded payload down to
    * `trimmedShape` (the attrs-derived edge shape), so downstream block
    * consumers see the same edge-trimmed contract N5 blocks satisfy.
    * `littleEndian` follows the .zarray dtype byte-order character.
    */
  def decodeZarr(
      raw: Array[Byte], dtype: Dtype, comp: Compression,
      chunkShape: Array[Int], trimmedShape: Array[Int],
      littleEndian: Boolean): DecodedBlock = {
    val full = chunkShape.product
    val payload = decompress(raw, 0, comp, full * dtype.bytesPerElement)
    require(payload.length >= full * dtype.bytesPerElement,
      s"zarr chunk: ${payload.length} payload bytes < " +
        s"$full x ${dtype.bytesPerElement} expected")
    val buf = ByteBuffer.wrap(payload)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    // full-chunk flat index of a trimmed flat index (x fastest)
    val n = trimmedShape.product
    val srcIdx = new Array[Int](n)
    locally {
      var i = 0
      while (i < n) {
        var rem = i; var stride = 1; var src = 0
        var d = 0
        while (d < trimmedShape.length) {
          src += (rem % trimmedShape(d)) * stride
          rem /= trimmedShape(d)
          stride *= chunkShape(d)
          d += 1
        }
        srcIdx(i) = src
        i += 1
      }
    }
    dtype match {
      case Dtype.Float32 =>
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = buf.getFloat(srcIdx(i) * 4).toDouble; i += 1 }
        DecodedBlock(null, trimmedShape, null, out)
      case Dtype.Float64 =>
        val out = new Array[Double](n)
        var i = 0
        while (i < n) { out(i) = buf.getDouble(srcIdx(i) * 8); i += 1 }
        DecodedBlock(null, trimmedShape, null, out)
      case d =>
        val out = new Array[Long](n)
        var i = 0
        d match {
          case Dtype.UInt8 =>
            while (i < n) { out(i) = buf.get(srcIdx(i)) & 0xffL; i += 1 }
          case Dtype.Int8 =>
            while (i < n) { out(i) = buf.get(srcIdx(i)).toLong; i += 1 }
          case Dtype.UInt16 =>
            while (i < n) { out(i) = buf.getShort(srcIdx(i) * 2) & 0xffffL; i += 1 }
          case Dtype.Int16 =>
            while (i < n) { out(i) = buf.getShort(srcIdx(i) * 2).toLong; i += 1 }
          case Dtype.UInt32 =>
            while (i < n) { out(i) = buf.getInt(srcIdx(i) * 4) & 0xffffffffL; i += 1 }
          case Dtype.Int32 =>
            while (i < n) { out(i) = buf.getInt(srcIdx(i) * 4).toLong; i += 1 }
          case Dtype.UInt64 | Dtype.Int64 =>
            while (i < n) { out(i) = buf.getLong(srcIdx(i) * 8); i += 1 }
          case _ => throw new IllegalStateException(s"unreachable: $d")
        }
        DecodedBlock(null, trimmedShape, out, null)
    }
  }

  /** Encode a block to the N5 binary layout. Exactly one of longs/doubles
    * must be non-null, length == shape.product. `varlength` emits the
    * mode-1 header (an extra uint32 element count after the dims —
    * n5-java DefaultBlockWriter's varlength layout) with the full
    * count, so a mode-1 label volume round-trips through the engine
    * mode-byte-compatibly instead of being re-encoded dense mode-0.
    */
  def encode(
      shape: Array[Int],
      longs: Array[Long],
      doubles: Array[Double],
      dtype: Dtype,
      comp: Compression,
      varlength: Boolean = false): Array[Byte] = {
    val n = shape.product
    val payload = ByteBuffer.allocate(n * dtype.bytesPerElement)
      .order(ByteOrder.BIG_ENDIAN)
    dtype match {
      case Dtype.Float32 =>
        var i = 0; while (i < n) { payload.putFloat(doubles(i).toFloat); i += 1 }
      case Dtype.Float64 =>
        var i = 0; while (i < n) { payload.putDouble(doubles(i)); i += 1 }
      case d =>
        // fail-loudly discipline: the narrowing below would otherwise wrap
        // out-of-range values silently (the raw block-table write path has
        // no upstream range check, unlike ingest/writeBox)
        d.integerRange.foreach { case (lo, hi) =>
          var j = 0
          while (j < n) {
            if (longs(j) < lo || longs(j) > hi)
              throw new IllegalArgumentException(
                s"block value ${longs(j)} outside ${d.name} range [$lo, $hi]")
            j += 1
          }
        }
        var i = 0
        d match {
          case Dtype.UInt8 | Dtype.Int8 =>
            while (i < n) { payload.put((longs(i) & 0xffL).toByte); i += 1 }
          case Dtype.UInt16 | Dtype.Int16 =>
            while (i < n) { payload.putShort((longs(i) & 0xffffL).toShort); i += 1 }
          case Dtype.UInt32 | Dtype.Int32 =>
            while (i < n) { payload.putInt((longs(i) & 0xffffffffL).toInt); i += 1 }
          case Dtype.UInt64 | Dtype.Int64 =>
            while (i < n) { payload.putLong(longs(i)); i += 1 }
          case _ => throw new IllegalStateException(s"unreachable: $d")
        }
    }
    val body = compress(payload.array(), comp)
    val headerLen = 4 + 4 * shape.length + (if (varlength) 4 else 0)
    val out = ByteBuffer.allocate(headerLen + body.length)
      .order(ByteOrder.BIG_ENDIAN)
    out.putShort(if (varlength) 1.toShort else 0.toShort)
    out.putShort(shape.length.toShort)
    shape.foreach(out.putInt)
    if (varlength) out.putInt(n)
    out.put(body)
    out.array()
  }

  /** Encode one block as a zarr v2 chunk (r14, write support) — the
    * inverse of [[decodeZarr]]: the trimmed block payload is scattered
    * into a FULL fill-0 chunk buffer (zarr edge chunks are fill-padded,
    * never trimmed), elements little-endian by default in C order of the
    * reversed axes (= the engine's x-fastest order), compressed whole
    * with no header. Same loud range check as the N5 [[encode]] path.
    */
  def encodeZarr(
      trimmedShape: Array[Int], chunkShape: Array[Int],
      longs: Array[Long], doubles: Array[Double],
      dtype: Dtype, comp: Compression,
      littleEndian: Boolean = true): Array[Byte] = {
    val full = chunkShape.product
    val n = trimmedShape.product
    if (longs != null) dtype.integerRange.foreach { case (lo, hi) =>
      var j = 0
      while (j < n) {
        if (longs(j) < lo || longs(j) > hi)
          throw new IllegalArgumentException(
            s"block value ${longs(j)} outside ${dtype.name} range [$lo, $hi]")
        j += 1
      }
    }
    val payload = ByteBuffer.allocate(full * dtype.bytesPerElement)
      .order(if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    // full-chunk flat index of a trimmed flat index — decodeZarr's map
    val dstIdx = new Array[Int](n)
    locally {
      var i = 0
      while (i < n) {
        var rem = i; var stride = 1; var dst = 0; var d = 0
        while (d < trimmedShape.length) {
          dst += (rem % trimmedShape(d)) * stride
          rem /= trimmedShape(d)
          stride *= chunkShape(d)
          d += 1
        }
        dstIdx(i) = dst
        i += 1
      }
    }
    dtype match {
      case Dtype.Float32 =>
        var i = 0
        while (i < n) { payload.putFloat(dstIdx(i) * 4, doubles(i).toFloat); i += 1 }
      case Dtype.Float64 =>
        var i = 0
        while (i < n) { payload.putDouble(dstIdx(i) * 8, doubles(i)); i += 1 }
      case d =>
        var i = 0
        d match {
          case Dtype.UInt8 | Dtype.Int8 =>
            while (i < n) { payload.put(dstIdx(i), (longs(i) & 0xffL).toByte); i += 1 }
          case Dtype.UInt16 | Dtype.Int16 =>
            while (i < n) { payload.putShort(dstIdx(i) * 2, (longs(i) & 0xffffL).toShort); i += 1 }
          case Dtype.UInt32 | Dtype.Int32 =>
            while (i < n) { payload.putInt(dstIdx(i) * 4, (longs(i) & 0xffffffffL).toInt); i += 1 }
          case Dtype.UInt64 | Dtype.Int64 =>
            while (i < n) { payload.putLong(dstIdx(i) * 8, longs(i)); i += 1 }
          case _ => throw new IllegalStateException(s"unreachable: $d")
        }
    }
    comp.codec match {
      case "raw" | "zlib" | "gzip" | "blosc" => ()
      case other => throw new IllegalArgumentException(
        s"zarr write: compressor '$other' unsupported (raw | zlib | gzip | blosc)")
    }
    compress(payload.array(), comp)
  }

  /** Wire formats match n5-java: gzip = GZIP stream, bzip2 = standard
    * bzip2 stream (commons-compress), lz4 = lz4-java LZ4BlockOutputStream
    * framing, zstd = zstd frame (n5-zstandard extension), xz = .xz
    * container with LZMA2 at the given preset (org.tukaani.xz, the same
    * library n5-java's XzCompression uses).
    */
  private def decompress(
      raw: Array[Byte], off: Int, comp: Compression, expected: Int): Array[Byte] = {
    def drain(in: java.io.InputStream): Array[Byte] =
      try in.readNBytes(expected) finally in.close()
    val bis = new ByteArrayInputStream(raw, off, raw.length - off)
    comp.codec match {
      case "raw" => java.util.Arrays.copyOfRange(raw, off, raw.length)
      case "gzip" => drain(new GZIPInputStream(bis))
      // n5-java "gzip" with useZlib=true: raw zlib deflate, no gzip wrapper
      case "zlib" => drain(new java.util.zip.InflaterInputStream(bis))
      case "bzip2" => drain(
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(bis))
      case "lz4" => drain(new net.jpountz.lz4.LZ4BlockInputStream(bis))
      case "zstd" => drain(new com.github.luben.zstd.ZstdInputStream(bis))
      case "xz" => drain(new org.tukaani.xz.XZInputStream(bis))
      // pure-JVM blosc1 container decode (lz4/zlib/zstd inner streams;
      // bit-shuffle/blosclz/snappy fail with their own loud messages)
      case "blosc" => BloscCodec.decode(raw, off, expected)
      case other => throw new IllegalArgumentException(
        s"unsupported compression for read: $other")
    }
  }

  private def compress(data: Array[Byte], comp: Compression): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    def fill(out: java.io.OutputStream): Array[Byte] = {
      out.write(data); out.close(); bos.toByteArray
    }
    comp.codec match {
      case "raw" => data
      case "gzip" =>
        // honor the requested deflate level (attributes.json records it);
        // level <= 0 means zlib default
        fill(new GZIPOutputStream(bos) {
          if (comp.level > 0) `def`.setLevel(comp.level)
        })
      case "zlib" => fill(new java.util.zip.DeflaterOutputStream(bos,
        new java.util.zip.Deflater(
          if (comp.level > 0) comp.level
          else java.util.zip.Deflater.DEFAULT_COMPRESSION)))
      case "bzip2" => fill(
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
          bos, if (comp.level > 0) comp.level else 9))
      case "lz4" => fill(new net.jpountz.lz4.LZ4BlockOutputStream(
        bos, if (comp.level > 0) comp.level else 65536))
      case "zstd" => fill(new com.github.luben.zstd.ZstdOutputStream(
        bos, if (comp.level > 0) comp.level else 3))
      case "xz" => fill(new org.tukaani.xz.XZOutputStream(bos,
        new org.tukaani.xz.LZMA2Options(
          if (comp.level >= 0) comp.level else 6)))
      // pure-JVM blosc1 encode: typesize-1/no-shuffle/lz4 profile whose
      // structure every conforming decoder derives without heuristics
      // (BloscCodec.encode); foreign inner codecs remain read-side-only
      case "blosc" => BloscCodec.encode(data, comp.level)
      case other => throw new IllegalArgumentException(
        s"unsupported compression for write: $other")
    }
  }
}
