package graft.functions

import java.security.MessageDigest

/** PDF standard security handler (r19): decryption for the dominant
  * encrypted-crawl case — an EMPTY user password (viewers open these
  * transparently), RC4-40/128 (/V 1|2, /R 2|3) and AES-128-CBC
  * (/V 4 /R 4 with /CFM /AESV2), per ISO 32000-1 7.6.2–7.6.5
  * (Algorithms 1, 2, 4, 5). Everything else stays LOUD: a non-empty
  * user password (the U check fails), owner-locked-only files open
  * (their U check passes — correct), /V 5 (AES-256), crypt filters
  * other than Identity/V2/AESV2, and non-/Standard handlers all
  * reject by name rather than emit garbage.
  *
  * Reference behavior: the reference pipeline has no PDF decryption at
  * all (PDFs are opaque bytes there); this exists because a real crawl
  * corpus is full of empty-password-encrypted documents.
  */
object PdfCrypt {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed PDF: $msg")

  /** The 32-byte password pad of Algorithm 2 (ISO 32000-1 7.6.3.3). */
  private val pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 — 20 lines beats a provider lookup for a 1994 cipher. */
  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** One crypt-filter method: how streams or strings decrypt. */
  private sealed trait Cfm
  private case object Identity extends Cfm
  private case object Rc4 extends Cfm
  private case object AesV2 extends Cfm

  /** A verified (empty-user-password) decryptor for one document. */
  final class Decryptor(
      fileKey: Array[Byte], stmCfm: Cfm, strCfm: Cfm) {

    /** Algorithm 1's per-object key: md5(fileKey + objnum LE24 +
      * gen LE16 [+ "sAlT" for AES]), truncated to min(n+5, 16).
      */
    private def objKey(num: Int, gen: Int, aes: Boolean): Array[Byte] = {
      val tail = Array[Byte](
        num.toByte, (num >> 8).toByte, (num >> 16).toByte,
        gen.toByte, (gen >> 8).toByte)
      val salt =
        if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
        else Array.emptyByteArray
      md5(fileKey, tail, salt).take(math.min(fileKey.length + 5, 16))
    }

    private def apply(cfm: Cfm, num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      cfm match {
        case Identity => data
        case Rc4 => rc4(objKey(num, gen, aes = false), data)
        case AesV2 =>
          if (data.isEmpty) return data
          if (data.length < 32 || data.length % 16 != 0)
            fail(s"AES ciphertext of object $num is ${data.length} B — " +
              "needs a 16 B IV plus 16 B-aligned blocks")
          val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(objKey(num, gen, aes = true), "AES"),
            new javax.crypto.spec.IvParameterSpec(data, 0, 16))
          val plain = cipher.doFinal(data, 16, data.length - 16)
          // PKCS#5: the pad byte count is the pad byte value
          val padN = plain(plain.length - 1) & 0xff
          if (padN < 1 || padN > 16 || padN > plain.length)
            fail(s"AES padding of object $num is invalid ($padN)")
          var i = plain.length - padN
          while (i < plain.length) {
            if ((plain(i) & 0xff) != padN)
              fail(s"AES padding of object $num is malformed")
            i += 1
          }
          plain.take(plain.length - padN)
      }

    def stream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      apply(stmCfm, num, gen, data)
    def string(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      apply(strCfm, num, gen, data)
  }

  /** Build a [[Decryptor]] from a /Encrypt dictionary + the first file
    * /ID string, verifying the EMPTY user password (Algorithms 2/4/5) —
    * a failed check means the file needs a real password: loud reject.
    * `deref` resolves indirect values inside the dict.
    */
  def decryptor(
      enc: Map[String, Any], id0: Array[Byte],
      deref: Any => Any): Decryptor = {
    def str(k: String): Array[Byte] = deref(enc.getOrElse(k,
      fail(s"/Encrypt missing /$k"))) match {
      case b: Array[Byte] => b
      case o => fail(s"/Encrypt /$k is not a string: $o")
    }
    def num(k: String, dflt: Long): Long = deref(enc.get(k).getOrElse(dflt)) match {
      case n: Long => n
      case o => fail(s"/Encrypt /$k is not an integer: $o")
    }
    deref(enc.getOrElse("Filter", fail("/Encrypt missing /Filter"))) match {
      case PdfText.PName("Standard") => ()
      case o => fail(s"unsupported security handler $o (only /Standard)")
    }
    val v = num("V", 0)
    val r = num("R", 0)
    val o = str("O")
    val u = str("U")
    val p = num("P", 0).toInt
    if (o.length < 32 || u.length < 32)
      fail(s"/Encrypt /O|/U must be 32 bytes (got ${o.length}/${u.length})")
    val bits = v match {
      case 1 => 40L
      case 2 | 4 => num("Length", 40)
      case 5 => fail("AES-256 encryption (/V 5) is unsupported")
      case other => fail(s"unsupported /Encrypt /V $other")
    }
    if (r != 2 && r != 3 && r != 4)
      fail(s"unsupported /Encrypt /R $r (2 | 3 | 4)")
    if (bits % 8 != 0 || bits < 40 || bits > 128)
      fail(s"bad /Encrypt /Length $bits")
    val n = if (r == 2) 5 else (bits / 8).toInt
    val encryptMetadata = r >= 4 && (deref(enc.getOrElse("EncryptMetadata",
      true)) match {
      case b: Boolean => !b
      case _ => false
    })

    // Algorithm 2: the file key for the EMPTY user password
    var key = md5(pad, o.take(32),
      Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte),
      id0,
      if (encryptMetadata) Array[Byte](-1, -1, -1, -1) else Array.emptyByteArray)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
    key = key.take(n)

    // Algorithm 4 (R2) / 5 (R3+): does the empty user password open it?
    val ok = if (r == 2) {
      java.util.Arrays.equals(rc4(key, pad), u.take(32))
    } else {
      var x = rc4(key, md5(pad, id0))
      for (i <- 1 to 19)
        x = rc4(key.map(b => (b ^ i).toByte), x)
      java.util.Arrays.equals(x, u.take(16))
    }
    if (!ok) fail("encrypted PDF requires a user password " +
      "(only empty-password files decrypt)")

    val (stmCfm, strCfm): (Cfm, Cfm) =
      if (v == 4) {
        val cf = deref(enc.getOrElse("CF", Map.empty[String, Any])) match {
          case m: Map[String @unchecked, Any @unchecked] => m
          case other => fail(s"/Encrypt /CF is not a dict: $other")
        }
        def cfmOf(filterName: String): Cfm = filterName match {
          case "Identity" => Identity
          case name => deref(cf.getOrElse(name,
            fail(s"/Encrypt names crypt filter /$name without a /CF entry"))) match {
            case m: Map[String @unchecked, Any @unchecked] =>
              deref(m.getOrElse("CFM", fail(s"crypt filter /$name missing /CFM"))) match {
                case PdfText.PName("V2") => Rc4
                case PdfText.PName("AESV2") => AesV2
                case other => fail(s"unsupported /CFM $other (V2 | AESV2)")
              }
            case other => fail(s"crypt filter /$name is not a dict: $other")
          }
        }
        def filterName(k: String): String =
          deref(enc.getOrElse(k, PdfText.PName("Identity"))) match {
            case PdfText.PName(nm) => nm
            case other => fail(s"/Encrypt /$k is not a name: $other")
          }
        (cfmOf(filterName("StmF")), cfmOf(filterName("StrF")))
      } else (Rc4, Rc4)
    new Decryptor(key, stmCfm, strCfm)
  }
}
