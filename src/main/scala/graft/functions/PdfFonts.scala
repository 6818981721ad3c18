package graft.functions

/** PDF font encoding tables (r19): the Adobe Glyph List subset covering
  * the standard Latin text encodings, StandardEncoding's code layout,
  * and the glyph-name → Unicode resolution used by /Encoding
  * //Differences arrays (ISO 32000 9.6.6 + Annex D; glyph names per
  * Adobe's public AGL). WinAnsiEncoding and MacRomanEncoding decode
  * through the JDK's windows-1252 / x-MacRoman charsets — byte-
  * identical to Annex D's tables for every assigned code.
  *
  * Everything here is build-time data for [[PdfText]]'s font-aware
  * show-string decoding; unmappable glyph names are a LOUD reject at
  * the caller (silently-wrong text is worse than no text).
  */
object PdfFonts {

  /** Glyph name → Unicode string (AGL subset: ASCII names, Latin-1
    * names, the typographic/ligature set every Latin subset font
    * uses). `uniXXXX`/`uXXXX[XX]` conventions resolve in [[glyphToUnicode]].
    */
  private val agl: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    def put(n: String, cp: Int): Unit = m += (n -> new String(Character.toChars(cp)))
    // ASCII
    val ascii = Seq(
      "space" -> 0x20, "exclam" -> 0x21, "quotedbl" -> 0x22,
      "numbersign" -> 0x23, "dollar" -> 0x24, "percent" -> 0x25,
      "ampersand" -> 0x26, "quotesingle" -> 0x27, "parenleft" -> 0x28,
      "parenright" -> 0x29, "asterisk" -> 0x2A, "plus" -> 0x2B,
      "comma" -> 0x2C, "hyphen" -> 0x2D, "period" -> 0x2E, "slash" -> 0x2F,
      "zero" -> 0x30, "one" -> 0x31, "two" -> 0x32, "three" -> 0x33,
      "four" -> 0x34, "five" -> 0x35, "six" -> 0x36, "seven" -> 0x37,
      "eight" -> 0x38, "nine" -> 0x39, "colon" -> 0x3A, "semicolon" -> 0x3B,
      "less" -> 0x3C, "equal" -> 0x3D, "greater" -> 0x3E, "question" -> 0x3F,
      "at" -> 0x40, "bracketleft" -> 0x5B, "backslash" -> 0x5C,
      "bracketright" -> 0x5D, "asciicircum" -> 0x5E, "underscore" -> 0x5F,
      "grave" -> 0x60, "braceleft" -> 0x7B, "bar" -> 0x7C,
      "braceright" -> 0x7D, "asciitilde" -> 0x7E)
    ascii.foreach { case (n, c) => put(n, c) }
    for (c <- 'A' to 'Z') put(c.toString, c.toInt)
    for (c <- 'a' to 'z') put(c.toString, c.toInt)
    // Latin-1 supplement (AGL names for U+00A0..U+00FF)
    val latin1 = Seq(
      "exclamdown" -> 0xA1, "cent" -> 0xA2, "sterling" -> 0xA3,
      "currency" -> 0xA4, "yen" -> 0xA5, "brokenbar" -> 0xA6,
      "section" -> 0xA7, "dieresis" -> 0xA8, "copyright" -> 0xA9,
      "ordfeminine" -> 0xAA, "guillemotleft" -> 0xAB, "logicalnot" -> 0xAC,
      "registered" -> 0xAE, "macron" -> 0xAF, "degree" -> 0xB0,
      "plusminus" -> 0xB1, "twosuperior" -> 0xB2, "threesuperior" -> 0xB3,
      "acute" -> 0xB4, "mu" -> 0xB5, "paragraph" -> 0xB6,
      "periodcentered" -> 0xB7, "cedilla" -> 0xB8, "onesuperior" -> 0xB9,
      "ordmasculine" -> 0xBA, "guillemotright" -> 0xBB,
      "onequarter" -> 0xBC, "onehalf" -> 0xBD, "threequarters" -> 0xBE,
      "questiondown" -> 0xBF,
      "Agrave" -> 0xC0, "Aacute" -> 0xC1, "Acircumflex" -> 0xC2,
      "Atilde" -> 0xC3, "Adieresis" -> 0xC4, "Aring" -> 0xC5, "AE" -> 0xC6,
      "Ccedilla" -> 0xC7, "Egrave" -> 0xC8, "Eacute" -> 0xC9,
      "Ecircumflex" -> 0xCA, "Edieresis" -> 0xCB, "Igrave" -> 0xCC,
      "Iacute" -> 0xCD, "Icircumflex" -> 0xCE, "Idieresis" -> 0xCF,
      "Eth" -> 0xD0, "Ntilde" -> 0xD1, "Ograve" -> 0xD2, "Oacute" -> 0xD3,
      "Ocircumflex" -> 0xD4, "Otilde" -> 0xD5, "Odieresis" -> 0xD6,
      "multiply" -> 0xD7, "Oslash" -> 0xD8, "Ugrave" -> 0xD9,
      "Uacute" -> 0xDA, "Ucircumflex" -> 0xDB, "Udieresis" -> 0xDC,
      "Yacute" -> 0xDD, "Thorn" -> 0xDE, "germandbls" -> 0xDF,
      "agrave" -> 0xE0, "aacute" -> 0xE1, "acircumflex" -> 0xE2,
      "atilde" -> 0xE3, "adieresis" -> 0xE4, "aring" -> 0xE5, "ae" -> 0xE6,
      "ccedilla" -> 0xE7, "egrave" -> 0xE8, "eacute" -> 0xE9,
      "ecircumflex" -> 0xEA, "edieresis" -> 0xEB, "igrave" -> 0xEC,
      "iacute" -> 0xED, "icircumflex" -> 0xEE, "idieresis" -> 0xEF,
      "eth" -> 0xF0, "ntilde" -> 0xF1, "ograve" -> 0xF2, "oacute" -> 0xF3,
      "ocircumflex" -> 0xF4, "otilde" -> 0xF5, "odieresis" -> 0xF6,
      "divide" -> 0xF7, "oslash" -> 0xF8, "ugrave" -> 0xF9,
      "uacute" -> 0xFA, "ucircumflex" -> 0xFB, "udieresis" -> 0xFC,
      "yacute" -> 0xFD, "thorn" -> 0xFE, "ydieresis" -> 0xFF)
    latin1.foreach { case (n, c) => put(n, c) }
    // typographic / ligature / Latin-extended set
    val typo = Seq(
      "Euro" -> 0x20AC, "florin" -> 0x192, "quoteleft" -> 0x2018,
      "quoteright" -> 0x2019, "quotesinglbase" -> 0x201A,
      "quotedblleft" -> 0x201C, "quotedblright" -> 0x201D,
      "quotedblbase" -> 0x201E, "dagger" -> 0x2020, "daggerdbl" -> 0x2021,
      "bullet" -> 0x2022, "ellipsis" -> 0x2026, "perthousand" -> 0x2030,
      "guilsinglleft" -> 0x2039, "guilsinglright" -> 0x203A,
      "endash" -> 0x2013, "emdash" -> 0x2014, "trademark" -> 0x2122,
      "fraction" -> 0x2044, "minus" -> 0x2212, "fi" -> 0xFB01,
      "fl" -> 0xFB02, "OE" -> 0x152, "oe" -> 0x153, "Scaron" -> 0x160,
      "scaron" -> 0x161, "Ydieresis" -> 0x178, "Zcaron" -> 0x17D,
      "zcaron" -> 0x17E, "circumflex" -> 0x2C6, "tilde" -> 0x2DC,
      "breve" -> 0x2D8, "dotaccent" -> 0x2D9, "ring" -> 0x2DA,
      "ogonek" -> 0x2DB, "caron" -> 0x2C7, "hungarumlaut" -> 0x2DD,
      "dotlessi" -> 0x131, "Lslash" -> 0x141, "lslash" -> 0x142,
      "nbspace" -> 0xA0, "softhyphen" -> 0xAD)
    typo.foreach { case (n, c) => put(n, c) }
    m.result()
  }

  /** Resolve a glyph name per the AGL algorithm's text-font subset:
    * table lookup, then the `uniXXXX` (exactly 4 hex) and `uXXXX`–
    * `uXXXXXX` conventions. None = the name carries no public mapping
    * (subset-private `gNN` names, ornaments) — callers reject loudly.
    */
  def glyphToUnicode(name: String): Option[String] = agl.get(name).orElse {
    if (name.length == 7 && name.startsWith("uni") &&
        name.drop(3).forall(isHex))
      Some(new String(Character.toChars(Integer.parseInt(name.drop(3), 16))))
    else if (name.length >= 5 && name.length <= 7 && name.startsWith("u") &&
        name.drop(1).forall(isHex)) {
      val cp = Integer.parseInt(name.drop(1), 16)
      if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
        Some(new String(Character.toChars(cp)))
      else None
    } else None
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** Adobe StandardEncoding code → glyph NAME (Annex D.2's column;
    * unassigned codes absent). ASCII-identical for 0x20–0x7E except
    * quoteright (0x27) and quoteleft (0x60).
    */
  val standardEncodingNames: Map[Int, String] = {
    val m = Map.newBuilder[Int, String]
    val asciiNames = Array(
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent",
      "ampersand", "quoteright", "parenleft", "parenright", "asterisk",
      "plus", "comma", "hyphen", "period", "slash", "zero", "one", "two",
      "three", "four", "five", "six", "seven", "eight", "nine", "colon",
      "semicolon", "less", "equal", "greater", "question", "at")
    for (i <- asciiNames.indices) m += ((0x20 + i) -> asciiNames(i))
    for (c <- 'A' to 'Z') m += (c.toInt -> c.toString)
    m += (0x5B -> "bracketleft"); m += (0x5C -> "backslash")
    m += (0x5D -> "bracketright"); m += (0x5E -> "asciicircum")
    m += (0x5F -> "underscore"); m += (0x60 -> "quoteleft")
    for (c <- 'a' to 'z') m += (c.toInt -> c.toString)
    m += (0x7B -> "braceleft"); m += (0x7C -> "bar")
    m += (0x7D -> "braceright"); m += (0x7E -> "asciitilde")
    // high range (octal positions per Annex D.2)
    val high = Seq(
      0xA1 -> "exclamdown", 0xA2 -> "cent", 0xA3 -> "sterling",
      0xA4 -> "fraction", 0xA5 -> "yen", 0xA6 -> "florin",
      0xA7 -> "section", 0xA8 -> "currency", 0xA9 -> "quotesingle",
      0xAA -> "quotedblleft", 0xAB -> "guillemotleft",
      0xAC -> "guilsinglleft", 0xAD -> "guilsinglright", 0xAE -> "fi",
      0xAF -> "fl", 0xB1 -> "endash", 0xB2 -> "dagger",
      0xB3 -> "daggerdbl", 0xB4 -> "periodcentered", 0xB6 -> "paragraph",
      0xB7 -> "bullet", 0xB8 -> "quotesinglbase", 0xB9 -> "quotedblbase",
      0xBA -> "quotedblright", 0xBB -> "guillemotright", 0xBC -> "ellipsis",
      0xBD -> "perthousand", 0xBF -> "questiondown", 0xC1 -> "grave",
      0xC2 -> "acute", 0xC3 -> "circumflex", 0xC4 -> "tilde",
      0xC5 -> "macron", 0xC6 -> "breve", 0xC7 -> "dotaccent",
      0xC8 -> "dieresis", 0xCA -> "ring", 0xCB -> "cedilla",
      0xCD -> "hungarumlaut", 0xCE -> "ogonek", 0xCF -> "caron",
      0xD0 -> "emdash", 0xE1 -> "AE", 0xE3 -> "ordfeminine",
      0xE8 -> "Lslash", 0xE9 -> "Oslash", 0xEA -> "OE",
      0xEB -> "ordmasculine", 0xF1 -> "ae", 0xF5 -> "dotlessi",
      0xF8 -> "lslash", 0xF9 -> "oslash", 0xFA -> "oe",
      0xFB -> "germandbls")
    high.foreach(m += _)
    m.result()
  }

  /** code → Unicode for a NAMED base encoding. WinAnsi/MacRoman go
    * through the JDK charsets; StandardEncoding through the name table.
    * None for an unassigned code (callers reject loudly, naming it).
    */
  def baseEncodingChar(encoding: String, code: Int): Option[String] =
    encoding match {
      case "StandardEncoding" =>
        standardEncodingNames.get(code).flatMap(glyphToUnicode)
      case "WinAnsiEncoding" =>
        // cp1252's five unassigned slots decode to C1 controls in the
        // JDK — treat as unassigned, like Annex D does
        if (Set(0x81, 0x8D, 0x8F, 0x90, 0x9D).contains(code)) None
        else Some(new String(Array(code.toByte),
          java.nio.charset.Charset.forName("windows-1252")))
      case "MacRomanEncoding" =>
        Some(new String(Array(code.toByte),
          java.nio.charset.Charset.forName("x-MacRoman")))
      case other => None // MacExpert etc: caller rejects loudly
    }
}
