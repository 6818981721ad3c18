package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.warc.TarIO
import TarIO._

/** TarIO pins. The golden fixtures under fixtures/tar_golden are written
  * by Python's INDEPENDENT stdlib tarfile (tools/gen_tar_fixture.py) —
  * USTAR and PAX variants — so the reader is checked against bytes it
  * did not produce; the writer's bytes round-trip through the reader and
  * replicate the independent writer's member payloads exactly.
  */
class TarIOSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/tar_golden", name))

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  test("reads the independent (python tarfile) USTAR fixture exactly") {
    val entries = readTar(fixture("shard.tar")).toSeq
    val manifest = new String(fixture("manifest.json"), "UTF-8")
    val entryRe =
      """"name": "([^"]+)",\s*"size": (\d+),\s*"sha256": "([0-9a-f]+)"""".r
    val want = entryRe.findAllMatchIn(manifest)
      .map(m => (m.group(1), m.group(2).toInt, m.group(3))).toSeq
    assert(want.size == 10, s"manifest parse found ${want.size} entries")
    // 10 file members (5 jpg + 5 json); the directory member is skipped
    assert(entries.map(e => (e.name, e.bytes.length, sha256(e.bytes))) == want)
    // WebDataset pairing: adjacent members share the sample key
    val stems = entries.map(_.name.replaceAll("\\.(jpg|json)$", ""))
    assert(stems.grouped(2).forall(g => g.head == g(1)))
  }

  test("pax 'x' members without a path override are consumed, not surfaced") {
    val entries = readTar(fixture("shard_pax.tar")).toSeq
    assert(entries.map(_.name) == Seq("samples/0000.jpg"))
    assert(entries.head.bytes.length == 300)
  }

  test("long paths resolve through the USTAR prefix field") {
    val entries = readTar(fixture("shard_prefix.tar")).toSeq
    assert(entries.size == 1)
    assert(entries.head.name ==
      Seq.fill(18)("deeply").mkString("/") + "/sample.bin",
      s"prefix-joined name wrong: ${entries.head.name}")
    assert(entries.head.bytes.length == 64)
  }

  test("pax 'path=' override resolves names beyond the USTAR 100+155 " +
      "limits, and applies to exactly ONE following member") {
    val wantName = new String(fixture("paxlong_name.txt"), "UTF-8")
    assert(wantName.length > 255, "fixture name must exceed name+prefix capacity")
    val entries = readTar(fixture("shard_paxlong.tar")).toSeq
    assert(entries.map(_.name) == Seq(wantName, "after.bin"),
      s"got ${entries.map(_.name.take(40))}")
    assert(entries.head.bytes.length == 200)
    assert(entries(1).bytes.length == 32)
  }

  test("GNU 'L' longname members resolve the next member's name, and " +
      "apply to exactly ONE following member") {
    val wantName = new String(fixture("gnulong_name.txt"), "UTF-8")
    assert(wantName.length > 100, "fixture name must exceed the name field")
    val entries = readTar(fixture("shard_gnulong.tar")).toSeq
    assert(entries.map(_.name) == Seq(wantName, "short.bin"),
      s"got ${entries.map(_.name.take(40))}")
    assert(entries.head.bytes.length == 96)
    assert(entries(1).bytes.length == 48)
  }

  test("the walk is an ITERATOR: entries before a corrupt tail are " +
      "served lazily; the corruption only fails when reached") {
    val items = (0 until 6).map(i => s"m$i.bin" -> Array.fill[Byte](600)(i.toByte))
    val good = writeTar(items)
    // corrupt the 5th member's header checksum (members are 512 header
    // + 1024 data = 1536 bytes each)
    val corrupt = good.clone()
    corrupt(4 * 1536) = (corrupt(4 * 1536) ^ 1).toByte
    val it = readTar(corrupt)
    for (i <- 0 until 4)
      assert(it.next().name == s"m$i.bin", "good prefix must be served")
    val e = intercept[IllegalArgumentException](it.hasNext)
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("round trip, incl. zero-length and block-boundary sizes") {
    val items = Seq(
      "a.bin" -> Array.tabulate[Byte](511)(_.toByte),
      "b.bin" -> Array.tabulate[Byte](512)(_.toByte),
      "c.bin" -> Array.tabulate[Byte](513)(_.toByte),
      "empty.bin" -> Array.empty[Byte],
      "d.bin" -> Array.tabulate[Byte](7)(i => (i * 3).toByte))
    val got = readTar(writeTar(items)).toSeq
    assert(got.map(_.name) == items.map(_._1))
    for ((e, (_, want)) <- got.zip(items))
      assert(e.bytes.sameElements(want), s"${e.name} payload diverged")
  }

  private def restamp(h: Array[Byte], off: Int): Unit = {
    java.util.Arrays.fill(h, off + 148, off + 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += h(off + i) & 0xff
    val cs = "%06o".format(sum).getBytes("US-ASCII")
    System.arraycopy(cs, 0, h, off + 148, 6)
    h(off + 154) = 0; h(off + 155) = ' '
  }

  test("a GLOBAL pax 'path' override ('g' member) is rejected loudly") {
    val paxBody = {
      val rec = " path=evil/name.bin\n"
      val len = rec.length + 2 // two length digits
      s"$len$rec".getBytes("UTF-8")
    }
    val asFile = writeTar(Seq("g.pax" -> paxBody))
    val tar = asFile.clone()
    tar(156) = 'g'
    restamp(tar, 0)
    val e = intercept[IllegalArgumentException](readTar(tar).toSeq)
    assert(e.getMessage.contains("global pax 'path'"), e.getMessage)
  }

  test("a dangling pax override (no following member) is a framing error") {
    val paxBody = {
      val rec = " path=orphan.bin\n"
      val len = rec.length + 2
      s"$len$rec".getBytes("UTF-8")
    }
    val asFile = writeTar(Seq("x.pax" -> paxBody))
    val tar = asFile.clone()
    tar(156) = 'x'
    restamp(tar, 0)
    val e = intercept[IllegalArgumentException](readTar(tar).toSeq)
    assert(e.getMessage.contains("no following member"), e.getMessage)
  }

  test("malformed archives fail loudly") {
    val good = writeTar(Seq("x.bin" -> Array.tabulate[Byte](100)(_.toByte)))
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](readTar(b).toSeq)
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    val flipped = good.clone(); flipped(0) = 'y' // name byte -> checksum off
    bad(flipped, "checksum mismatch")
    bad(good.take(512 + 50), "data truncated")
    bad(good.dropRight(512), "single zero block")
    bad(good.take(100), "truncated header")
    val link = good.clone(); link(156) = '2' // symlink type
    // re-stamp the checksum so the TYPE is what fails, not the sum
    restamp(link, 0)
    bad(link, "unsupported tar entry type '2'")
    // a malformed pax payload is a parse error, not a silent skip
    val badPax = good.clone(); badPax(156) = 'x'
    restamp(badPax, 0)
    bad(badPax, "bad pax record")
  }
}
