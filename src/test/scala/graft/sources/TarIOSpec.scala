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
    val entries = readTar(fixture("shard.tar"))
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

  test("skips pax extension members (the 'x' type) in a PAX fixture") {
    val entries = readTar(fixture("shard_pax.tar"))
    assert(entries.map(_.name) == Seq("samples/0000.jpg"))
    assert(entries.head.bytes.length == 300)
  }

  test("long paths resolve through the USTAR prefix field") {
    val entries = readTar(fixture("shard_prefix.tar"))
    assert(entries.size == 1)
    assert(entries.head.name ==
      Seq.fill(18)("deeply").mkString("/") + "/sample.bin",
      s"prefix-joined name wrong: ${entries.head.name}")
    assert(entries.head.bytes.length == 64)
  }

  test("round trip, incl. zero-length and block-boundary sizes") {
    val items = Seq(
      "a.bin" -> Array.tabulate[Byte](511)(_.toByte),
      "b.bin" -> Array.tabulate[Byte](512)(_.toByte),
      "c.bin" -> Array.tabulate[Byte](513)(_.toByte),
      "empty.bin" -> Array.empty[Byte],
      "d.bin" -> Array.tabulate[Byte](7)(i => (i * 3).toByte))
    val got = readTar(writeTar(items))
    assert(got.map(_.name) == items.map(_._1))
    for ((e, (_, want)) <- got.zip(items))
      assert(e.bytes.sameElements(want), s"${e.name} payload diverged")
  }

  test("malformed archives fail loudly") {
    val good = writeTar(Seq("x.bin" -> Array.tabulate[Byte](100)(_.toByte)))
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](readTar(b))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    val flipped = good.clone(); flipped(0) = 'y' // name byte -> checksum off
    bad(flipped, "checksum mismatch")
    bad(good.take(512 + 50), "data truncated")
    bad(good.dropRight(512), "single zero block")
    bad(good.take(100), "truncated header")
    val link = good.clone(); link(156) = '2' // symlink type
    // re-stamp the checksum so the TYPE is what fails, not the sum
    def restamp(h: Array[Byte]): Unit = {
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      for (i <- 0 until 512) sum += h(i) & 0xff
      val cs = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
    }
    restamp(link)
    bad(link, "unsupported tar entry type '2'")
  }
}
