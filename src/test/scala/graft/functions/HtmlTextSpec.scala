package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import HtmlText._

class HtmlTextSpec extends AnyFunSuite with graft.SparkSpec {

  test("basic extraction: tags separate, whitespace collapses, head drops") {
    val r = extract(
      "<html><head><title>T</title></head><body><p>hello</p><p>world</p></body></html>")
    assert(r.clean_text == "hello world")
    assert(r.tag_count == 4)
    assert(r.n_links == 0)
  }

  test("script/style content is opaque, including '<' and quotes") {
    val r = extract(
      """<body><script>var a = 1 < 2 && "</p>" + '<div>';</script>
        |<style>p { content: "<"; }</style><p>kept</p></body>""".stripMargin)
    assert(r.clean_text == "kept")
  }

  test("boilerplate elements drop from clean text, count toward metrics") {
    val r = extract(
      """<body><nav><a href="/">Home</a> <a href="/x">More stuff</a></nav>
        |<p>real content</p><footer>fine print</footer></body>""".stripMargin)
    assert(r.clean_text == "real content")
    assert(r.n_links == 2)
    assert(r.link_chars == "Home More stuff".length)
    assert(r.visible_chars == "Home More stuff real content fine print".length)
  }

  test("nested same-name boilerplate is skipped to the MATCHING close") {
    val r = extract(
      "<body><nav>a<nav>b</nav>c</nav><p>kept</p></body>")
    assert(r.clean_text == "kept")
  }

  test("entities decode: named, decimal, hex; unknown stays literal") {
    val r = extract(
      "<body>&amp; &lt;x&gt; &#116;ea &#x41; &copy; &nbsp; &bogus; a&b</body>")
    assert(r.clean_text == "& <x> tea A © &bogus; a&b")
  }

  test("comments skipped; quoted '>' inside attributes does not close a tag") {
    val r = extract(
      """<body><!-- <p>not text</p> --><div data-x="a>b"><p>kept</p></div></body>""")
    assert(r.clean_text == "kept")
    assert(r.tag_count == 4)
  }

  test("no <body>: whole document scans") {
    assert(extract("<p>bare</p> fragment").clean_text == "bare fragment")
  }

  test("malformed documents fail loudly") {
    intercept[IllegalArgumentException](extract("<body><p>x</body>".substring(0, 12)))
    intercept[IllegalArgumentException](extract("<body><script>x</body>"))
    intercept[IllegalArgumentException](extract("<body><nav>x</body>"))
    intercept[IllegalArgumentException](extract("<body><!-- x</body>"))
    intercept[IllegalArgumentException](extract("<body"))
  }

  test("fixture round trip: extraction reproduces the source text exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over seven lazy dogs again and again"),
      (1L, "one two three four five six seven eight"),
      (7L, "a b c d e f g h i j k l m n o p q r s t u")
    ).toDF("doc_id", "text")
    val out = extractAll(documentsAsHtml(docs)).collect()
      .map(r => r.doc_id -> r).toMap
    for ((id, text) <- Seq(
        0L -> "the quick brown fox jumps over seven lazy dogs again and again",
        1L -> "one two three four five six seven eight",
        7L -> "a b c d e f g h i j k l m n o p q r s t u")) {
      val r = out(id)
      assert(r.clean_text == text, s"doc $id text diverged")
      val odd = (id % 2).toInt
      assert(r.n_links == 2 + 2 * odd, s"doc $id n_links")
      assert(r.tag_count == 12 + 6 * odd, s"doc $id tag_count")
      assert(r.link_chars == 20 + 10 * odd, s"doc $id link_chars")
      assert(r.visible_chars == text.length + 41 + 10 * odd,
        s"doc $id visible_chars")
    }
  }
}
