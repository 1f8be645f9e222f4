package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The bench self-vet reads the prior round's per-query times out of the
  * driver's BENCH_r*.json wrapper. Round 10's vet silently ran on an empty
  * prior map because the wrapper's "parsed" was null and the only copy of
  * the metric line was the backslash-escaped (and front-truncated) "tail"
  * string — these pins feed priorBench's parser exactly that shape.
  */
class BenchPriorSpec extends AnyFunSuite {

  private def tempFile(content: String): java.io.File = {
    val f = Files.createTempFile("bench_prior", ".json").toFile
    f.deleteOnExit()
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    f
  }

  // A faithful miniature of BENCH_r09.json: parsed is null, the tail is a
  // JSON-escaped metric line whose FRONT is truncated (starts mid-token at
  // `metric\":` — no opening `{"`), and the wrapper's own "sf" is a number.
  private val wrapperParsedNull =
    """{
      |  "n": 9,
      |  "rc": 0,
      |  "cpus": 32,
      |  "sf": 0.1,
      |  "tail": "metric\":\"total\",\"value\":3.5,\"unit\":\"sec\",\"queries\":{\"q1_pricing_summary\":1.25,\"q9_ngram_neardup\":2.25},\"sf\":\"/root/testdata/sf0.1\"",
      |  "parsed": null
      |}""".stripMargin

  test("wrapper with parsed:null and escaped truncated tail still yields the queries map") {
    val f = tempFile(wrapperParsedNull)
    val m = Bench.parsePriorFile(f, "sf0.1")
    assert(m === Some(Map("q1_pricing_summary" -> 1.25, "q9_ngram_neardup" -> 2.25)))
  }

  test("wrapper with parsed:null is skipped when the recorded sf differs") {
    val f = tempFile(wrapperParsedNull)
    assert(Bench.parsePriorFile(f, "sf1") === None)
  }

  test("wrapper with a non-null parsed object uses it directly") {
    val f = tempFile(
      """{"n": 10, "rc": 0, "sf": 0.1,
        | "tail": "{\"metric\":\"total\",\"value\":9.9,\"queries\":{\"q1_pricing_summary\":9.9},\"sf\":\"/root/testdata/sf0.1\"}",
        | "parsed": {"metric": "total", "value": 2.0, "unit": "sec",
        |   "queries": {"q1_pricing_summary": 0.5, "q2_window_agg": 1.5},
        |   "sf": "/root/testdata/sf0.1"}}""".stripMargin)
    val m = Bench.parsePriorFile(f, "sf0.1")
    assert(m === Some(Map("q1_pricing_summary" -> 0.5, "q2_window_agg" -> 1.5)))
  }

  test("tail with log-noise prefix before the metric line parses") {
    val f = tempFile(
      """{"sf": 0.1, "parsed": null,
        | "tail": "WARN something replaced a previously registered function.\n{\"metric\":\"total\",\"value\":1.0,\"unit\":\"sec\",\"queries\":{\"q3_topn\":0.75},\"sf\":\"/data/sf0.1\"}"}""".stripMargin)
    assert(Bench.parsePriorFile(f, "sf0.1") === Some(Map("q3_topn" -> 0.75)))
  }

  test("revetted suffix after the queries object does not leak into the map") {
    val f = tempFile(
      """{"sf": 0.1, "parsed": null,
        | "tail": "{\"metric\":\"total\",\"value\":1.0,\"unit\":\"sec\",\"queries\":{\"q3_topn\":0.75},\"sf\":\"/data/sf0.1\",\"revetted\":{\"q3_topn\":{\"first\":3.0,\"vetted\":0.8,\"prior\":0.7}}}"}""".stripMargin)
    assert(Bench.parsePriorFile(f, "sf0.1") === Some(Map("q3_topn" -> 0.75)))
  }

  test("a plain self-written metric line (no wrapper) parses") {
    val f = tempFile(
      """{"metric":"total","value":2.0,"unit":"sec","queries":{"q1_pricing_summary":2.0},"sf":"/root/testdata/sf0.01"}""")
    assert(Bench.parsePriorFile(f, "sf0.01") ===
      Some(Map("q1_pricing_summary" -> 2.0)))
  }

  test("unparseable junk yields None, not a crash") {
    assert(Bench.parsePriorFile(tempFile("not json at all"), "sf0.1") === None)
    assert(Bench.parsePriorFile(
      new java.io.File("/nonexistent/bench.json"), "sf0.1") === None)
  }

  test("final metric line stays compact even with a full-suite revet") {
    // BENCH_r11 shipped parsed:null because the revet blob was appended to
    // the single metric line and pushed its front out of the driver's
    // tail-capture window. The revet record is now its OWN earlier line;
    // the final line must stay under ~2 KB for the full 57-query suite.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> 123.45678901234567)
    val line = Bench.metricLine(results, "/root/testdata/sf0.1")
    assert(line.length < 2048, s"metric line is ${line.length} B")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(!line.contains("revetted"))
    // the compact line still round-trips through the prior-bench parser
    val m = Bench.extractQueries(line, "sf0.1")
    assert(m.exists(_.size == names.size))
    assert(m.get(names.head) === 123.4568)
    // and the separate revet line is valid single-line JSON
    val revet = Bench.revetLine(names.map(n => (n, 3.0, 0.8, 0.7)))
    assert(!revet.contains("\n"))
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(revet)
    assert(tree.get("metric").asText() === "revetted")
    assert(tree.get("entries").size() === names.size)
  }

  test("the real BENCH_r09.json (the round-10 casualty) now yields a prior map") {
    // Regression pin against the actual artifact that disabled the vet.
    val f = new java.io.File("BENCH_r09.json")
    if (f.isFile) {
      val m = Bench.parsePriorFile(f, "sf0.1")
      assert(m.nonEmpty, "BENCH_r09.json should now be readable")
      assert(m.get.contains("q9_ngram_neardup"))
    }
  }
}
