package graft.compile

import graft.SparkTestBase
import graft.config.PlaybookLoader

/** `source.streaming: true`: the playbook compiles over readStream →
  * writeStream (AvailableNow). Load-time validation must reject every
  * section without a streaming-executable form; the e2e run must
  * process a jsonl drop folder into parquet exactly once per file. */
class StreamingPlaybookSpec extends SparkTestBase {
  import spark.implicits._

  test("validation rejects non-streamable sections with reasons") {
    val yaml = """
      |source: {type: csv, file: /tmp/in.csv, streaming: true}
      |destination: {type: xlsx, file: /tmp/out.xlsx}
      |deduplication: {keys: [k], strategy: max, strategyField: v}
      |errorHandling: {mode: halt, errorFile: /tmp/errs.csv}
      |analytics:
      |  - {op: datasheet, sourceCol: s, langCol: l, textCol: t}
      |""".stripMargin
    val e = intercept[IllegalArgumentException](PlaybookLoader.fromString(yaml))
    val msg = e.getMessage
    assert(msg.contains("streaming source.type 'csv'"))
    assert(msg.contains("streaming destination.type 'xlsx'"))
    assert(msg.contains("checkpoint is required"))
    assert(msg.contains("strategy 'max' unsupported"))
    assert(msg.contains("mode must be 'skip'"))
    assert(msg.contains("errorFile is not supported"))
    assert(msg.contains("'datasheet' is not streaming-executable"))
  }

  test("streaming rejects window-derives and right/full joins at load, not at runtime") {
    val yaml = """
      |source: {type: parquet, file: /tmp/in.parquet, streaming: true}
      |destination: {type: parquet, file: /tmp/out, checkpoint: /tmp/ck}
      |errorHandling: {mode: skip}
      |analytics:
      |  - {op: derive, target: rk, expr: "row_number() OVER (PARTITION BY k ORDER BY v)"}
      |  - {op: join, type: parquet, file: /tmp/dim.parquet, keys: [k], how: full}
      |""".stripMargin
    val e = intercept[IllegalArgumentException](PlaybookLoader.fromString(yaml))
    assert(e.getMessage.contains("uses a window function"))
    assert(e.getMessage.contains("join how 'full' is not supported"))
  }

  test("jsonl drop folder -> quality gate + dedup + derive -> parquet, exactly once per file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = s"$tmp/in"
    new java.io.File(in).mkdirs()
    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        rows.mkString("\n").getBytes("UTF-8"))
    writeBatch("b1.jsonl", Seq(
      """{"doc_id": 1, "text": "The quick brown fox jumps over the lazy dog near the river bank."}""",
      """{"doc_id": 2, "text": "The quick brown fox jumps over the lazy dog near the river bank."}""",
      """{"doc_id": 3, "text": "zzzz"}"""))
    val yaml = s"""
      |source:
      |  type: jsonl
      |  file: $in
      |  streaming: true
      |destination:
      |  type: parquet
      |  file: $tmp/out
      |  checkpoint: $tmp/ckpt
      |errorHandling: {mode: skip}
      |analytics:
      |  - op: quality_gate
      |    textCol: text
      |    minQuality: 0.35
      |  - op: exact_dedup
      |    keys: [text]
      |  - op: derive
      |    target: n_chars
      |    expr: "length(text)"
      |""".stripMargin
    val cfg = s"$tmp/pb.yaml"
    java.nio.file.Files.write(java.nio.file.Paths.get(cfg), yaml.getBytes("UTF-8"))
    graft.cli.Main.run(spark, graft.cli.Main.Args(config = cfg))
    val out1 = spark.read.parquet(s"$tmp/out")
    // doc 3 fails the quality gate; doc 2 is a dup of doc 1
    assert(out1.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(out1.columns.contains("n_chars"))

    // a second invocation with a NEW drop file processes ONLY the new
    // file (checkpoint), and the dedup state carries across runs:
    // the re-sent dup text stays dropped, the new text lands
    writeBatch("b2.jsonl", Seq(
      """{"doc_id": 4, "text": "The quick brown fox jumps over the lazy dog near the river bank."}""",
      """{"doc_id": 5, "text": "A completely different sentence about shipping modes and freight costs."}"""))
    graft.cli.Main.run(spark, graft.cli.Main.Args(config = cfg))
    val out2 = spark.read.parquet(s"$tmp/out")
    assert(out2.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
  }
}
