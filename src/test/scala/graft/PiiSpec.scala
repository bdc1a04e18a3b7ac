package graft

import org.apache.spark.sql.functions._

import graft.ext.Pii

/** The corpus fixture is PII-free (the oracled queries verify the
  * honest-zeros path); this spec drives the SAME column expressions
  * over constructed rows carrying every pattern plus decoys, so the
  * detection/redaction semantics are pinned, not just the plumbing. */
class PiiSpec extends SparkSpec {

  private def scanOne(text: String): Map[String, Long] = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .select(Pii.Patterns.map { case (name, pat, _) =>
        regexp_count(col("text"), lit(pat)).cast("long").as(name)
      }: _*).collect()(0)
    Pii.Patterns.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  private def redactOne(text: String): String = {
    import spark.implicits._
    val redacted = Pii.Patterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    Seq(text).toDF("text").select(redacted).collect()(0).getString(0)
  }

  test("each PII type is counted once and only once") {
    val m = scanOne("mail me at jo.doe+spam@ex-ample.co.uk or call " +
      "555-123-4567; host 10.0.255.1; ssn 123-45-6789.")
    assert(m == Map("email" -> 1L, "phone" -> 1L, "ip" -> 1L, "ssn" -> 1L), m)
  }

  test("decoys do not match: versions, dates, short digit runs, bare at-signs") {
    val m = scanOne("v1.2.3 shipped 2024-01-02, build 12-34, cost $1.234, " +
      "a@b, 1234.5678, 123-456-789")
    assert(m.values.sum == 0, m)
  }

  test("redaction replaces every span with its typed placeholder in fixed order") {
    val out = redactOne("ssn 123-45-6789 phone 555.123.4567 ip 8.8.8.8 " +
      "mail a_b%x@y.zz end")
    assert(out == "ssn <SSN> phone <PHONE> ip <IP> mail <EMAIL> end", out)
    // SSN applies before phone: the 3-2-4 shape must not be half-eaten
    assert(redactOne("123-45-6789") == "<SSN>")
    // an IP inside an email local/domain redacts deterministically
    assert(redactOne("user@192.168.1.1") == "user@<IP>")
  }

  test("scan and redact agree: has_pii == was_redacted on mixed rows") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean text no secrets"),
      (2L, "leak: root@box.example.org"),
      (3L, "double 1.2.3.4 and 5.6.7.8"),
      // length-preserving redaction: 'a@bb.co' and '<EMAIL>' are both
      // 7 chars — the content-based flag must still fire (the length-
      // based form this replaced reported false here)
      (4L, "a@bb.co")).toDF("doc_id", "text")
    val counts = df.select(col("doc_id"),
      Pii.Patterns.map { case (_, pat, _) =>
        regexp_count(col("text"), lit(pat)).cast("long")
      }.reduce(_ + _).as("n"))
    val red = df.select(col("doc_id"),
      (md5(Pii.Patterns.foldLeft(col("text")) {
        case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
      }) =!= md5(col("text"))).as("was_redacted"))
    val joined = counts.join(red, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) > 0, r.getBoolean(2))).toMap
    assert(joined == Map(1L -> (false, false), 2L -> (true, true),
      3L -> (true, true), 4L -> (true, true)), joined.toString)
  }
}
