package graft

import java.nio.file.{Files, Paths}

import graft.sources.EventsJson

/** JSON-lines source: declared-schema parse, corrupt-line routing,
  * clean/quarantine split covering the whole input.
  */
class EventsJsonSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.write(Paths.get(s"$dir/events.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("well-formed lines parse against the declared schema") {
    val dir = writeLines(Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00","user_id":7,"event_type":"click","value":1.5,"props":"{\"k\":1}"}""",
      """{"event_id":2,"ts":"2024-01-01T10:05:00.250","user_id":8,"event_type":"view","value":2.0,"props":null}"""))
    val df = EventsJson.read(spark, dir)
    val rows = df.collect()
    assert(rows.length == 2)
    // (can't filter on _corrupt_record alone pre-materialization:
    // Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN guard)
    assert(rows.forall(_.getAs[String]("_corrupt_record") == null))
    val r = rows.find(_.getAs[Long]("event_id") == 1L).get
    assert(r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[String]("event_type") == "click")
  }

  test("corrupt and identity-less lines quarantine; split covers input") {
    val dir = writeLines(Seq(
      """{"event_id":1,"ts":"2024-01-01T10:00:00","user_id":7,"event_type":"click","value":1.0,"props":null}""",
      """{this is not json at all""",
      """{"event_type":"view","value":3.0}""", // parses but no event_id/ts
      """{"event_id":4,"ts":"2024-01-01T11:00:00","user_id":9,"event_type":"view","value":4.0,"props":null}"""))
    val (clean, dead) = EventsJson.readWithQuarantine(spark, dir)
    assert(clean.count() == 2)
    assert(dead.count() == 2)
    assert(clean.columns.toSeq.contains("_corrupt_record") == false)
    val raws = dead.collect().map(_.getString(0))
    assert(raws.exists(_.contains("not json")), "raw corrupt line must be preserved for replay")
  }
}
