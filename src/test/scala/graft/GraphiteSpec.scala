package graft

import org.apache.spark.sql.functions._
import graft.graphite.Graphite

class GraphiteSpec extends SparkSpec {

  private def frame = {
    val s = spark
    import s.implicits._
    Seq(
      ("events.a.user1", 0L, 10.0), ("events.a.user1", 3600L, 15.0),
      ("events.a.user1", 7200L, 12.0),
      ("events.b.user2", 0L, 100.0), ("events.b.user2", 3600L, 50.0))
      .toDF("path", "bucket_s", "value")
  }

  test("derivative and nonNegativeDerivative handle resets") {
    val d = Graphite.derivative(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(d(("events.a.user1", 3600L)).contains(5.0))
    assert(d(("events.b.user2", 3600L)).contains(-50.0))
    val nn = Graphite.nonNegativeDerivative(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(nn(("events.b.user2", 3600L)).isEmpty, "reset must yield null")
  }

  test("aliasByNode keeps the requested path segments") {
    val a = Graphite.aliasByNode(frame, 1, 2).select("path").distinct()
      .collect().map(_.getString(0)).toSet
    assert(a == Set("a.user1", "b.user2"))
  }

  test("integral is a per-series running sum") {
    val i = Graphite.integral(frame).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(i(("events.a.user1", 7200L)) == 37.0)
  }

  test("highestMax keeps exactly the top-n series") {
    val top = Graphite.highestMax(frame, 1).select("path").distinct()
      .collect().map(_.getString(0)).toSet
    assert(top == Set("events.b.user2"))
  }
}
