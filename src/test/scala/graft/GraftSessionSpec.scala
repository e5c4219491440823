package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("low_memory profile: confs apply per-session and queries stay correct") {
    // the reference's low_memory flag (src/main.rs:699) — a session
    // profile here; newSession() isolates the SQLConf so the shared
    // test session keeps its defaults
    val lm = GraftSession.applyLowMemory(spark.newSession())
    GraftSession.lowMemoryConfs.foreach { case (k, v) =>
      assert(lm.conf.get(k) == v, s"$k must be $v in the low-memory profile")
    }
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") != "33554432",
      "profile must not leak into the base session")
    // same bytes in, same result out — the profile changes sizing, not
    // semantics
    val expected = operators.Relational.q1Agg(spark, sf).collect().map(_.toString).sorted
    val got = operators.Relational.q1Agg(lm, sf).collect().map(_.toString).sorted
    assert(got.sameElements(expected))
  }
}
