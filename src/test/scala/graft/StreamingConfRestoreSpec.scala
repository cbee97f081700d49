package graft

/** Pins r15 verdict #1: q_stream_interval_join disables
  * `noDataMicroBatches` for its own run but MUST restore the session
  * conf afterward — Verify/RunQuery/CountAudit share one session
  * across gates, and a leaked `false` silently drops the final
  * timeout-fired sessions of the flatMapGroupsWithState gates
  * (q_stream_session_state / q_stream_stateful_swa) run after it.
  */
class StreamingConfRestoreSpec extends SparkTestBase {
  private val key = "spark.sql.streaming.noDataMicroBatches.enabled"
  private val gate = SparkEntry.queries("q_stream_interval_join")

  test("interval-join gate leaves noDataMicroBatches at its default") {
    val sess = spark.newSession()
    // getOption reports the registered DEFAULT for defined entries, so
    // "restored" is observable as the default value, not as absence
    assert(sess.conf.get(key) == "true",
      "precondition: fresh session sees the Spark default (true)")
    val rows = gate(sess, sf).count()
    assert(rows > 0, "gate should produce interval-join matches")
    assert(sess.conf.get(key) == "true",
      "gate must restore the conf it set to false for its own run")
  }

  test("interval-join gate restores an explicitly-set conf value") {
    val sess = spark.newSession()
    sess.conf.set(key, "true")
    gate(sess, sf).count()
    assert(sess.conf.getOption(key).contains("true"),
      "gate must restore the pre-run value")
  }
}
