package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 verdict item 4: restoring a pre-`lateAge` (state schema
  * v1) sessionizer checkpoint fails Spark's state-store schema check
  * with a raw STATE_STORE_*_SCHEMA_NOT_COMPATIBLE; the diagnosis
  * helper must map that — anywhere in the cause chain, however the
  * streaming runtime wraps it — to an error naming the documented
  * migration rule, and must leave every other failure untouched. Pure
  * exception-mapping logic, so no SparkSession needed. */
class StateSchemaDiagnosisSpec extends AnyFunSuite {

  test("a SparkThrowable with the state-schema condition is renamed, nested or not") {
    // same error condition + message template Spark's
    // StateSchemaCompatibilityChecker raises on a v1-checkpoint restore
    val raw = new org.apache.spark.SparkException(
      "STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE",
      Map("storedValueSchema" -> "STRUCT<cur: STRUCT<...>, late: STRUCT<...>>",
        "newValueSchema" ->
          "STRUCT<cur: STRUCT<...>, late: STRUCT<...>, lateAge: INT>"),
      null)
    for (t <- Seq[Throwable](raw,
        new RuntimeException("query terminated",
          new RuntimeException("wrapped", raw)))) {
      val out = EventStream.diagnoseStateRestore(t)
      assert(out.isInstanceOf[IllegalStateException])
      assert(out.getMessage.contains("state schema is v2"))
      assert(out.getMessage.contains("delete the checkpoint directory"))
      assert(out.getMessage.contains("SURVEY.md"))
      // the original failure stays attached for debugging
      def chain(x: Throwable): List[Throwable] =
        if (x == null) Nil else x :: chain(x.getCause)
      assert(chain(out).contains(raw))
    }
  }

  test("message-shaped detection covers runtimes that re-wrap without SparkThrowable") {
    val t = new RuntimeException(
      "Provided key schema does not match existing state key schema.")
    val out = EventStream.diagnoseStateRestore(new RuntimeException("outer", t))
    assert(out.isInstanceOf[IllegalStateException])
  }

  test("unrelated failures pass through unchanged") {
    val boom = new RuntimeException("disk full",
      new java.io.IOException("No space left on device"))
    assert(EventStream.diagnoseStateRestore(boom) eq boom)
    // even a cyclic cause chain must not hang the walk
    class Cyclic extends RuntimeException("a")
    val a = new Cyclic
    val b = new RuntimeException("b", a)
    a.initCause(b)
    assert(EventStream.diagnoseStateRestore(a) eq a)
  }
}
