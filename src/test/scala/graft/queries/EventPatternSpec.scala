package graft.queries

import java.sql.Timestamp

import graft.SparkSuite

/** Fuzzes q_event_pattern's window decomposition (round-17
  * group-array sweep) against the ground truth it replaced: the
  * per-user code string matched by java.util.regex. The plan under
  * test never materializes a user's history; the reference here
  * deliberately does, so any divergence in the chained running-maxima
  * logic (armed-c / last-e comparisons, tie-breaks, the 40-char
  * head cap) shows up as a row diff.
  */
class EventPatternSpec extends SparkSuite {

  import spark.implicits._

  private val codes = "svcpe"

  private def run(tapes: Map[Long, String]): Unit = {
    val rng = new scala.util.Random(7)
    // shuffle rows globally so partition order never accidentally
    // matches event order; ts ties on adjacent pairs so the event_id
    // tie-break is load-bearing
    val rows = rng.shuffle(tapes.toSeq.flatMap { case (u, tape) =>
      tape.zipWithIndex.map { case (ch, i) =>
        (u, new Timestamp((i / 2) * 1000L), u * 100000L + i, ch.toString)
      }
    })
    val got = Advanced.eventPatternScan(
      rows.toDF("user_id", "ts", "event_id", "code"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3))))
      .toMap
    val want = tapes.collect { case (u, tape) if tape.nonEmpty =>
      u -> ((tape.length.toLong, tape.take(40),
        java.util.regex.Pattern.compile("v[^e]*c[^e]*p")
          .matcher(tape).find()))
    }
    assert(got == want)
  }

  test("matches java.util.regex on 200 random tapes") {
    val rng = new scala.util.Random(42)
    run((1L to 200L).map { u =>
      u -> Seq.fill(rng.nextInt(61))(codes(rng.nextInt(5))).mkString
    }.toMap)
  }

  test("edge tapes: empty, singletons, boundary matches, a whale") {
    val rng = new scala.util.Random(99)
    run(Map(
      1L -> "",            // no row at all -> no output row
      2L -> "v",
      3L -> "p",
      4L -> "vcp",         // minimal match
      5L -> "vcep",        // e between c and p kills it
      6L -> "vecp",        // e between v and c kills it
      7L -> "vcevcp",      // restart after kill
      8L -> "cpv",         // order matters
      9L -> "vvccpp",      // duplicates inside the span
      10L -> "e" * 50,     // all-error
      11L -> ("s" * 45 + "vcp"), // match past the 40-char head cap
      // a 5000-event whale with the match only at the tail (no 'p'
      // in the prefix alphabet, so no earlier match) — the shape the
      // collect_list form buffered whole
      12L -> (Seq.fill(4997)("svce"(rng.nextInt(4))).mkString + "vcp")))
  }
}
