package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.queries.Q

/** Training-data curation pipeline operators: JSON property
  * extraction, PII scrubbing (redaction + pseudonymization), and the
  * end-to-end document curation query combining quality scoring,
  * language gating, and exact-dedup canonicalization — the composite
  * every LLM data pipeline runs before tokenization. All per-row or
  * single-window — no extra shuffles beyond the dedup partition.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── JSON property extraction from event payloads ──
    // from_json with an explicit schema, not get_json_object: the
    // path-based extractor re-parses per call (~100µs/row measured);
    // the schema'd parse is one pass and plans into codegen.
    Q("q_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            from_json(col("props"), "k BIGINT", Map.empty[String, String])
              .getField("k").as("k"),
            col("event_type"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |event_type
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── PII scrub: redact numerics, pseudonymize the user key ──
    Q("q_pii_redact",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
            md5(col("user_id").cast("string")).as("pseudo_uid"))
          .orderBy("event_id"),
      Some("""SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
             |md5(CAST(user_id AS VARCHAR)) AS pseudo_uid
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── the curation composite: dedup-canonical + quality + lang gate ──
    Q("q_curation",
      (s, dir) => {
        val sw = TextAnalysis.stopwords.map("'" + _ + "'").mkString(",")
        val byContent = Window.partitionBy(md5(col("text")))
        t(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_words", expr("size(ws)").cast("long"))
          .withColumn("stop_ratio",
            expr(s"size(filter(ws, w -> w IN ($sw)))").cast("double") / col("n_words"))
          .withColumn("quality",
            expr("CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END") +
              col("stop_ratio") * 2.0)
          .withColumn("canonical",
            (col("doc_id") === min(col("doc_id")).over(byContent)).cast("int"))
          .withColumn("kept",
            (col("canonical") === 1 && col("quality") >= 0.7 &&
              col("lang").isin("en", "de", "es", "fr", "zh")).cast("int"))
          .select("doc_id", "n_words", "stop_ratio", "quality", "canonical", "kept")
          .orderBy("doc_id")
      },
      Some {
        val sw = TextAnalysis.stopwords.map("'" + _ + "'").mkString(",")
        s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
           |           FROM documents),
           |m AS (SELECT doc_id, lang, text,
           |  CAST(len(ws) AS BIGINT) AS n_words,
           |  CAST(len(list_filter(ws, w -> w IN ($sw))) AS DOUBLE) / len(ws)
           |    AS stop_ratio FROM t),
           |q AS (SELECT doc_id, lang, n_words, stop_ratio,
           |  (CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END + stop_ratio * 2.0)
           |    AS quality,
           |  CAST(doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS INT)
           |    AS canonical FROM m)
           |SELECT doc_id, n_words, stop_ratio, quality, canonical,
           |CAST(canonical = 1 AND quality >= 0.7
           |     AND lang IN ('en','de','es','fr','zh') AS INT) AS kept
           |FROM q ORDER BY doc_id""".stripMargin
      })
  )
}
