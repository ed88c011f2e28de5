package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Tables
import graft.queries.Q

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families over `documents`:
  *   - exact (content-hash group-by),
  *   - MinHash + LSH banding (shingle → minhash → band → bucket join),
  *   - SimHash (token-vote fingerprint),
  *   - n-gram Jaccard verification with equi-join blocking.
  *
  * Scale design: every candidate-generation step is an equi-join on a
  * deterministic bucket key (band signature / fingerprint / block key),
  * so at 100 TB each family is shuffle-on-key + per-bucket work — no
  * quadratic cross join anywhere. Hash functions are md5-based so the
  * DuckDB oracles compute bit-identical values.
  */
object Dedup {

  /** Distinct word-3-gram shingles of `text` as a Column.
    * 31-word vocabulary makes unigrams degenerate (every doc shares
    * most words); 3-gram shingles discriminate near-dups cleanly. */
  private val shinglesSql =
    "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> concat_ws(' ', element_at(split(text, ' '), i), " +
      "element_at(split(text, ' '), i + 1), element_at(split(text, ' '), i + 2))))"
  // DuckDB twin (1-based list indexing; range(1, n) = [1 .. n-1])
  private val shinglesDuck =
    "list_distinct(list_transform(range(1, greatest(len(ws) - 1, 2)), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** MinHash signature i: lexicographic min of md5("s<i>:" ++ shingle).
    * String-min over hex digests == min-hash with independent hash
    * fns; identical in Spark and DuckDB. */
  private def mh(i: Int): String =
    s"array_min(transform(gs, t -> md5(concat('s$i:', t)))) "
  private def mhDuck(i: Int): String =
    s"list_min(list_transform(gs, t -> md5('s$i:' || t)))"

  val nHashes = 8
  val nBands = 4 // bands of r=2 rows

  val queries: Seq[Q] = Seq(

    // ── exact dedup: content hash, keep lowest doc_id ──
    Q("q_dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy("h"),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_cnt
             |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin)),

    // ── MinHash + LSH: candidate near-dup pairs via band-bucket equi-join ──
    Q("q_dedup_minhash",
      (s, dir) => {
        val g = docs(s, dir).withColumn("gs", expr(shinglesSql))
        val sig = g.select(
          col("doc_id") +:
            (0 until nHashes).map(i => expr(mh(i)).as(s"m$i")): _*)
        val bands = sig.select(
            col("doc_id"),
            posexplode(array((0 until nBands).map(b =>
              md5(concat(col(s"m${2 * b}"), col(s"m${2 * b + 1}")))): _*)))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "sig"))
        val a = bands.as("a")
        val b = bands.as("b")
        a.join(b,
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
          .distinct()
          .orderBy("id1", "id2")
      },
      Some {
        val mhs = (0 until nHashes).map(i => s"${mhDuck(i)} AS m$i").mkString(", ")
        val bandList = (0 until nBands).map(b => s"md5(m${2 * b} || m${2 * b + 1})").mkString(", ")
        s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |g AS (SELECT doc_id, $shinglesDuck AS gs FROM tk),
           |mh AS (SELECT doc_id, $mhs FROM g),
           |bands AS (SELECT doc_id, unnest([$bandList]) AS sig,
           |          unnest(range($nBands)) AS band FROM mh)
           |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
           |ORDER BY id1, id2""".stripMargin
      }),

    // ── SimHash: 16-bit token-vote fingerprint, cluster by fingerprint ──
    Q("q_dedup_simhash",
      (s, dir) => {
        val bitExprs = (0 until 16).map { i =>
          // hex digit i of md5(token): odd → +1 vote, even → -1
          s"aggregate(ws, 0, (acc, t) -> acc + (CASE WHEN " +
            s"(instr('0123456789abcdef', substr(md5(t), ${i + 1}, 1)) - 1) % 2 = 1 " +
            s"THEN 1 ELSE -1 END))"
        }
        val fp = bitExprs.map(e => s"(CASE WHEN ($e) > 0 THEN '1' ELSE '0' END)")
          .mkString("concat(", ", ", ")")
        docs(s, dir)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("fp", expr(fp))
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
          .filter(col("n_docs") > 1)
          .orderBy("fp")
      },
      Some {
        val bitExprs = (0 until 16).map { i =>
          s"list_sum(list_transform(ws, t -> CASE WHEN " +
            s"(strpos('0123456789abcdef', substr(md5(t), ${i + 1}, 1)) - 1) % 2 = 1 " +
            s"THEN 1 ELSE -1 END))"
        }
        val fp = bitExprs.map(e => s"(CASE WHEN ($e) > 0 THEN '1' ELSE '0' END)")
          .mkString(" || ")
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |f AS (SELECT doc_id, $fp AS fp FROM t)
           |SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
           |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin
      }),

    // ── n-gram Jaccard: blocked pair join + exact set similarity ──
    // Blocking key (lang, n_chars div 100) keeps the join equi — lossy
    // at block boundaries by design; candidate count stays linear-ish.
    Q("q_dedup_ngram",
      (s, dir) => {
        val g = docs(s, dir)
          .withColumn("gs", expr(shinglesSql))
          .withColumn("blk", expr("n_chars div 100"))
          .select(col("doc_id"), col("lang"), col("blk"), col("gs"))
        val a = g.as("a")
        val b = g.as("b")
        a.join(b,
            col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
              col("a.doc_id") < col("b.doc_id"))
          .withColumn("inter",
            expr("size(array_intersect(a.gs, b.gs))"))
          .withColumn("jac",
            col("inter").cast("double") /
              (expr("size(a.gs)") + expr("size(b.gs)") - col("inter")))
          .filter(col("jac") >= 0.8)
          .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"), col("jac"))
          .orderBy("id1", "id2")
      },
      Some(
        s"""WITH tk AS (SELECT doc_id, lang, n_chars // 100 AS blk,
           |            string_split(text, ' ') AS ws FROM documents),
           |g AS (SELECT doc_id, lang, blk, $shinglesDuck AS gs FROM tk),
           |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
           |  len(list_filter(a.gs, x -> list_contains(b.gs, x))) AS inter,
           |  len(a.gs) AS la, len(b.gs) AS lb
           |  FROM g a JOIN g b
           |    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id)
           |SELECT id1, id2, CAST(inter AS DOUBLE) / (la + lb - inter) AS jac
           |FROM p WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.8
           |ORDER BY id1, id2""".stripMargin))
  )
}
