package graft.dedup

import graft.Tables
import graft.functions.GraftFunctions._
import graft.queries.CoreQueries.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operator family for LLM-training-data pipelines:
  * exact (hash-group), MinHash+LSH banding, 16-bit SimHash, and n-gram
  * Jaccard — all as pure Catalyst expressions over the `documents`
  * table, each with a DuckDB oracle built on the same md5-derived
  * hashing so results are verifiable bit-for-bit.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup is a single hash-aggregate on md5(text) — one shuffle,
  *    map-side partial aggregation, no data skew (md5 is uniform).
  *  - MinHash/LSH: signature computation is embarrassingly parallel
  *    (per-row expressions); the candidate join shuffles on band value,
  *    whose cardinality is huge and uniform — joins stay balanced. Only
  *    candidate PAIRS (a tiny fraction) reach the exact-Jaccard verify.
  *  - SimHash groups by a 16-bit key here (demo cardinality); widen to
  *    64-bit + hamming-ball probing for production scale.
  */
object DedupQueries {

  private val dups = "/root/testdata" // doc substrate is `documents`

  val all: Seq[Q] = Seq(

    // exact dedup: keep the lowest doc_id per identical text
    Q("q_dedup_exact",
      (s, d) => Tables.load(s, d, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id"),
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
             |count(*) AS n_copies
             |FROM documents GROUP BY md5(text)
             |ORDER BY keep_id""".stripMargin)),

    // MinHash(8 hashes, 4 bands of 2) + LSH bucket join + exact Jaccard
    // verify at >= 0.3 — integer cross-multiplication avoids any float.
    //
    // Implementation is fully ROW-BASED (posexplode + window leads +
    // aggregate mins + equi-joins): array higher-order functions don't
    // participate in codegen or common-subexpression elimination, so an
    // array-lambda formulation re-runs split(text) per element (O(n^2)
    // per doc) and re-inlines md5 per signature slot. Rows of
    // (doc_id, shingle) keep every hash single-pass AND are the shape
    // that scales: shuffles on uniform keys, partial aggregation
    // everywhere, no wide arrays crossing joins.
    Q("q_dedup_minhash_lsh",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("doc_id").orderBy("pos")
        // distinct 3-token shingles as rows, one split per doc
        val shRows = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
          .withColumn("t1", lead(col("tok"), 1).over(w))
          .withColumn("t2", lead(col("tok"), 2).over(w))
          .filter(col("t2").isNotNull)
          .select(col("doc_id"),
            concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
          .distinct()
        // signature: md5 once per shingle row, 8 slice-mins per doc
        val sig = shRows
          .withColumn("h", md5(col("sh")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n"),
            (0 until 8).map(j =>
              min(col("h").substr(j * 4 + 1, 4)).as(s"m$j")): _*)
        val bands = sig.select(col("doc_id"), col("n"),
          explode(array((0 until 4).map(j =>
            concat(col(s"m${2 * j}"), col(s"m${2 * j + 1}"))): _*)).as("band"))
        val a = bands.select(col("doc_id").as("a_id"), col("n").as("a_n"),
          col("band").as("a_band"))
        val b = bands.select(col("doc_id").as("b_id"), col("n").as("b_n"),
          col("band").as("b_band"))
        val cand = a.join(b, col("a_band") === col("b_band") &&
            col("a_id") < col("b_id") &&
            // size prefilter: jaccard >= 0.3 bounds the size ratio
            col("a_n") * 10 >= col("b_n") * 3 &&
            col("b_n") * 10 >= col("a_n") * 3)
          .select("a_id", "b_id", "a_n", "b_n").distinct()
        // exact-Jaccard verify as a sparse join: shared-shingle counts
        val sa = shRows.select(col("doc_id").as("a_id"), col("sh"))
        val sb = shRows.select(col("doc_id").as("b_id"), col("sh"))
        cand.join(sa, "a_id")
          .join(sb, Seq("b_id", "sh"))
          .groupBy("a_id", "b_id", "a_n", "b_n")
          .agg(count(lit(1)).as("inter"))
          .withColumn("uni", col("a_n") + col("b_n") - col("inter"))
          .filter(col("inter") * 10 >= col("uni") * 3)
          .select("a_id", "b_id", "inter", "uni")
          .orderBy("a_id", "b_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |sh AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(1, greatest(len(tk) - 1, 1)),
             |    i -> array_to_string(tk[i:i+2], ' '))) AS sh
             |  FROM toks WHERE len(tk) >= 3),
             |mh AS (
             |  SELECT doc_id, sh, list_transform(range(0, 8), k ->
             |    list_aggregate(list_transform(
             |      list_transform(sh, s -> md5(s)),
             |      m -> substr(m, CAST(k * 4 + 1 AS INT), 4)), 'min')
             |  ) AS sig FROM sh),
             |bands AS (
             |  SELECT doc_id, sh,
             |    unnest(list_transform(range(0, 4),
             |      j -> sig[2*j+1] || sig[2*j+2])) AS band
             |  FROM mh),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             |    CAST(len(a.sh) + len(b.sh) AS BIGINT) AS sz
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.doc_id < b.doc_id
             |    AND len(a.sh) * 10 >= len(b.sh) * 3
             |    AND len(b.sh) * 10 >= len(a.sh) * 3)
             |SELECT a_id, b_id, inter, sz - inter AS uni FROM cand
             |WHERE inter * 10 >= (sz - inter) * 3
             |ORDER BY a_id, b_id""".stripMargin)),

    // 16-bit SimHash per doc + bucket sizes (hamming-0 near-dup groups).
    // Row-based: one md5 per distinct token (the simhash16 HOF helper
    // would recompute tokenization and md5 for each of the 16 bits),
    // then 16 conditional-count aggregates vote the bits.
    Q("q_dedup_simhash",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.load(s, d, "documents")
          .select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
          .withColumn("h", md5(col("tok")))
        val perDoc = toks.groupBy("doc_id")
          .agg(count(lit(1)).as("n"),
            (0 until 16).map(k =>
              sum(when(col("h").substr(k + 1, 1) >= "8", 1L).otherwise(0L))
                .as(s"c$k")): _*)
        val simhash = (0 until 16).map(k =>
          when(col(s"c$k") * 2 >= col("n"), lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _)
        perDoc.select(col("doc_id"), simhash.as("simhash"))
          .withColumn("bucket_size",
            count(lit(1)).over(Window.partitionBy("simhash")))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, simhash,
             |count(*) OVER (PARTITION BY simhash) AS bucket_size FROM (
             |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), k ->
             |    CASE WHEN 2 * len(list_filter(tk,
             |        t -> substr(md5(t), CAST(k + 1 AS INT), 1) >= '8'))
             |      >= len(tk)
             |    THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS simhash
             |  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
             |        FROM documents) d) t
             |ORDER BY doc_id""".stripMargin)),

    // n-gram (token-set) Jaccard near-dup, blocked by `source` so the
    // pairwise compare never goes quadratic in the corpus — the blocking
    // key is the unit of parallelism at scale
    Q("q_dedup_ngram_jaccard",
      (s, d) => {
        // sparse-vector formulation: explode distinct tokens, equi-join
        // on (source, token), count shared tokens per pair with a hash
        // aggregate. No arrays cross the join (a pairwise array_intersect
        // would re-tokenize per PAIR once Catalyst inlines the
        // projections into the join condition) and the whole thing is
        // shuffle + partial-aggregate — the shape that survives 100 TB.
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), tokenSet(col("text")).as("tk"))
          .withColumn("n", size(col("tk")).cast(LongType))
        val t = docs.select(col("doc_id"), col("source"), col("n"),
          explode(col("tk")).as("token"))
        val ta = t.select(col("source").as("a_src"), col("token").as("a_tok"),
          col("doc_id").as("a_id"), col("n").as("a_n"))
        val tb = t.select(col("source").as("b_src"), col("token").as("b_tok"),
          col("doc_id").as("b_id"), col("n").as("b_n"))
        ta.join(tb, col("a_src") === col("b_src") &&
            col("a_tok") === col("b_tok") &&
            col("a_id") < col("b_id") &&
            // size prefilter: jaccard >= 0.95 needs near-equal set sizes
            col("a_n") * 100 >= col("b_n") * 95 &&
            col("b_n") * 100 >= col("a_n") * 95)
          .groupBy("a_id", "b_id", "a_n", "b_n")
          .agg(count(lit(1)).as("inter"))
          .withColumn("uni", col("a_n") + col("b_n") - col("inter"))
          .filter(col("inter") * 100 >= col("uni") * 95)
          .select("a_id", "b_id", "inter", "uni")
          .orderBy("a_id", "b_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    list_distinct(string_split(text, ' ')) AS tk FROM documents)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS inter,
             |  CAST(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS BIGINT) AS uni
             |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |  AND len(a.tk) * 100 >= len(b.tk) * 95
             |  AND len(b.tk) * 100 >= len(a.tk) * 95
             |WHERE len(list_intersect(a.tk, b.tk)) * 100 >=
             |  (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) * 95
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
