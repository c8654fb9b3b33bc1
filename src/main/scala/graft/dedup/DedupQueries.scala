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
    Q("q_dedup_minhash_lsh",
      (s, d) => {
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"),
            array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
          .filter(size(col("sh")) > 0)
        val sig = docs.withColumn("sig", minhashSignature(col("sh"), 8))
        val bands = sig.select(col("doc_id"), col("sh"),
          explode(lshBands(col("sig"), 2, 4)).as("band"))
        val a = bands.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
          col("band"))
        val b = bands.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
          col("band"))
        a.join(b, Seq("band"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("a_sh"), col("b_sh"))).cast(LongType)
              .as("inter"),
            (size(col("a_sh")) + size(col("b_sh"))).cast(LongType).as("sz"))
          .distinct()
          .withColumn("uni", col("sz") - col("inter")).drop("sz")
          .filter(col("inter") * 10 >= col("uni") * 3)
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
             |    list_aggregate(list_transform(sh, s -> md5(k || '|' || s)), 'min')
             |  ) AS sig FROM sh),
             |bands AS (
             |  SELECT doc_id, sh,
             |    unnest(list_transform(range(0, 4),
             |      j -> md5(sig[2*j+1] || sig[2*j+2]))) AS band
             |  FROM mh),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             |    CAST(len(a.sh) + len(b.sh) AS BIGINT) AS sz
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.doc_id < b.doc_id)
             |SELECT a_id, b_id, inter, sz - inter AS uni FROM cand
             |WHERE inter * 10 >= (sz - inter) * 3
             |ORDER BY a_id, b_id""".stripMargin)),

    // 16-bit SimHash per doc + bucket sizes (hamming-0 near-dup groups)
    Q("q_dedup_simhash",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.load(s, d, "documents")
          .select(col("doc_id"), simhash16(tokenSet(col("text"))).as("simhash"))
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
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), tokenSet(col("text")).as("tk"))
        val a = docs.select(col("source"), col("doc_id").as("a_id"),
          col("tk").as("a_tk"))
        val b = docs.select(col("source"), col("doc_id").as("b_id"),
          col("tk").as("b_tk"))
        a.join(b, Seq("source"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            size(array_intersect(col("a_tk"), col("b_tk"))).cast(LongType)
              .as("inter"),
            (size(col("a_tk")) + size(col("b_tk"))).cast(LongType).as("sz"))
          .withColumn("uni", col("sz") - col("inter")).drop("sz")
          .filter(col("inter") * 100 >= col("uni") * 95)
          .orderBy("a_id", "b_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    list_distinct(string_split(text, ' ')) AS tk FROM documents)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS inter,
             |  CAST(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS BIGINT) AS uni
             |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.tk, b.tk)) * 100 >=
             |  (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) * 95
             |ORDER BY a_id, b_id""".stripMargin))
  )
}
