package graft.multimodal

import graft.Tables
import graft.queries.CoreQueries.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  * The testdata has no real media, so the payload is the UTF-8 encoding
  * of `text` — the POINT is the Spark-side plumbing (binary columns,
  * metadata extraction, deterministic content addressing), which is
  * identical for real image/audio bytes. The decode/feature-extract step
  * that would need codec libraries lives in [[MultimodalPipeline]] as a
  * partition-wise operator with a stubbed codec.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // binary payload metadata: byte length, content hash (the id a
    // CAS/dedup layer would use), head-bytes hex signature ("magic
    // number" sniffing on real media)
    Q("q_multimodal_meta",
      (s, d) => Tables.load(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast(LongType).as("n_bytes"),
          md5(col("text")).as("payload_md5"),
          upper(hex(encode(substring(col("text"), 1, 8), "UTF-8")))
            .as("head_hex"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |md5(text) AS payload_md5,
             |upper(hex(encode(substr(text, 1, 8)))) AS head_hex
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
