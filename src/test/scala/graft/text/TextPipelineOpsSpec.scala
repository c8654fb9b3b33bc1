package graft.text

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants for the corpus-preparation operators added on
  * top of the analysis queries (chunking, mixture rebalancing,
  * sequence packing): each is compared against a sequential in-JVM
  * reference implementation over the sf0.001 documents, row-for-row.
  * (The DuckDB oracle gate checks the same queries cross-engine; these
  * specs pin the SEMANTICS to an independent Scala reimplementation so
  * a shared misunderstanding between the Spark and SQL versions can't
  * hide.) */
class TextPipelineOpsSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q_chunk reproduces a per-doc reference chunker exactly") {
    val expected = docs.flatMap { case (id, _, text) =>
      val tk = text.split(" ", -1)
      val n = tk.length
      val kMax = math.max(0L, math.floor((n - 17) / 48.0).toLong)
      (0L to kMax).map { k =>
        val ck = tk.slice((k * 48).toInt, (k * 48).toInt + 64)
        (id, k, ck.length.toLong, ck.mkString(" "))
      }
    }.toSet
    val got = SparkEntry.queries("q_chunk")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === expected)
    // every token is covered and chunks are never empty
    assert(got.forall { case (_, _, len, _) => len >= 1 && len <= 64 })
  }

  test("q_corpus_mix computes exact thresholds and deterministic kept counts") {
    val bySource = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = docs.size.toLong
    val nSrc = bySource.size.toLong
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    val rows = SparkEntry.queries("q_corpus_mix")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === bySource.keySet)
    rows.foreach { r =>
      val (src, cnt, thr, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cnt === bySource(src))
      assert(thr === math.min(1000L,
        math.floor(1000.0 * total / (nSrc * cnt)).toLong))
      val expKept =
        docs.count { case (id, s2, _) => s2 == src && bucket(id) < thr }.toLong
      assert(kept === expKept, s"source $src")
      assert(kept <= cnt)
    }
  }

  test("q_length_pack matches a sequential reference packer per (source, shard)") {
    val withTokens = docs.map { case (id, src, text) =>
      (id, src, text.split(" ", -1).length.toLong)
    }
    val expected = withTokens
      .groupBy { case (id, src, _) => (src, id % 8) }
      .toSeq
      .flatMap { case ((src, shard), grp) =>
        var prefix = 0L
        grp.sortBy(_._1).map { case (_, _, n) =>
          val b = math.floor(prefix / 512.0).toLong
          prefix += n
          ((src, shard, b), n)
        }
      }
      .groupBy(_._1)
      .map { case ((src, shard, b), v) =>
        (src, shard, b, v.size.toLong, v.map(_._2).sum)
      }
      .toSet
    val got = SparkEntry.queries("q_length_pack")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
  }
}
