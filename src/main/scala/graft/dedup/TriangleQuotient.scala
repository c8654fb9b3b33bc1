package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle statistics of the simhash near-dup graph,
  * computed on the FINGERPRINT-CLASS quotient graph instead of by
  * enumerating document-level triangles.
  *
  * Why this is exact (the blow-up argument): adjacency in the
  * near-dup graph is `hamming(fp_a, fp_b) <= 3 AND a < b`, which
  * depends ONLY on the two fingerprints. So all docs sharing a
  * fingerprint — a "class" of size m — are pairwise adjacent
  * (hamming 0) and have identical neighborhoods outside the class:
  * the doc graph is the blow-up of the class graph (classes f~g iff
  * hamming <= 3, f != g) with every class expanded to an m-clique.
  * For a doc v in class f the other two triangle corners live in one
  * of four places, each counted exactly:
  *
  *   both in f:              C(m_f - 1, 2)
  *   one in f, one in g~f:   (m_f - 1) * S_f,   S_f = Σ_{g~f} m_g
  *   both in one g~f:        Σ_{g~f} C(m_g, 2)
  *   in g~f, h~f with g~h:   Σ_{class triangles {f,g,h}} m_g * m_h
  *
  * Every doc in a class gets the same (deg, n_tri), so the whole
  * corpus is answered by one pass over the class graph plus a final
  * (hi, lo) join back to the fingerprint table. Degrees fall out of
  * the same split: deg(v in f) = (m_f - 1) + S_f.
  *
  * Why this is the 100 TB shape: near-dup corpora concentrate their
  * edge mass in duplicate families — exactly where fingerprint
  * multiplicity lives. At the 10x rung the 4.45M-edge document graph
  * (929M wedges even degree-ordered) quotients to a 186k-edge class
  * graph with 10.8M wedges: the wedge-close join that dominated the
  * graph family runs on ~1% of the mass, and grows with DISTINCT
  * near-dup structure rather than with corpus size. The class
  * adjacency reuses the one banded hamming join construction site
  * ([[DedupQueries.bandedPairs]]), so banding semantics cannot drift
  * between the doc-level and class-level paths. The DuckDB oracles
  * for q_triangles / q_clustering_coef replay this same quotient
  * form (DedupQueries.classTriCtes).
  */
object TriangleQuotient {

  /** (doc_id, deg, n_tri) for EVERY doc in `fp` — isolated docs get
    * (0, 0); consumers filter. `fp` must be (doc_id: Long, hi: Long,
    * lo: Long) with hi/lo the 32-bit fingerprint halves the banded
    * join expects. Runs two tiny actions (class count) to size the
    * banding plan, mirroring the doc-level pair stage. */
  def nodeStats(fp: DataFrame): DataFrame = {
    val spark = fp.sparkSession
    val cls = fp.groupBy("hi", "lo")
      .agg(count(lit(1)).as("m"), min(col("doc_id")).as("cid"))
    val nCls = cls.count()
    val plan = SimhashBanding.choose(nCls)
    // class adjacency: the identical lossless banded hamming<=3
    // self-join as the doc-level pair stage, over one row per
    // DISTINCT fingerprint (cid stands in for doc_id)
    val cp = DedupQueries.bandedPairs(
      cls.select(col("cid").as("doc_id"), col("hi"), col("lo")), plan)
      .select(col("a_id").as("f"), col("b_id").as("g"))
    val sizes = cls.select(col("cid"), col("m"))
    val cpm = cp
      .join(sizes.select(col("cid").as("f"), col("m").as("mf")), "f")
      .join(sizes.select(col("cid").as("g"), col("m").as("mg")), "g")
    // neighbor mass S_f and the same-class pair term, both directions
    val cpe = cpm.select(col("f"), col("mg"))
      .union(cpm.select(col("g").as("f"), col("mf").as("mg")))
    val nb = cpe.groupBy("f").agg(
      sum(col("mg")).as("s"),
      sum(expr("mg * (mg - 1) div 2")).as("pairsum"))
    // class triangles by the compact-forward wedge close (f < g < h
    // by cid). Same explicit join-key partitioning rule as the old
    // doc-level enumeration: the class-pair table is tiny on disk, so
    // AQE would collapse the self-join to ~one task while the join
    // OUTPUT is the wedge mass — pinned parallelism keeps the close
    // spread even when its input coalesces.
    val parts = spark.sparkContext.defaultParallelism
    val xy = cpm.select(col("f").as("x"), col("g").as("y"),
      col("mf").as("mx"), col("mg").as("my")).repartition(parts, col("y"))
    val yz = cpm.select(col("f").as("y"), col("g").as("z"),
      col("mg").as("mz")).repartition(parts, col("y"))
    val xz = cp.select(col("f").as("x"), col("g").as("z"))
      .repartition(parts, col("x"), col("z"))
    val ctri = xy.join(yz, "y").join(xz, Seq("x", "z"))
    val t4 = ctri.select(col("x").as("f"), (col("my") * col("mz")).as("p"))
      .union(ctri.select(col("y").as("f"), (col("mx") * col("mz")).as("p")))
      .union(ctri.select(col("z").as("f"), (col("mx") * col("my")).as("p")))
      .groupBy("f").agg(sum(col("p")).as("cross3"))
    val cstat = cls
      .join(nb.withColumnRenamed("f", "cid"), Seq("cid"), "left")
      .join(t4.withColumnRenamed("f", "cid"), Seq("cid"), "left")
      .select(col("hi"), col("lo"),
        (col("m") - 1 + coalesce(col("s"), lit(0L))).as("deg"),
        (expr("(m - 1) * (m - 2) div 2")
          + (col("m") - 1) * coalesce(col("s"), lit(0L))
          + coalesce(col("pairsum"), lit(0L))
          + coalesce(col("cross3"), lit(0L))).as("n_tri"))
    fp.join(cstat, Seq("hi", "lo"))
      .select(col("doc_id"), col("deg"), col("n_tri"))
  }
}
