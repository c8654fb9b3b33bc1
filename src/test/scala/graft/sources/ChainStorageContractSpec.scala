package graft.sources

import graft.SparkSpec

/** THE STORAGE CONTRACT — the commit protocol driven through
  * [[InMemoryObjectStorage]] (no atomic rename, no mtimes,
  * list-after-put visibility, conditional-PUT as the only atomic
  * primitive) and, for the shared assertions, through
  * [[LocalChainStorage]] on a temp dir. What this pins:
  *
  *   - PUBLISH is a CAS: of N writers racing one canonical name,
  *     exactly one wins; losers get the retryable
  *     ConcurrentModificationException, never a corrupt chain.
  *   - A mid-copy crash leaves a PENDING canonical that is visible
  *     but NOT adoptable: publish classifies it as a retryable race
  *     and never creates its marker.
  *   - A publish-then-crash winner (complete dir, no marker) is
  *     ADOPTED by the next writer.
  *   - The time-travel timeline lives INSIDE markers (`ts=`), is
  *     strictly monotonic, and never consults modifiedMs — the fake
  *     returns a useless constant to prove it.
  *   - noteCommit preserves the ts line; commitNote returns the note.
  *   - tags / constraints are putIfAbsent-immutable.
  *   - restoreVersion — a pure-metadata commit — works end-to-end on
  *     the object store.
  *
  * This is the port seam's proof: ManifestPrune's protocol needs ONLY
  * the ChainStorage contract, so binding S3/GCS (conditional PUT +
  * object copy) runs the same table. */
class ChainStorageContractSpec extends SparkSpec {

  private def freshMemRoot(tag: String): (String, InMemoryObjectStorage) = {
    val st = new InMemoryObjectStorage
    val root = s"mem://$tag/${System.nanoTime}"
    ChainStorage.register(root, st)
    (root, st)
  }

  /** A fake v0: manifest objects written directly (the base-layout
    * shape) + the `_created` stamp buildLayout writes. */
  private def seedV0(st: ChainStorage, root: String): Unit = {
    st.write(s"$root/manifest/part-00000.parquet", "v0-bytes")
    st.write(s"$root/_created", s"ts=${st.nowMs()}\n")
  }

  /** A prepared manifest dir under a writer-unique name. */
  private def prepare(st: ChainStorage, root: String,
                      payload: String): String = {
    val p = s"$root/manifest_${ManifestPrune.prepareToken()}"
    st.write(s"$p/part-00000.parquet", payload)
    p
  }

  test("publish is a CAS on the object store: one winner, losers get " +
    "the retryable exception, the canonical carries the winner's bytes") {
    val (root, st) = freshMemRoot("cas")
    seedV0(st, root)
    val p1 = prepare(st, root, "writer-1")
    val p2 = prepare(st, root, "writer-2")
    val v = ManifestPrune.publish(root, 0L, p1)
    assert(v === 1L)
    assert(st.isPublished(ManifestPrune.manifestOf(root, 1L)))
    assert(st.isFile(ManifestPrune.markerPath(root, 1L)))
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.publish(root, 0L, p2)
    }
    assert(e.getMessage.contains("already published"))
    assert(st.read(s"${ManifestPrune.manifestOf(root, 1L)}" +
      "/part-00000.parquet") === "writer-1")
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
  }

  test("a mid-copy crash leaves a PENDING canonical: visible but not " +
    "published, classified as a retryable race, never marker-adopted") {
    val (root, st) = freshMemRoot("crash")
    seedV0(st, root)
    // crashing writer: dies after claiming + 0 copies
    val pCrash = prepare(st, root, "half")
    st.failCopiesAfter = 0
    intercept[RuntimeException] {
      ManifestPrune.publish(root, 0L, pCrash)
    }
    st.failCopiesAfter = -1
    val canonical = ManifestPrune.manifestOf(root, 1L)
    assert(st.isPending(canonical), "claimed-but-incomplete is pending")
    assert(!st.isPublished(canonical), "a pending dir is not truth")
    assert(!st.isFile(ManifestPrune.markerPath(root, 1L)),
      "no marker may exist for an incomplete manifest")
    // a second writer observes a RETRYABLE race, not adoption and not
    // a non-race IO error
    val p2 = prepare(st, root, "writer-2")
    intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.publish(root, 0L, p2)
    }
    assert(!st.isFile(ManifestPrune.markerPath(root, 1L)),
      "the loser must not adopt a pending publish")
    assert(ManifestPrune.currentVersion(spark, root) === 0L)
  }

  test("a publish-then-crash winner (complete dir, no marker) is " +
    "adopted by the next writer's publish attempt") {
    val (root, st) = freshMemRoot("adopt")
    seedV0(st, root)
    // winner completes the publish but dies before tryCommit
    val pWin = prepare(st, root, "winner")
    assert(st.publishDir(pWin, ManifestPrune.manifestOf(root, 1L)))
    assert(!st.isFile(ManifestPrune.markerPath(root, 1L)))
    assert(ManifestPrune.currentVersion(spark, root) === 0L)
    // the next writer finds the complete manifest, adopts its marker,
    // and retries on the new base
    val p2 = prepare(st, root, "late")
    intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.publish(root, 0L, p2)
    }
    assert(st.isFile(ManifestPrune.markerPath(root, 1L)),
      "adoption must create the crashed winner's marker")
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    // and the retry against the new base succeeds
    assert(ManifestPrune.publish(root, 1L, p2) === 2L)
  }

  test("the time-travel timeline lives inside markers: strictly " +
    "monotonic ts, versionAsOf resolves with NO mtimes at all") {
    val (root, st) = freshMemRoot("time")
    seedV0(st, root)
    (1L to 3L).foreach { v =>
      val p = prepare(st, root, s"v$v")
      assert(ManifestPrune.publish(root, v - 1, p) === v)
    }
    val ts = (0L to 3L).map(v =>
      ManifestPrune.commitTimeMs(root, v).get)
    assert(ts === ts.sorted && ts.distinct.length === 4,
      s"timeline must be strictly monotonic, got $ts")
    assert(ManifestPrune.versionAsOf(spark, root, ts(2)) === 2L)
    assert(ManifestPrune.versionAsOf(spark, root, ts(2) + 0) === 2L)
    assert(ManifestPrune.versionAsOf(spark, root, ts(3) - 1) === 2L)
    assert(ManifestPrune.versionAsOf(spark, root,
      ts(3) + 1000000L) === 3L)
    assert(ManifestPrune.versionAsOf(spark, root, ts(0)) === 0L)
    val before = intercept[IllegalArgumentException] {
      ManifestPrune.versionAsOf(spark, root, ts(0) - 10)
    }
    assert(before.getMessage.contains("precedes the table's creation"))
  }

  test("noteCommit preserves the embedded ts; commitNote returns the " +
    "note; token-combined notes answer both cursors") {
    val (root, st) = freshMemRoot("note")
    seedV0(st, root)
    val p = prepare(st, root, "v1")
    ManifestPrune.publish(root, 0L, p)
    val t0 = ManifestPrune.commitTimeMs(root, 1L).get
    ManifestPrune.noteCommit(root, 1L, "eqdel tsink:7")
    assert(ManifestPrune.commitTimeMs(root, 1L).get === t0,
      "noteCommit must not move the commit instant")
    assert(ManifestPrune.commitNote(root, 1L) === Some("eqdel tsink:7"))
    // and a re-note still preserves it
    ManifestPrune.noteCommit(root, 1L, "cdcv:3")
    assert(ManifestPrune.commitTimeMs(root, 1L).get === t0)
  }

  test("tags and constraints are conditional-PUT-immutable on the " +
    "object store") {
    val (root, st) = freshMemRoot("refs")
    seedV0(st, root)
    val p = prepare(st, root, "v1")
    ManifestPrune.publish(root, 0L, p)
    ManifestPrune.tagVersion(root, "train-v1", 1L)
    assert(ManifestPrune.taggedVersion(root, "train-v1") === Some(1L))
    intercept[IllegalArgumentException] {
      ManifestPrune.tagVersion(root, "train-v1", 0L)
    }
    assert(ManifestPrune.listTags(root) === Map("train-v1" -> 1L))
    ManifestPrune.addConstraint(root, "nonneg", "n_chars >= 0")
    intercept[IllegalArgumentException] {
      ManifestPrune.addConstraint(root, "nonneg", "n_chars >= 1")
    }
    assert(ManifestPrune.listConstraints(root) ===
      Map("nonneg" -> "n_chars >= 0"))
  }

  test("restoreVersion — a pure-metadata commit — runs end-to-end on " +
    "the object store, byte-identical manifest, audited note") {
    val (root, st) = freshMemRoot("restore")
    seedV0(st, root)
    (1L to 2L).foreach { v =>
      ManifestPrune.publish(root, v - 1, prepare(st, root, s"v$v"))
    }
    val v3 = ManifestPrune.restoreVersion(spark, root, 1L)
    assert(v3 === 3L)
    assert(st.read(s"${ManifestPrune.manifestOf(root, 3L)}" +
      "/part-00000.parquet") === "v1")
    assert(ManifestPrune.commitNote(root, 3L) === Some("restore:1"))
    assert(ManifestPrune.currentVersion(spark, root) === 3L)
  }

  test("the SAME protocol assertions hold through LocalChainStorage " +
    "(rename-publish): CAS, adoption, in-marker timeline") {
    val st = ChainStorage.local
    val root = graft.Tables.matDir(s"contract_local_${System.nanoTime}",
      spark, sf0001)
    seedV0(st, root)
    val p1 = prepare(st, root, "writer-1")
    val p2 = prepare(st, root, "writer-2")
    assert(ManifestPrune.publish(root, 0L, p1) === 1L)
    intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.publish(root, 0L, p2)
    }
    // local rename can never expose a pending state
    assert(!st.isPending(ManifestPrune.manifestOf(root, 1L)))
    // ts-in-marker timeline, no mtime dependence: stamp markers, then
    // corrupt every mtime and watch the timeline not care
    val p3 = prepare(st, root, "v2")
    ManifestPrune.publish(root, 1L, p3)
    val t1 = ManifestPrune.commitTimeMs(root, 1L).get
    val t2 = ManifestPrune.commitTimeMs(root, 2L).get
    assert(t2 > t1)
    new java.io.File(ManifestPrune.markerPath(root, 1L))
      .setLastModified(System.currentTimeMillis() + 9999999L)
    new java.io.File(ManifestPrune.markerPath(root, 2L))
      .setLastModified(1000L)
    assert(ManifestPrune.commitTimeMs(root, 1L).get === t1,
      "the timeline must read marker content, not mtimes")
    assert(ManifestPrune.commitTimeMs(root, 2L).get === t2)
    assert(ManifestPrune.versionAsOf(spark, root, t1) === 1L)
  }

  test("a STALE claim (publisher died mid-copy, grace elapsed) is " +
    "taken over by a later publisher — no permanent wedge") {
    val (root, st) = freshMemRoot("takeover")
    seedV0(st, root)
    // publisher 1 claims version 1 and dies after 0 copies
    val pCrash = prepare(st, root, "half")
    st.failCopiesAfter = 0
    intercept[RuntimeException] {
      ManifestPrune.publish(root, 0L, pCrash)
    }
    st.failCopiesAfter = -1
    val canonical = ManifestPrune.manifestOf(root, 1L)
    assert(st.isPending(canonical))
    // within the grace window the claim is a LIVE race: the later
    // publisher loses retryably and the claim survives
    val p2 = prepare(st, root, "writer-2")
    intercept[java.util.ConcurrentModificationException] {
      ManifestPrune.publish(root, 0L, p2)
    }
    assert(st.isPending(canonical), "a live claim must not be evicted")
    // past the grace window the claim is wedged garbage: the next
    // publish takes it over and the chain advances
    st.claimGraceMs = 0L
    val p3 = prepare(st, root, "writer-3")
    assert(ManifestPrune.publish(root, 0L, p3) === 1L)
    assert(st.isPublished(canonical) && !st.isPending(canonical))
    assert(st.read(s"$canonical/part-00000.parquet") === "writer-3")
    assert(st.isFile(ManifestPrune.markerPath(root, 1L)))
    assert(ManifestPrune.currentVersion(spark, root) === 1L)
    // pendingSinceMs reports the claim instant for vacuum's sweep
    st.claimGraceMs = Long.MaxValue
    st.failCopiesAfter = 0
    intercept[RuntimeException] {
      ManifestPrune.publish(root, 1L, prepare(st, root, "half2"))
    }
    st.failCopiesAfter = -1
    val pend = ManifestPrune.manifestOf(root, 2L)
    assert(st.isPending(pend))
    assert(math.abs(st.nowMs() - st.pendingSinceMs(pend)) < 60000L)
  }

  test("the change-feed spill protocol runs on the seam: compute-once " +
    "sharing, loser adoption, ready-rider gating, crash takeover") {
    val (root, st) = freshMemRoot("spill")
    val keyDir = s"$root/_cdc/doc_id"
    var computes = 0
    def spill(v: Long): String =
      GraftTableSourceV2.ensureSpill(st, keyDir, v) { tmp =>
        computes += 1
        st.write(s"$tmp/part-00000-x.parquet", s"rows-v$v")
      }
    val dir = spill(1L)
    assert(computes === 1)
    assert(st.isPublished(dir) && st.isFile(s"$dir/_FEED_READY"))
    assert(GraftTableSourceV2.partFiles(st, dir) ===
      Seq(s"$dir/part-00000-x.parquet"))
    // a second consumer ADOPTS the published spill — zero recompute
    assert(spill(1L) === dir)
    assert(computes === 1)
    // a racing spiller that loses the publish adopts the winner too
    val tmp2 = s"$keyDir/.tmp_v1_${ManifestPrune.prepareToken()}"
    st.write(s"$tmp2/part-00000-y.parquet", "loser rows")
    st.write(s"$tmp2/_FEED_READY", "")
    assert(!st.publishDir(tmp2, dir), "occupied spill name must lose")
    assert(st.read(s"$dir/part-00000-x.parquet") === "rows-v1",
      "the loser must never clobber the winner's spill")
    // crash mid-publish leaves a pending spill; after the grace
    // window the next consumer takes it over and completes
    st.failCopiesAfter = 0
    intercept[RuntimeException] { spill(2L) }
    st.failCopiesAfter = -1
    assert(st.isPending(s"$keyDir/v2"))
    st.claimGraceMs = 0L
    val d2 = spill(2L)
    assert(st.isPublished(d2) && st.isFile(s"$d2/_FEED_READY"))
    assert(GraftTableSourceV2.partFiles(st, d2).nonEmpty)
  }

  test("forPath matches prefixes only at path-segment boundaries") {
    val st = new InMemoryObjectStorage
    val prefix = s"/fp_${System.nanoTime}/a"
    ChainStorage.register(prefix, st)
    try {
      assert(ChainStorage.forPath(prefix) eq st)
      assert(ChainStorage.forPath(s"$prefix/manifest/x") eq st)
      assert(ChainStorage.forPath(s"${prefix}bc") eq ChainStorage.local,
        "/a must never capture /abc")
      assert(ChainStorage.forPath(s"${prefix}bc/manifest") eq
        ChainStorage.local)
    } finally ChainStorage.unregister(prefix)
  }

  test("local putIfAbsent is atomic-with-content: no empty-object " +
    "window, loser never clobbers, link temps invisible to listings") {
    val st = ChainStorage.local
    val dir = graft.Tables.matDir(s"pia_${System.nanoTime}",
      spark, sf0001)
    // concurrent CAS on one name: exactly one winner, and every
    // observer that sees the name sees FULL content (taggedVersion's
    // "".toLong crash was the empty-window symptom)
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        if (st.putIfAbsent(s"$dir/_tags/t", s"content-$i")) {
          winners.incrementAndGet(); ()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(winners.get() === 1)
    val content = st.read(s"$dir/_tags/t")
    assert(content.startsWith("content-") && content.length > 8,
      s"observed partial/empty content: '$content'")
    assert(st.list(s"$dir/_tags") === Seq("t"),
      "link temps must never appear in listings")
  }
}
