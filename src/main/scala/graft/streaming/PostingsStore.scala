package graft.streaming

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-mode partitioned data sink with crash-safe compaction — the
  * storage half of the st66/st67 index maintenance (postings are
  * DATA-sized per-document facts: a trigger writes only its batch), plus
  * the maintenance operation that design creates a need for: after many
  * triggers the sink holds many small partitions, and a scan pays
  * per-file overhead ∝ triggers. `compact` folds live partitions into a
  * segment the way a lakehouse OPTIMIZE does, in miniature — either the
  * whole live set (the maintenance-window form) or, size-tiered, just
  * the `mergeWidth` smallest (the in-loop form whose total write volume
  * over an N-batch drain is O(N log N), not O(N²)):
  *
  *  - layout: `root/batch_id=<id>/`, every partition dir IMMUTABLE once
  *    committed. Writer batches use Spark's foreachBatch id (≥ 0; a
  *    replayed batch overwrites its own dir — idempotent). Compacted
  *    segments use NEGATIVE ids (never colliding with writer ids) and
  *    carry a `_SOURCES` manifest naming the partitions they consumed;
  *  - commit protocol: a writer partition is live iff its `_SUCCESS`
  *    exists; a compacted segment is live iff `_SUCCESS` AND `_SOURCES`
  *    exist (the manifest is written last, so a crash mid-compaction
  *    leaves an invisible segment, never a double-count);
  *  - read resolution: live partitions = committed dirs MINUS the
  *    sources named by committed segments — a crash between segment
  *    commit and source deletion leaves both on disk and reads stay
  *    exactly-once; [[gc]] (idempotent, re-runnable) then deletes
  *    consumed sources and crashed segment remnants.
  *
  * Concurrency contract: one streaming writer (appending new positive
  * ids) plus one maintenance compactor. A batch landing after the
  * compactor snapshots its live set is simply not consumed and stays
  * live (EXERCISED, not asserted: PostingsStoreSpec lands a committed
  * batch inside compact's snapshot→`_SOURCES` window and reads stay
  * exactly-once; st66/st67 run compaction from inside the maintenance
  * loop itself every N batches, bounded by the in-flight batch id); the
  * only unsafe interleaving would be the writer REPLAYING an id the
  * compactor consumed, which Spark's checkpoint rules out once the
  * batch is committed — and which `compact(beforeBatch = batchId)`
  * rules out for the one batch that has NOT committed yet.
  */
object PostingsStore {

  /** What one [[compact]] invocation actually did — the proportionality
    * evidence surface (the st66 idiom: cost claims are ASSERTED against
    * a log, never just stated). `foldedBytes` is the parquet volume the
    * fold READ (and re-wrote); `liveBytes`/`liveCount` describe the full
    * live set at snapshot time — what a full fold would have read. A
    * size-tiered drain must show `foldedBytes < liveBytes` whenever
    * `liveCount > mergeWidth`: the fold paid for its tier, not the index.
    */
  final case class Compaction(folded: Seq[String], foldedBytes: Long,
      liveCount: Int, liveBytes: Long, segment: String)

  private val Sources = "_SOURCES"
  private val Success = "_SUCCESS"

  private def partDirs(root: String): Seq[Path] = {
    val d = Paths.get(root)
    if (!Files.isDirectory(d)) return Seq.empty
    d.toFile.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("batch_id=-?\\d+"))
      .map(_.toPath)
  }

  private def partId(p: Path): Long =
    p.getFileName.toString.stripPrefix("batch_id=").toLong

  private def isCommitted(p: Path): Boolean = {
    val ok = Files.exists(p.resolve(Success))
    if (partId(p) < 0) ok && Files.exists(p.resolve(Sources)) else ok
  }

  /** Parquet bytes under a partition dir (recursive — sub-partitioned
    * `cell=` layouts count their leaves). The compaction cost unit;
    * package-visible so the spec's byte accounting asserts against the
    * REAL cost unit instead of a drifting copy.
    */
  private[streaming] def dirBytes(p: Path): Long = {
    val st = Files.walk(p)
    try st.toArray.map(_.asInstanceOf[Path])
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    finally st.close()
  }

  /** The partition-column CHAIN a fold source's dirs actually encode
    * (`cell=3/…` → Seq("cell")). Validates EVERY `=`-named child at every
    * level (r13 advice: descending only the first branch let a
    * non-uniform layout — mixed writers, partial corruption — pass when
    * its first branch happened to match, while other branches got
    * silently inlined or mis-cut): all siblings must name one column and
    * agree on the chain below it, or this fails loud. Empty for a flat
    * source. Drives compact()'s layout validation. Depth is bounded by
    * the partition-column count, so the full walk stays cheap.
    */
  private def partitionChain(dir: Path): Seq[String] = {
    def chain(d: Path): Vector[String] = {
      val subs = Option(d.toFile.listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.contains("="))
      if (subs.isEmpty) Vector.empty
      else {
        val cols = subs.map(_.getName.takeWhile(_ != '=')).distinct
        require(cols.size == 1,
          s"PostingsStore: non-uniform partition layout under $d — " +
            s"mixed partition columns: ${cols.sorted.mkString(", ")}")
        val tails = subs.map(f => chain(f.toPath)).distinct
        require(tails.size == 1,
          s"PostingsStore: non-uniform partition layout under $d — " +
            s"branches disagree below '${cols.head}='")
        cols.head +: tails.head
      }
    }
    chain(dir)
  }

  private def consumedNames(root: String): Set[String] =
    partDirs(root)
      .filter(p => partId(p) < 0 && isCommitted(p))
      .flatMap(p => Files.readAllLines(p.resolve(Sources))
        .toArray(Array.empty[String]).toSeq)
      .toSet

  /** One trigger's append: the batch lands in its OWN partition; a
    * replayed batch id overwrites the same dir and converges.
    * `partitionColumns` optionally sub-partitions the batch dir (e.g.
    * `cell=` under `batch_id=` — the st69 corpus layout), so a reader
    * filtering on those columns prunes at the FILE level: a touched-cell
    * read lists only the touched cells' directories across every live
    * batch, never the full corpus (partition discovery restores the
    * columns; Spark evaluates partition-key filters against directory
    * values before any file opens).
    */
  def write(batch: DataFrame, root: String, batchId: Long,
      partitionColumns: Seq[String] = Seq.empty): Unit = {
    require(batchId >= 0, s"writer batch ids are >= 0, got $batchId")
    val w = batch.write.mode("overwrite")
    val wp = if (partitionColumns.isEmpty) w
      else w.partitionBy(partitionColumns: _*)
    wp.parquet(s"$root/batch_id=$batchId")
  }

  /** The live partition dirs under the commit protocol above.
    *
    * `beforeBatch` bounds WRITER ids strictly below it — the
    * DurableState `latestBefore` idiom for replay safety: a replaying
    * batch `b` that derives state from "everything before me" must not
    * see its own failed attempt's partition. Compacted (negative-id)
    * segments are always live; callers that mix `beforeBatch` with
    * compaction must compact only ids already strictly below every
    * future read bound.
    */
  def livePaths(root: String,
      beforeBatch: Long = Long.MaxValue): Seq[String] = {
    val consumed = consumedNames(root)
    partDirs(root)
      .filter(isCommitted)
      .filter(p => partId(p) < 0 || partId(p) < beforeBatch)
      .filterNot(p => consumed.contains(p.getFileName.toString))
      .sortBy(partId)
      .map(_.toString)
  }

  /** All live rows (no batch_id column — segment ids are storage detail). */
  def read(s: SparkSession, root: String,
      beforeBatch: Long = Long.MaxValue): DataFrame = {
    val live = livePaths(root, beforeBatch)
    require(live.nonEmpty, s"PostingsStore: no committed partitions under $root")
    s.read.parquet(live: _*)
  }

  /** ONE writer batch's partition, resolved through the store's own
    * directory listing (r13 verdict #5: callers that string-build
    * `"$root/batch_id=N"` couple to the layout and break silently if the
    * partition scheme changes). The per-trigger evidence read for
    * batch-proportionality assertions. Fails loud on a missing batch.
    */
  def readBatch(s: SparkSession, root: String, batchId: Long): DataFrame =
    s.read.parquet(batchDir(root, batchId).toString)

  /** The parquet bytes one writer batch landed — same resolution rule as
    * [[readBatch]], same cost unit as compaction ([[dirBytes]]).
    */
  def batchBytes(root: String, batchId: Long): Long =
    dirBytes(batchDir(root, batchId))

  private def batchDir(root: String, batchId: Long): Path =
    partDirs(root).find(d => partId(d) == batchId)
      .getOrElse(sys.error(
        s"PostingsStore: no batch_id=$batchId partition under $root"))

  /** Fold live partitions into ONE negative-id segment. Idempotent and
    * crash-safe per the commit protocol; returns `None` (no-op) when
    * nothing needs folding. Runs [[gc]] after committing.
    *
    * `mergeWidth` picks the policy (r11 verdict #1):
    *  - `0` — FULL fold: the whole live set becomes one segment. The
    *    maintenance-WINDOW form (st68's stopped-query OPTIMIZE): correct
    *    when invoked rarely, but O(index) write volume per call — run
    *    every `compactEvery` batches it re-writes the accumulated index
    *    each time, O(N²/compactEvery) over an N-batch drain.
    *  - `>= 2` — SIZE-TIERED fold (the LSM / lakehouse policy): fold
    *    only the `mergeWidth` SMALLEST live partitions by parquet bytes
    *    (ties by name, so the pick is deterministic), no-op while fewer
    *    exist. Greedy smallest-first K-way merging re-writes each row
    *    O(log_mergeWidth N) times over a drain — O(N log N) total write
    *    volume — while the live partition count stays bounded by
    *    ~mergeWidth + batches-since-last-fold. THE shape for in-loop
    *    compaction (st66/st67), and the returned [[Compaction]] evidence
    *    is asserted there: bytes read per fold ∝ the folded tier, never
    *    the live total. The `_SOURCES` manifest names ONLY the folded
    *    tier, so every crash window of the full fold carries over
    *    unchanged (spec-cut for the partial fold too): a crash before
    *    the manifest leaves an invisible segment and every source live;
    *    after it, reads exclude exactly the tier.
    *
    * `beforeBatch` bounds the WRITER ids consumed (segments are always
    * consumable) — the bound a compaction running INSIDE a foreachBatch
    * trigger must pass as its own batch id: that batch has not committed
    * to the checkpoint yet, so Spark may still replay it, and consuming
    * its partition would double-count the replay's overwrite. Ids
    * strictly below the current batch are checkpoint-committed (the
    * AvailableNow trigger commits each batch before the next fires), so
    * they are safe to fold mid-drain.
    *
    * `betweenSnapshotAndCommit` is a test seam: it runs after the live
    * set is snapshotted and before the `_SOURCES` manifest commits, the
    * window where a concurrent writer batch can land. Such a batch is
    * simply not consumed — it is absent from the snapshot, so absent
    * from the manifest, and stays live next to the segment
    * (PostingsStoreSpec cuts this interleaving open).
    *
    * `partitionColumns` (r12) must name the SAME sub-partitioning the
    * writers used, when they used one: the fold re-reads the sources
    * with the store root as base path (sibling `batch_id=` roots are
    * otherwise rejected as conflicting partition roots) and re-writes
    * the segment `partitionBy` those columns, so the file-level pruning
    * contract — a touched-cell read lists only touched directories —
    * survives compaction (st69's corpus store folds without losing its
    * `centroid_id=` layout; spec-pinned via the scan's numFiles metric
    * across a mixed segment+batch live set). Folding a sub-partitioned
    * store WITHOUT naming the columns would inline them into the
    * segment's rows and silently downgrade every later touched-cell
    * read to a full scan.
    */
  def compact(s: SparkSession, root: String,
      beforeBatch: Long = Long.MaxValue,
      mergeWidth: Int = 0,
      partitionColumns: Seq[String] = Seq.empty,
      betweenSnapshotAndCommit: () => Unit = () => ()): Option[Compaction] = {
    require(mergeWidth == 0 || mergeWidth >= 2,
      s"mergeWidth must be 0 (full fold) or >= 2 (tiered), got $mergeWidth")
    val live = livePaths(root, beforeBatch)
    betweenSnapshotAndCommit()
    if (live.size <= 1 || (mergeWidth >= 2 && live.size < mergeWidth))
      return None
    val sized = live.map(p => (p, dirBytes(Paths.get(p))))
    val fold =
      if (mergeWidth == 0) sized
      else sized.sortBy { case (p, b) => (b, p) }.take(mergeWidth)
    // the layout contract is ENFORCED, not just documented (r12 advice):
    // a fold source carrying `col=` sub-dirs the caller did not name
    // would silently inline the writers' sub-partitioning into the
    // segment's rows — every later touched-cell read downgrades from
    // file pruning to a full scan; wrong names fail late on conflicting
    // partition roots. Read each source's actual dir chain and require
    // it to match. (A source with NO chain is fine when columns are
    // named — the values then live in its rows and partitionBy re-cuts
    // them into the layout.)
    for ((p, chain) <- fold.map { case (p, _) =>
        (p, partitionChain(Paths.get(p))) } if chain.nonEmpty)
      require(chain == partitionColumns,
        s"PostingsStore.compact: fold source $p is sub-partitioned by " +
          s"[${chain.mkString(", ")}] but partitionColumns=" +
          s"[${partitionColumns.mkString(", ")}] — folding would " +
          "destroy (or mis-cut) the store's file-pruning layout")
    val nextId = -(partDirs(root).map(p => math.abs(partId(p))).max + 1)
    val seg = Paths.get(s"$root/batch_id=$nextId")
    val folded =
      if (partitionColumns.isEmpty) s.read.parquet(fold.map(_._1): _*)
      else s.read.option("basePath", root).parquet(fold.map(_._1): _*)
        .drop("batch_id")
    val w = folded.write.mode("overwrite")
    (if (partitionColumns.isEmpty) w else w.partitionBy(partitionColumns: _*))
      .parquet(seg.toString)
    // the manifest is the COMMIT: until it lands the segment is invisible
    Files.write(seg.resolve(Sources),
      fold.map { case (p, _) => Paths.get(p).getFileName.toString }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    gc(root)
    Some(Compaction(fold.map(_._1), fold.map(_._2).sum,
      live.size, sized.map(_._2).sum, seg.toString))
  }

  /** Idempotent cleanup: consumed sources and crashed (uncommitted)
    * negative-id segments are deleted; re-running converges.
    *
    * Deletion ORDER is crash-safety (size-tiered folds make
    * segment-consuming-segment chains routine): a committed segment's
    * `_SOURCES` manifest is the only record excluding its own sources
    * from the live set, so the segment may be deleted only once every
    * dir it names is already gone — otherwise a crash between the two
    * deletions resurrects the sources and double-counts. Consumption
    * points strictly backward in time (a fold consumes only
    * previously-committed dirs, and segment |id|s grow monotonically),
    * so writer partitions first, then consumed segments oldest
    * (smallest |id|) first, is a topological order of that DAG; a crash
    * between ANY two deletions leaves reads exactly-once and a re-run
    * converges (spec-cut via the `afterDelete` seam).
    */
  def gc(root: String, afterDelete: String => Unit = _ => ()): Unit = {
    val consumed = consumedNames(root)
    val victims = partDirs(root).filter { p =>
      consumed.contains(p.getFileName.toString) ||
        (partId(p) < 0 && !isCommitted(p))
    }
    victims.sortBy(p => (if (partId(p) >= 0) 0L else 1L,
        math.abs(partId(p))))
      .foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          // fail LOUD on a deletion that did not take (straggler handle,
          // foreign file, races): silently proceeding past a surviving
          // consumed source to delete the segment whose manifest was its
          // only exclusion record would resurrect the source on the next
          // read and double-count — the exact hazard the topological
          // order exists to prevent. gc is idempotent, so the caller
          // simply re-runs after the transient clears.
          if (!f.delete() && f.exists())
            throw new IllegalStateException(
              s"PostingsStore.gc: could not delete $f; aborting before " +
                "any later deletion can orphan its exclusion record")
        }
        rm(p.toFile)
        afterDelete(p.getFileName.toString)
      }
  }
}
