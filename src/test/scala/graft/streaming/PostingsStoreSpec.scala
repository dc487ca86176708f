package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The append-mode sink's compaction commit protocol: a crash at ANY
  * point of `compact` must never lose rows or double-count them, and
  * `gc` must converge when re-run (st68 exercises the happy lifecycle
  * end-to-end against the td49 oracle twin; these cases cut the crash
  * windows open by hand).
  */
class PostingsStoreSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshStore(n: Int): String = {
    val root = Files.createTempDirectory("graft_pstore_spec").toString
    (0 until n).foreach { b =>
      PostingsStore.write(
        Seq((b.toLong, s"tok$b", 1L)).toDF("doc_id", "token", "tf"),
        root, b.toLong)
    }
    root
  }

  test("compact folds the live set into one negative-id segment, " +
      "row-identical, and gc removes the sources") {
    val root = freshStore(3)
    val before = PostingsStore.read(spark, root).orderBy("doc_id").collect().toSeq
    PostingsStore.compact(spark, root)
    val live = PostingsStore.livePaths(root)
    assert(live.size == 1 && live.head.contains("batch_id=-"), live)
    assert(PostingsStore.read(spark, root).orderBy("doc_id")
      .collect().toSeq == before)
    // the consumed writer partitions are gone from disk
    assert(!Files.exists(Paths.get(root).resolve("batch_id=0")))
    // compacting a single-partition store is a no-op
    PostingsStore.compact(spark, root)
    assert(PostingsStore.livePaths(root) == live)
  }

  test("a crash BEFORE the _SOURCES manifest leaves the segment " +
      "invisible; gc sweeps the remnant") {
    val root = freshStore(2)
    val before = PostingsStore.read(spark, root).count()
    // simulate: segment parquet fully written (_SUCCESS present) but the
    // manifest — the commit — never landed
    Seq((9L, "ghost", 1L)).toDF("doc_id", "token", "tf")
      .write.parquet(s"$root/batch_id=-7")
    assert(PostingsStore.read(spark, root).count() == before,
      "an uncommitted segment must be invisible to reads")
    assert(PostingsStore.livePaths(root).size == 2)
    PostingsStore.gc(root)
    assert(!Files.exists(Paths.get(root).resolve("batch_id=-7")),
      "gc must sweep the crashed segment remnant")
    assert(PostingsStore.read(spark, root).count() == before)
  }

  test("a crash AFTER segment commit but BEFORE source gc never " +
      "double-counts; gc converges") {
    val root = freshStore(3)
    val before = PostingsStore.read(spark, root).orderBy("doc_id").collect().toSeq
    // commit a segment by hand (parquet + manifest) and CRASH before gc:
    // both the segment and its sources are on disk
    val all = PostingsStore.read(spark, root)
    all.write.parquet(s"$root/batch_id=-4")
    Files.write(Paths.get(root).resolve("batch_id=-4").resolve("_SOURCES"),
      "batch_id=0\nbatch_id=1\nbatch_id=2\n".getBytes("UTF-8"))
    assert(Files.exists(Paths.get(root).resolve("batch_id=0")))
    assert(PostingsStore.read(spark, root).orderBy("doc_id")
      .collect().toSeq == before,
      "segment + not-yet-gc'd sources must not double-count")
    PostingsStore.gc(root)
    assert(!Files.exists(Paths.get(root).resolve("batch_id=1")))
    assert(PostingsStore.read(spark, root).orderBy("doc_id")
      .collect().toSeq == before)
    PostingsStore.gc(root) // idempotent
    assert(PostingsStore.read(spark, root).orderBy("doc_id")
      .collect().toSeq == before)
  }

  test("a second compaction consumes the first segment plus newer " +
      "writer batches") {
    val root = freshStore(2)
    PostingsStore.compact(spark, root)
    PostingsStore.write(Seq((5L, "tok5", 1L)).toDF("doc_id", "token", "tf"),
      root, 5L)
    val before = PostingsStore.read(spark, root).orderBy("doc_id").collect().toSeq
    PostingsStore.compact(spark, root)
    val live = PostingsStore.livePaths(root)
    assert(live.size == 1 && live.head.contains("batch_id=-"), live)
    assert(PostingsStore.read(spark, root).orderBy("doc_id")
      .collect().toSeq == before)
  }
}
