package graft

import java.io.File

import graft.storage.CommitLog

/** Physical-side pins for the executed table-format paths (stor7/
  * stor8): the query oracles prove the RELATIONAL state; these assert
  * what only the filesystem can show — file counts actually dropped,
  * expired files are actually gone, time travel across the rewrite
  * stays intact.
  */
class StorageCompactionSpec extends SparkTestBase {

  private def parquetFilesUnder(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).fold(0)(_.map(walk).sum)
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new File(dir))
  }

  test("stor8: compaction reduces file count, v1 time travel intact") {
    val t = QueriesStorage.stor8Table(spark, sf001)
    assert(CommitLog.latestVersion(t) === 2L)
    val before = CommitLog.liveFiles(t, 1L)
    val after = CommitLog.liveFiles(t, 2L)
    assert(before.forall(_.startsWith("file_month=")))
    assert(after.forall(_.startsWith("bin=")))
    assert(after.size < before.size,
      s"compaction must reduce the file count: ${before.size} -> ${after.size}")
    // every live unit is one physical parquet file after compaction
    val dd = CommitLog.dataDir(t)
    after.foreach { rel =>
      assert(parquetFilesUnder(s"$dd/$rel") >= 1) }
    // bit-level integrity across the rewrite: the v1 (month files) and
    // v2 (compacted) snapshots carry the identical multiset
    import org.apache.spark.sql.functions._
    def sig(v: Long) = CommitLog.read(spark, t, Some(v))
      .agg(count(lit(1)), sum(col("l_orderkey")),
        sum(floor(col("l_quantity") * 100 + lit(0.5)).cast("long")))
      .collect()(0).toSeq
    assert(sig(1L) === sig(2L))
    // nothing expired: the month files are still on disk for v1 reads
    assert(before.forall(rel => new File(dd, rel).exists()))
  }

  test("stor9: increments reconcile to the full table; rewrite refuses") {
    import org.apache.spark.sql.functions._
    val t = QueriesStorage.stor9Table(spark, sf001)
    assert(CommitLog.latestVersion(t) === 3L)
    // the three increments partition the table: cumulative rows equal
    // a full head-snapshot read, and files never overlap
    val incFiles = (1L to 3L).map(v => CommitLog.addedFiles(t, v - 1, v))
    assert(incFiles.flatten.distinct.size === incFiles.map(_.size).sum,
      "increments must not overlap")
    val incRows = (1L to 3L).map(v =>
      CommitLog.readIncrement(spark, t, v - 1, v).count()).sum
    assert(incRows === CommitLog.read(spark, t).count())
    // a multi-commit range unions the same files as the per-commit reads
    assert(CommitLog.addedFiles(t, 0L, 3L).toSet ===
      incFiles.flatten.toSet)
    // refusal: an increment spanning stor8's REWRITE commit must throw
    // (file-level increments would double-count rewritten rows)
    val rw = QueriesStorage.stor8Table(spark, sf001)
    val e = intercept[IllegalStateException] {
      CommitLog.addedFiles(rw, 1L, 2L)
    }
    assert(e.getMessage.contains("non-append commit"))
    // refusal: a range reaching below the expiry horizon must throw
    val exp = QueriesStorage.stor7Table(spark, sf001)
    intercept[CommitLog.SnapshotExpired] {
      CommitLog.addedFiles(exp, 1L, 4L)
    }
  }

  test("stor7: protocol summary is fully green and matches the log") {
    val t = QueriesStorage.stor7Table(spark, sf001)
    val sm = QueriesStorage.stor7Summary(t)
    assert(sm("version_head") === "4")
    assert(sm("n_conflicts") === "1")
    assert(sm("n_manifests_expired") === "3")
    assert(sm("expired_read_refused") === "true")
    assert(sm("files_physically_gone") === "true")
    // the log agrees with the summary after the fact
    assert(CommitLog.latestVersion(t) === 4L)
    intercept[CommitLog.SnapshotExpired](CommitLog.liveFiles(t, 3L))
    val live = CommitLog.liveFiles(t, 4L)
    assert(live.nonEmpty && live.forall(_ > "file_month=1995-06-30"))
  }
}
