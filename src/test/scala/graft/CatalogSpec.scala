package graft

import org.apache.spark.sql.functions._

import graft.sources.{CodeTable, GraphSpec, TableCatalog}

/** The Iceberg-style catalog layer: snapshot commits, manifest-driven
  * partition pruning (no directory listing), and time travel. */
class CatalogSpec extends SparkTest {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_table_").toString

  test("append commits accumulate; overwrite replaces; time travel reads both") {
    val table = freshTable()
    val a = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 1L))
    val b = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 2L))
      .withColumn("fileId", col("fileId") + 1000000L)

    val s0 = TableCatalog.commitAppend(spark, table, a)
    val s1 = TableCatalog.commitAppend(spark, table, b)
    assert(s0 == 0 && s1 == 1 && TableCatalog.currentSnapshotId(table) == 1)

    val nA = a.count()
    val nB = b.count()
    assert(TableCatalog.scan(spark, table).count() == nA + nB)
    // time travel: snapshot 0 sees only the first commit
    assert(TableCatalog.scan(spark, table, snapshotId = Some(0)).count() == nA)

    val s2 = TableCatalog.commitOverwrite(spark, table, a)
    assert(TableCatalog.scan(spark, table).count() == nA)
    // previous snapshots stay readable after overwrite
    assert(TableCatalog.scan(spark, table, snapshotId = Some(s1)).count() == nA + nB)
    assert(s2 == 2)
  }

  test("manifest-level partition pruning hands Spark only matching files") {
    val table = freshTable()
    val files = CodeTable.generate(spark,
      GraphSpec(numCycles = 16, maxCycleLen = 5, extraArcsPerVertex = 0.4, seed = 3L))
    TableCatalog.commitAppend(spark, table, files)

    val all = TableCatalog.scan(spark, table)
    val pruned = TableCatalog.scan(spark, table, langs = Some(Seq("py")))
    assert(pruned.inputFiles.length < all.inputFiles.length,
      s"pruned=${pruned.inputFiles.length} all=${all.inputFiles.length}")
    assert(pruned.inputFiles.forall(_.contains("lang=py")))
    // pruning is exact: same rows as a post-scan filter
    assert(pruned.count() == all.filter(col("lang") === "py").count())
    // empty selection keeps the schema
    val none = TableCatalog.scan(spark, table, langs = Some(Seq("zz")))
    assert(none.count() == 0 && none.columns.contains("sha"))
  }

  test("two concurrent committers: both commits survive (optimistic CAS)") {
    val table = freshTable()
    val a = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 11L))
    val b = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 12L))
      .withColumn("fileId", col("fileId") + 1000000L)
    // both race commitAppend on the same empty table: exactly one wins
    // snapshot 0, the other must rebase onto it and land as snapshot 1 —
    // a silently-dropped commit shows up as a missing row set below
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(TableCatalog.commitAppend(spark, table, a))
    val fb = Future(TableCatalog.commitAppend(spark, table, b))
    val ids = Seq(Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(ids.sorted == Seq(0, 1), s"ids=$ids")
    assert(TableCatalog.currentSnapshotId(table) == 1)
    assert(TableCatalog.scan(spark, table).count() == a.count() + b.count())
    // the rebased loser carried the winner's entries forward
    val s1 = TableCatalog.snapshot(table, 1).entries.map(_.path).toSet
    assert(TableCatalog.snapshot(table, 0).entries.map(_.path).toSet.subsetOf(s1))
  }

  test("expireSnapshots drops old manifests + their orphaned data files") {
    val table = freshTable()
    val gen = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 13L))
    TableCatalog.commitAppend(spark, table, gen)               // snap 0
    TableCatalog.commitAppend(spark, table,                    // snap 1 (carries 0)
      gen.withColumn("fileId", col("fileId") + 1000000L))
    TableCatalog.commitOverwrite(spark, table, gen)            // snap 2 (fresh files)
    val n2 = TableCatalog.scan(spark, table).count()
    val oldPaths = TableCatalog.snapshot(table, 1).entries.map(_.path)
    val deleted = TableCatalog.expireSnapshots(table, keepLast = 1)
    // snaps 0+1 referenced the same physical append files; snap 2's
    // overwrite shares none of them, so every old path must be gone
    assert(deleted == oldPaths.distinct.size)
    assert(oldPaths.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    // time travel to an expired id fails cleanly; current reads unaffected
    intercept[IllegalArgumentException](TableCatalog.scan(spark, table, snapshotId = Some(0)))
    assert(TableCatalog.currentSnapshotId(table) == 2)
    assert(TableCatalog.scan(spark, table).count() == n2)
    TableCatalog.snapshot(table, 2).entries.foreach(e =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(e.path))))
  }

  test("pruned scan is ONE relation: a single parquet scan node in the plan") {
    val table = freshTable()
    TableCatalog.commitAppend(spark, table, CodeTable.generate(spark,
      GraphSpec(numCycles = 16, maxCycleLen = 5, extraArcsPerVertex = 0.4, seed = 14L)))
    val multi = TableCatalog.scan(spark, table, langs = Some(Seq("c", "py", "java")))
    val scanNodes = multi.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scanNodes.size == 1, s"expected one scan node, got ${scanNodes.size}")
    // lang recovery from the file path matches the partition the manifest
    // recorded for every row
    val langs = multi.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("c", "py", "java"))
  }

  test("file-level column stats prune the file list; scan stays exact") {
    val table = freshTable()
    val files = CodeTable.generate(spark,
      GraphSpec(numCycles = 32, maxCycleLen = 5, extraArcsPerVertex = 0.4, seed = 21L))
      // range-partition on fileId so each data file carries a TIGHT bound —
      // the precondition for bounds-based pruning to bite
      .repartitionByRange(8, col("fileId"))
    TableCatalog.commitAppend(spark, table, files)

    // manifest round-trip: entries carry parsed bounds with lo <= hi
    val entries = TableCatalog.snapshot(table, 0).entries
    assert(entries.forall(_.stats.contains("fileId")))
    entries.flatMap(_.stats.get("fileId")).foreach { b =>
      assert(b.isLong && b.lo.get.toLong <= b.hi.get.toLong)
    }

    val all = TableCatalog.scan(spark, table)
    val narrow = TableCatalog.scan(spark, table,
      predicates = Seq(TableCatalog.LongBetween("fileId", 50L, 120L)))
    assert(narrow.inputFiles.length < all.inputFiles.length,
      s"stats pruned nothing: ${narrow.inputFiles.length} of ${all.inputFiles.length}")
    // exact: pruning + residual == full scan + post-filter, row for row
    val expect = all.filter(col("fileId").between(50L, 120L))
      .select("fileId", "sha").collect().map(_.toString).sorted.toSeq
    val got = narrow.select("fileId", "sha").collect().map(_.toString).sorted.toSeq
    assert(got == expect && got.nonEmpty)

    // string-column bounds (repo) prune too, and agree with a post-filter
    val byRepo = TableCatalog.scan(spark, table,
      predicates = Seq(TableCatalog.StringBetween("repo", "repo00000", "repo00001")))
    assert(byRepo.inputFiles.length < all.inputFiles.length)
    assert(byRepo.count() ==
      all.filter(col("repo").between("repo00000", "repo00001")).count())
  }

  test("clusterBy commit tightens bounds: clustered prunes, unclustered keeps all") {
    val gen = CodeTable.generate(spark,
      GraphSpec(numCycles = 32, maxCycleLen = 5, extraArcsPerVertex = 0.4, seed = 24L))
    val pred = Seq(TableCatalog.LongBetween("fileId", 50L, 120L))

    // unclustered: round-robin partitions → every file spans ~the whole
    // fileId domain → bounds keep every file (correct, just no pruning)
    val flat = freshTable()
    TableCatalog.commitAppend(spark, flat, gen.repartition(8))
    val flatAll = TableCatalog.scan(spark, flat)
    val flatSel = TableCatalog.scan(spark, flat, predicates = pred)
    assert(flatSel.inputFiles.length == flatAll.inputFiles.length)

    // clustered on fileId: tight per-file ranges → most files pruned
    val clus = freshTable()
    TableCatalog.commitAppend(spark, clus, gen.repartition(8),
      clusterBy = Seq("fileId"), clusterParts = 8)
    val clusAll = TableCatalog.scan(spark, clus)
    val clusSel = TableCatalog.scan(spark, clus, predicates = pred)
    assert(clusSel.inputFiles.length < clusAll.inputFiles.length)

    // same rows either way (and same as a plain post-filter)
    val a = flatSel.select("fileId", "sha").collect().map(_.toString).sorted.toSeq
    val b = clusSel.select("fileId", "sha").collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stats-less files are kept: predicate scan exact without bounds") {
    val table = freshTable()
    val files = CodeTable.generate(spark,
      GraphSpec(numCycles = 8, maxCycleLen = 4, extraArcsPerVertex = 0.3, seed = 22L))
    // commit records NO stats (simulates pre-stats snapshots)
    TableCatalog.commitAppend(spark, table, files, statsColumns = Nil)
    assert(TableCatalog.snapshot(table, 0).entries.forall(_.stats.isEmpty))
    val all = TableCatalog.scan(spark, table)
    val filtered = TableCatalog.scan(spark, table,
      predicates = Seq(TableCatalog.LongBetween("fileId", 10L, 40L)))
    // no bounds → no file pruning, but the residual row filter MUST apply
    assert(filtered.inputFiles.length == all.inputFiles.length)
    assert(filtered.count() == all.filter(col("fileId").between(10L, 40L)).count())
    assert(filtered.count() < all.count())
  }

  test("truncated string bounds stay conservative (path > trunc width)") {
    val table = freshTable()
    val files = CodeTable.generate(spark,
      GraphSpec(numCycles = 16, maxCycleLen = 5, extraArcsPerVertex = 0.3, seed = 23L))
      .repartitionByRange(6, col("path"))
    // `path` values ("src/f000000042.py") exceed the 16-char truncation
    // width, so every recorded bound is truncated (lo) / truncated-and-
    // incremented (hi) — pruning on them must still never drop a match
    TableCatalog.commitAppend(spark, table, files, statsColumns = Seq("path"))
    val all = TableCatalog.scan(spark, table)
    // probe several ranges, including ones that straddle truncation points
    for ((lo, hi) <- Seq(
        ("src/f000000010", "src/f000000050z"),
        ("src/f0000001", "src/f0000002"),
        ("a", "zzz"))) {
      val got = TableCatalog.scan(spark, table,
        predicates = Seq(TableCatalog.StringBetween("path", lo, hi)))
      assert(got.count() == all.filter(col("path").between(lo, hi)).count(),
        s"range [$lo,$hi]")
    }
    // and at least one selective range actually prunes files
    val sel = TableCatalog.scan(spark, table,
      predicates = Seq(TableCatalog.StringBetween("path", "src/f000000010", "src/f000000050z")))
    assert(sel.inputFiles.length < all.inputFiles.length)
  }

  test("sha256 row invariant survives the catalog round-trip") {
    val table = freshTable()
    val files = CodeTable.generate(spark,
      GraphSpec(numCycles = 6, maxCycleLen = 4, extraArcsPerVertex = 0.2, seed = 4L))
    TableCatalog.commitAppend(spark, table, files)
    val bad = TableCatalog.scan(spark, table)
      .filter(sha2(col("content"), 256) =!= col("sha"))
      .count()
    assert(bad == 0)
  }
}
