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
