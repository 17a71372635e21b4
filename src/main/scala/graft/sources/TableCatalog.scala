package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal Iceberg-style table format over the partitioned parquet layout
  * (the north-star input names an Iceberg source; no table-format runtime
  * ships in this environment, so the four properties the engine actually
  * depends on are implemented directly, matching the Iceberg spec's
  * structure at 1/100th the surface):
  *
  *   - **Snapshot isolation / atomic commit with OPTIMISTIC CONCURRENCY**:
  *     every commit writes its data files under a fresh `data/w-<uuid>/`
  *     prefix (never keyed by snapshot id — concurrent writers must not
  *     collide on data paths), then claims the next snapshot id by
  *     atomically creating `metadata/snap-N.json`: the manifest is written
  *     to a temp file and HARD-LINKED into place (`Files.createLink` fails
  *     with FileAlreadyExistsException if another committer won N — a true
  *     CAS on POSIX, unlike a rename whose no-replace check is TOCTOU).
  *     A loser re-reads the now-newer base snapshot, rebases its carried
  *     entry list, and retries with N+1 — Iceberg's commit protocol
  *     (spec §Metastore tables / HadoopTableOperations). BOTH commits
  *     survive. `version-hint.text` is advisory (swapped via atomic rename
  *     after the manifest exists); readers probe forward from it, so a
  *     stale or regressed hint can never hide a committed snapshot.
  *   - **Manifest-driven scan planning**: [[scan]] reads the file list from
  *     the manifest — NOT from a recursive directory listing, which at
  *     10^12-file scale is the thing that doesn't scale — and prunes
  *     partitions metadata-side before Spark ever sees a path. The pruned
  *     file set becomes ONE parquet relation (one scan node regardless of
  *     partition-value count); `lang` is recovered from the file path.
  *   - **Time travel**: [[scan]] at any retained snapshot id; reading an
  *     expired or unknown id fails with a clear error.
  *   - **Snapshot retention**: [[expireSnapshots]] drops all but the newest
  *     `keepLast` snapshots and deletes exactly the data files referenced
  *     only by expired manifests — computed from metadata (expired ∖
  *     retained entry sets), no directory walk.
  *
  * Partitioning is by `lang` (the natural low-cardinality predicate column,
  * same as [[CodeTable.writePartitioned]]); row-group min/max pushdown
  * inside each file is parquet-native and unaffected.
  *
  * Paths are local-filesystem (java.nio) — the sandbox's storage; on a real
  * deployment these operations target an object store / DFS through the
  * same create-if-absent CAS primitive.
  */
object TableCatalog {

  final case class ManifestEntry(path: String, lang: String)
  final case class Snapshot(id: Int, entries: Seq[ManifestEntry])

  private def metaDir(table: String): Path = Paths.get(table, "metadata")
  private def hintFile(table: String): Path = metaDir(table).resolve("version-hint.text")
  private def manifestFile(table: String, id: Int): Path =
    metaDir(table).resolve(s"snap-$id.json")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Current snapshot id, or -1 for an empty/nonexistent table.
    *
    * The hint is a fast-path HINT, not the truth: a committer that created
    * `snap-N.json` but hasn't swapped the hint yet (or whose slower rival
    * regressed it) must still be visible, so we probe forward from the
    * hinted id until the first missing manifest — O(1 + commits since the
    * hint was written), never a directory listing.
    */
  def currentSnapshotId(table: String): Int = {
    val hinted =
      if (Files.exists(hintFile(table)))
        new String(Files.readAllBytes(hintFile(table)), StandardCharsets.UTF_8).trim.toInt
      else -1
    var id = hinted
    while (Files.exists(manifestFile(table, id + 1))) id += 1
    id
  }

  def snapshot(table: String, id: Int): Snapshot = {
    val f = manifestFile(table, id)
    require(Files.exists(f),
      s"table $table has no snapshot $id (expired or never committed)")
    val lines = Files.readAllLines(f).asScala
    val re = """\{"path":"([^"]+)","lang":"([^"]+)"\}""".r
    Snapshot(id, lines.toSeq.collect { case re(p, l) => ManifestEntry(p, l) })
  }

  /** Append `files` (CodeTable schema) as a new snapshot: new data files
    * under a fresh write prefix, manifest = base entries + new, CAS-claimed
    * id (see object doc). Returns the new snapshot id.
    */
  def commitAppend(spark: SparkSession, table: String, files: DataFrame): Int =
    commit(spark, table, files, keepPrevious = true)

  /** Replace the table contents as a new snapshot (previous snapshots stay
    * readable — time travel — until [[expireSnapshots]] removes them). */
  def commitOverwrite(spark: SparkSession, table: String, files: DataFrame): Int =
    commit(spark, table, files, keepPrevious = false)

  private def commit(
      spark: SparkSession, table: String, files: DataFrame,
      keepPrevious: Boolean): Int = {
    // Data files first, under a commit-unique prefix: the expensive part
    // runs outside the commit race, and a failed/abandoned commit leaves
    // only unreferenced files (cleaned by maintenance), never a corrupt
    // table — Iceberg's write-then-commit order.
    val dataDir = Paths.get(table, "data", s"w-${java.util.UUID.randomUUID()}")
    files.write.partitionBy("lang").parquet(dataDir.toString)
    // enumerate exactly the files this write produced (bounded by this
    // commit's size, not table size)
    val written = Files.walk(dataDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map { p =>
        val lang = p.getParent.getFileName.toString.stripPrefix("lang=")
        ManifestEntry(p.toString, lang)
      }
      .toSeq.sortBy(_.path)
    Files.createDirectories(metaDir(table))

    // CAS retry loop: claim prev+1 by atomically linking the manifest into
    // place; on a lost race, rebase on the winner's snapshot and retry.
    var attempts = 0
    var committed = -1
    while (committed < 0) {
      attempts += 1
      require(attempts <= 1000, s"commit to $table lost the CAS race 1000 times")
      val prev = currentSnapshotId(table)
      val next = prev + 1
      val carried =
        if (keepPrevious && prev >= 0) snapshot(table, prev).entries else Seq.empty
      val tmp = metaDir(table).resolve(s"snap-$next.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp,
        (carried ++ written)
          .map(e => s"""{"path":${jstr(e.path)},"lang":${jstr(e.lang)}}""")
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      try {
        // commit point: hard-link is create-if-absent-atomic on POSIX —
        // exactly one committer can materialize snap-N.json
        Files.createLink(manifestFile(table, next), tmp)
        committed = next
      } catch {
        case _: FileAlreadyExistsException => // lost the race: rebase, retry
      } finally Files.deleteIfExists(tmp)
    }
    // advisory fast-path hint (readers probe forward, so a racing older
    // committer overwriting this with a smaller id is harmless)
    val tmp = metaDir(table).resolve(s"version-hint.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, committed.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, hintFile(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    committed
  }

  /** Drop all snapshots except the newest `keepLast`, deleting the data
    * files that only expired snapshots reference. Metadata-driven: the
    * delete set is (∪ expired entries) ∖ (∪ retained entries) — no
    * directory walk. Time travel to an expired id then fails cleanly
    * ([[snapshot]]'s require); current reads are unaffected.
    * Returns the number of data files deleted.
    */
  def expireSnapshots(table: String, keepLast: Int): Int = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val current = currentSnapshotId(table)
    if (current < 0) return 0
    val ids = (0 to current).filter(id => Files.exists(manifestFile(table, id)))
    val (expired, retained) = ids.partition(_ <= current - keepLast)
    if (expired.isEmpty) return 0
    val keepPaths = retained.flatMap(id => snapshot(table, id).entries.map(_.path)).toSet
    val dropPaths = expired.flatMap(id => snapshot(table, id).entries.map(_.path))
      .distinct.filterNot(keepPaths)
    dropPaths.foreach { p =>
      val path = Paths.get(p)
      Files.deleteIfExists(path)
      // tidy now-empty lang=/w-<uuid> dirs (best-effort; ignore non-empty)
      try {
        Files.deleteIfExists(path.getParent)
        Files.deleteIfExists(path.getParent.getParent)
      } catch { case _: java.nio.file.DirectoryNotEmptyException => }
    }
    expired.foreach(id => Files.deleteIfExists(manifestFile(table, id)))
    dropPaths.size
  }

  /** Scan a snapshot (default: current), pruning partitions from the
    * manifest BEFORE Spark plans the read: only matching files are handed
    * to the reader, so the scan's file set is O(matching partitions)
    * regardless of table size — no directory listing anywhere.
    * `langs = None` reads everything.
    *
    * ONE parquet relation over the pruned file list (one scan node in the
    * plan however many partition values match — a per-value union plan
    * would grow O(#values)); `lang` is not stored in the data files
    * (partitionBy strips it) and is recovered from each row's file path,
    * which is exactly the partition directory the manifest recorded.
    */
  def scan(
      spark: SparkSession, table: String,
      langs: Option[Seq[String]] = None,
      snapshotId: Option[Int] = None): DataFrame = {
    val id = snapshotId.getOrElse(currentSnapshotId(table))
    require(id >= 0, s"table $table has no snapshots")
    val entries = snapshot(table, id).entries
    val pruned = langs match {
      case Some(ls) => entries.filter(e => ls.contains(e.lang))
      case None => entries
    }
    if (pruned.isEmpty) {
      // empty selection: preserve the schema without reading data
      CodeTable.schemaOnly(spark)
    } else {
      spark.read.parquet(pruned.map(_.path): _*)
        .withColumn("lang",
          regexp_extract(input_file_name(), "lang=([^/]+)/", 1))
    }
  }
}
