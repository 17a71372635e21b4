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
  *   - **File-level column statistics**: commits record per-file min/max
  *     bounds for the tracked columns (Iceberg manifests' lower_bounds /
  *     upper_bounds), computed in ONE pass over the commit's own files —
  *     bounded by commit size, never table size. [[scan]] prunes files whose
  *     bounds cannot intersect the caller's range predicates, metadata-side,
  *     before Spark plans the read. Missing bounds always KEEP the file
  *     (pruning can only ever be a subset of a correct scan), so old
  *     snapshots without stats and untracked columns degrade to no pruning,
  *     never to wrong results. String bounds are truncated Iceberg-style
  *     (lower bound truncated = still a lower bound; upper bound truncated
  *     then last char incremented = still an upper bound) and recorded only
  *     when ASCII, where Java lexicographic order coincides with Spark's
  *     binary UTF-8 ordering — non-ASCII extremes store no bound rather
  *     than risk a cross-ordering mis-prune.
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

  /** Per-file inclusive [lo, hi] bounds for one column. `None` = unbounded
    * on that side (e.g. a truncated string upper bound that could not be
    * incremented). `isLong` selects numeric vs lexicographic comparison.
    */
  final case class ColBounds(lo: Option[String], hi: Option[String], isLong: Boolean)
  final case class ManifestEntry(path: String, lang: String,
      stats: Map[String, ColBounds] = Map.empty)
  final case class Snapshot(id: Int, entries: Seq[ManifestEntry])

  /** Range predicate for stats-based file pruning (inclusive both ends). */
  sealed trait StatPredicate { def column: String }
  final case class LongBetween(column: String, lo: Long, hi: Long) extends StatPredicate
  final case class StringBetween(column: String, lo: String, hi: String) extends StatPredicate

  /** Columns whose per-file bounds commits record by default. */
  val defaultStatsColumns: Seq[String] = Seq("fileId", "repo")

  /** Iceberg-style string-bound truncation width (chars). */
  private val truncWidth = 16

  private def isAscii(s: String): Boolean = s.forall(_ < 128)

  /** Lower bound: a truncated prefix is still a valid lower bound. */
  private def truncLower(s: String): Option[String] =
    if (!isAscii(s)) None else Some(s.take(truncWidth))

  /** Upper bound: truncate then increment the last incrementable char so the
    * result still upper-bounds every string with the truncated prefix. */
  private def truncUpper(s: String): Option[String] =
    if (!isAscii(s)) None
    else if (s.length <= truncWidth) Some(s)
    else {
      val t = s.take(truncWidth).toCharArray
      val i = t.lastIndexWhere(_ < Char.MaxValue)
      if (i < 0) None
      else Some(new String(t, 0, i) + (t(i) + 1).toChar)
    }

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

  /** Inverse of [[jstr]] for an already-unquoted body. */
  private def junstr(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
        case 'u' => out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
        case c => out += c; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toString
  }

  private def jOptStr(v: Option[String]): String = v.fold("null")(jstr)

  private def entryLine(e: ManifestEntry): String = {
    val stats =
      if (e.stats.isEmpty) ""
      else e.stats.toSeq.sortBy(_._1).map { case (c, b) =>
        s"""{"col":${jstr(c)},"type":"${if (b.isLong) "long" else "string"}",""" +
          s""""lo":${jOptStr(b.lo)},"hi":${jOptStr(b.hi)}}"""
      }.mkString(""","stats":[""", ",", "]")
    s"""{"path":${jstr(e.path)},"lang":${jstr(e.lang)}$stats}"""
  }

  // path/lang are written jstr-escaped, so they must be parsed with the
  // escaped-string pattern (the old [^"]+ form silently dropped any entry
  // whose path or lang contained '"' or '\' — a scan would then MISS
  // committed files with no error; ADVICE r4) and unescaped via junstr.
  private val lineRe =
    """\{"path":"((?:[^"\\]|\\.)+)","lang":"((?:[^"\\]|\\.)+)"(?:,"stats":\[(.*)\])?\}""".r
  private val boundsRe =
    """\{"col":"([^"]+)","type":"(long|string)","lo":(null|"(?:[^"\\]|\\.)*"),"hi":(null|"(?:[^"\\]|\\.)*")\}""".r

  private def parseBound(v: String): Option[String] =
    if (v == "null") None else Some(junstr(v.substring(1, v.length - 1)))

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
    // Hint-gap fallback (ADVICE r4): a racing older committer can regress
    // the hint by more than one id; if retention then deleted the hinted
    // manifest AND its successor, the forward probe stops inside the
    // expired gap and misses the newer committed snapshots. Recover with
    // ONE bounded listing of the METADATA dir (a handful of snap-N.json
    // files — never the data tree).
    if (id >= 0 && !Files.exists(manifestFile(table, id))) {
      val snapRe = """snap-(\d+)\.json""".r
      val dir = metaDir(table)
      id =
        if (!Files.isDirectory(dir)) -1
        else Files.list(dir).iterator().asScala
          .flatMap(p => snapRe.unapplySeq(p.getFileName.toString).map(_.head.toInt))
          .foldLeft(-1)(math.max)
    }
    id
  }

  def snapshot(table: String, id: Int): Snapshot = {
    val f = manifestFile(table, id)
    require(Files.exists(f),
      s"table $table has no snapshot $id (expired or never committed)")
    val lines = Files.readAllLines(f).asScala
    Snapshot(id, lines.toSeq.filter(_.nonEmpty).map {
      case lineRe(p, l, statsBlob) =>
        val stats = Option(statsBlob).toSeq.flatMap { blob =>
          boundsRe.findAllMatchIn(blob).map { m =>
            m.group(1) -> ColBounds(
              parseBound(m.group(3)), parseBound(m.group(4)),
              isLong = m.group(2) == "long")
          }
        }.toMap
        ManifestEntry(junstr(p), junstr(l), stats)
      // a manifest line this reader can't parse means missing FILES, not a
      // smaller table — fail loudly, never silently scan a subset
      case bad => throw new IllegalStateException(
        s"unparsable manifest entry in $f: $bad")
    })
  }

  /** Append `files` (CodeTable schema) as a new snapshot: new data files
    * under a fresh write prefix, manifest = base entries + new, CAS-claimed
    * id (see object doc). Returns the new snapshot id.
    *
    * `clusterBy` is the Iceberg sort-order analog: range-partition the
    * commit's rows on the given columns before writing, so each data file
    * covers a narrow value range and the recorded bounds become TIGHT —
    * stats pruning then drops most files for a selective range predicate.
    * Without clustering, bounds are still correct but typically span the
    * whole domain (every file keeps every predicate), so stats pruning
    * degrades to no-op. One extra range exchange per commit, amortized
    * over every future pruned scan.
    */
  def commitAppend(spark: SparkSession, table: String, files: DataFrame,
      statsColumns: Seq[String] = defaultStatsColumns,
      clusterBy: Seq[String] = Nil, clusterParts: Int = 0): Int =
    commit(spark, table, files, keepPrevious = true, statsColumns, clusterBy,
      clusterParts)

  /** Replace the table contents as a new snapshot (previous snapshots stay
    * readable — time travel — until [[expireSnapshots]] removes them). */
  def commitOverwrite(spark: SparkSession, table: String, files: DataFrame,
      statsColumns: Seq[String] = defaultStatsColumns,
      clusterBy: Seq[String] = Nil, clusterParts: Int = 0): Int =
    commit(spark, table, files, keepPrevious = false, statsColumns, clusterBy,
      clusterParts)

  private def commit(
      spark: SparkSession, table: String, files: DataFrame,
      keepPrevious: Boolean, statsColumns: Seq[String],
      clusterBy: Seq[String], clusterParts: Int): Int = {
    // Data files first, under a commit-unique prefix: the expensive part
    // runs outside the commit race, and a failed/abandoned commit leaves
    // only unreferenced files (cleaned by maintenance), never a corrupt
    // table — Iceberg's write-then-commit order.
    val dataDir = Paths.get(table, "data", s"w-${java.util.UUID.randomUUID()}")
    // explicit partition count when given: an AQE session otherwise
    // coalesces a small range exchange down to one partition, collapsing
    // the per-file ranges the clustering exists to create
    val toWrite =
      if (clusterBy.isEmpty) files
      else if (clusterParts > 0)
        files.repartitionByRange(clusterParts, clusterBy.map(col): _*)
      else files.repartitionByRange(clusterBy.map(col): _*)
    toWrite.write.partitionBy("lang").parquet(dataDir.toString)
    // enumerate exactly the files this write produced (bounded by this
    // commit's size, not table size)
    // per-file column bounds for the tracked columns: ONE aggregation over
    // exactly the files this commit wrote (grouped by input_file_name) —
    // the analog of Iceberg writers accumulating bounds as they write.
    // #rows collected = #files in this commit, never table size.
    val statCols = statsColumns.filter(files.columns.contains)
    statCols.foreach { c =>
      val dt = files.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.StringType,
        s"stats column $c must be long or string, got $dt")
    }
    val statsByPath: Map[String, Map[String, ColBounds]] =
      if (statCols.isEmpty) Map.empty
      else {
        val aggs = statCols.flatMap(c =>
          Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))
        spark.read.parquet(dataDir.toString)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val p = new java.net.URI(r.getAs[String]("file")).getPath
            val bounds = statCols.flatMap { c =>
              (Option(r.getAs[Any](s"lo_$c")), Option(r.getAs[Any](s"hi_$c"))) match {
                case (Some(lo), Some(hi)) =>
                  val b =
                    if (files.schema(c).dataType == org.apache.spark.sql.types.LongType)
                      ColBounds(Some(lo.toString), Some(hi.toString), isLong = true)
                    else
                      ColBounds(truncLower(lo.toString), truncUpper(hi.toString),
                        isLong = false)
                  if (b.lo.isEmpty && b.hi.isEmpty) None else Some(c -> b)
                case _ => None
              }
            }.toMap
            p -> bounds
          }.toMap
      }
    val written = Files.walk(dataDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map { p =>
        val lang = p.getParent.getFileName.toString.stripPrefix("lang=")
        ManifestEntry(p.toString, lang, statsByPath.getOrElse(p.toString, Map.empty))
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
        (carried ++ written).map(entryLine)
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

  /** True iff the file's recorded bounds show it CANNOT contain a row
    * matching `p`. Missing stats / missing column / type mismatch ⇒ might
    * match (keep): pruning is only ever a subset of a correct scan.
    * Truncated string bounds stay conservative by construction (a truncated
    * lower bound is ≤ every true value; a truncated-then-incremented upper
    * bound is ≥ every true value).
    */
  private def cannotMatch(stats: Map[String, ColBounds], p: StatPredicate): Boolean =
    stats.get(p.column).exists { b =>
      p match {
        case LongBetween(_, lo, hi) if b.isLong =>
          b.lo.exists(_.toLong > hi) || b.hi.exists(_.toLong < lo)
        case StringBetween(_, lo, hi) if !b.isLong =>
          b.lo.exists(_ > hi) || b.hi.exists(_ < lo)
        case _ => false
      }
    }

  /** Scan a snapshot (default: current), pruning partitions from the
    * manifest BEFORE Spark plans the read: only matching files are handed
    * to the reader, so the scan's file set is O(matching partitions)
    * regardless of table size — no directory listing anywhere.
    * `langs = None` reads everything.
    *
    * `predicates` prunes further on the per-file column bounds the commit
    * recorded (Iceberg's lower_bounds/upper_bounds): a file is dropped only
    * when its bounds PROVE no row can satisfy every predicate. The
    * predicates are also re-applied as Spark filters on the result, so the
    * scan is exact whether or not any file carries stats — stats only
    * shrink the file list.
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
      snapshotId: Option[Int] = None,
      predicates: Seq[StatPredicate] = Nil): DataFrame = {
    val id = snapshotId.getOrElse(currentSnapshotId(table))
    require(id >= 0, s"table $table has no snapshots")
    val entries = snapshot(table, id).entries
    val langPruned = langs match {
      case Some(ls) => entries.filter(e => ls.contains(e.lang))
      case None => entries
    }
    val pruned = langPruned.filterNot(e => predicates.exists(cannotMatch(e.stats, _)))
    val residual = predicates.map {
      case LongBetween(c, lo, hi) => col(c).between(lo, hi)
      case StringBetween(c, lo, hi) => col(c).between(lo, hi)
    }.reduceOption(_ && _)
    val base =
      if (pruned.isEmpty) {
        // empty selection: preserve the schema without reading data
        CodeTable.schemaOnly(spark)
      } else {
        spark.read.parquet(pruned.map(_.path): _*)
          .withColumn("lang",
            regexp_extract(input_file_name(), "lang=([^/]+)/", 1))
      }
    // stats pruning only shrinks the FILE list; the row-level predicate must
    // still run (a kept file may contain non-matching rows) — this is what
    // makes the scan exact whether or not any file carries bounds.
    residual.fold(base)(base.where)
  }
}
