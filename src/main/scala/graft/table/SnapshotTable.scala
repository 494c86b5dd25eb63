package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-style snapshot table layer, from scratch (SURVEY.md §7.1 —
  * no iceberg runtime jar offline): each commit writes a new immutable
  * data directory plus a snapshot JSON manifest, then atomically swaps
  * the `current` pointer. Readers resolve `current` → snapshot → data
  * paths, so a crashed writer can never expose partial output — the
  * same "no checkpoint without durable write" invariant the reference
  * enforces with per-chunk Kafka flush + watermark commit
  * (TxaKafkaItemWriter.java:66-79).
  *
  * Layout:
  * {{{
  * <root>/data/<snapshotId>/…(partitioned parquet)…
  * <root>/metadata/snapshot-<snapshotId>.json
  * <root>/metadata/current            (the committed snapshot id)
  * }}}
  */
final class SnapshotTable(val root: String) {

  private val metaDir = Paths.get(root, "metadata")

  def currentSnapshotId: Option[String] = {
    val p = metaDir.resolve("current")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  /** Commit `df` as a new snapshot. Data lands fully before any
    * metadata becomes visible. Returns the snapshot id.
    *
    * @param partitionByCols Hive-style partition columns (the engine's
    *   year=/month=/day= output layout, analog of
    *   DocumentRowMapper.java:52-61)
    */
  def commit(df: DataFrame, partitionByCols: Seq[String],
      summary: Map[String, String] = Map.empty): String = {
    val snapshotId = f"${System.currentTimeMillis()}%013d-${currentSnapshotId.map(_ => nextSeq()).getOrElse(0)}%06d"
    val dataPath = Paths.get(root, "data", snapshotId).toString
    val writer = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionByCols.nonEmpty) writer.partitionBy(partitionByCols: _*)
     else writer).parquet(dataPath)
    // data durable — now the manifest, then the atomic pointer swap
    Files.createDirectories(metaDir)
    val files = listParquet(Paths.get(dataPath))
    val json = snapshotJson(snapshotId, dataPath, files, summary)
    Files.write(metaDir.resolve(s"snapshot-$snapshotId.json"),
      json.getBytes(StandardCharsets.UTF_8))
    val tmp = metaDir.resolve("current.tmp")
    Files.write(tmp, snapshotId.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir.resolve("current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snapshotId
  }

  /** Read the currently-committed snapshot. */
  def read(spark: SparkSession): DataFrame = currentSnapshotId match {
    case Some(id) => readAt(spark, id)
    case None =>
      throw new IllegalStateException(s"table $root has no committed snapshot")
  }

  /** Time travel: read the table as of a specific committed snapshot
    * (snapshots are immutable — an Iceberg `VERSION AS OF` analog). */
  def readAt(spark: SparkSession, snapshotId: String): DataFrame =
    spark.read
      .option("basePath", Paths.get(root, "data", snapshotId).toString)
      .parquet(Paths.get(root, "data", snapshotId).toString)

  /** All committed snapshot ids in commit order (ids are
    * timestamp-prefixed, so lexicographic order == commit order). */
  def history(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(metaDir)) return Seq.empty
    Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("snapshot-") && n.endsWith(".json"))
      .map(_.stripPrefix("snapshot-").stripSuffix(".json"))
      .toSeq.sorted
  }

  /** Incremental read: union of snapshots committed strictly AFTER
    * `sinceSnapshotId` up to `current` — the Iceberg incremental-scan
    * analog that lets a downstream consumer resume from its own
    * checkpointed snapshot id instead of re-reading the table. */
  def readIncremental(spark: SparkSession,
      sinceSnapshotId: String): DataFrame = {
    val newer = history().filter(_ > sinceSnapshotId)
    if (newer.isEmpty)
      spark.emptyDataFrame
    else
      newer.map(readAt(spark, _)).reduce(_.unionByName(_))
  }

  def snapshotSummary(id: String): Map[String, String] = {
    val p = metaDir.resolve(s"snapshot-$id.json")
    val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    """"summary\.([^"]+)"\s*:\s*"([^"]*)"""".r
      .findAllMatchIn(raw).map(m => m.group(1) -> m.group(2)).toMap
  }

  private var seq = 0
  private def nextSeq(): Int = { seq += 1; seq }

  private def listParquet(dir: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(dir)) Seq.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
  }

  private def snapshotJson(id: String, dataPath: String,
      files: Seq[String], summary: Map[String, String]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val fileList = files.map(q).mkString("[", ",", "]")
    val sum = summary.map { case (k, v) => s"${q("summary." + k)}: ${q(v)}" }
    (Seq(
      s"${q("snapshot-id")}: ${q(id)}",
      s"${q("data-path")}: ${q(dataPath)}",
      s"${q("file-count")}: ${files.length}",
      s"${q("files")}: $fileList") ++ sum).mkString("{", ",", "}")
  }
}
