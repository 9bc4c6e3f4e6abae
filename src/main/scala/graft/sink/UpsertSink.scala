package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent primary-key upsert sink — the Spark re-expression of the
  * reference's `INSERT .. ON CONFLICT(pk) DO UPDATE` batched writer
  * (src/handlers/dbUpsert.ts:50-85) and its atomic snapshot swap
  * (src/handlers/schema.ts:4-49).
  *
  * Without a transactional table format in this environment, merge is:
  * read current table, anti-join out the updated keys, union the new
  * versions, write to a shadow location, atomically swap directories
  * (K5). On Delta/Iceberg this whole class collapses to `MERGE INTO` —
  * the operator surface (`merge(df, table, pk)`) is format-agnostic on
  * purpose.
  *
  * Conflict semantics: within one incoming batch, last-write-wins by
  * `versionCol` (ties broken deterministically); across batches the newest
  * write replaces the stored row wholesale — matching the reference's
  * DO UPDATE SET all-columns behavior (dbUpsert.ts:76-79).
  */
final class UpsertSink(spark: SparkSession, root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)

  def exists(table: String): Boolean = Files.exists(tableDir(table))

  def read(table: String): DataFrame = spark.read.parquet(tableDir(table).toString)

  /** Create-if-missing (the reference's create-missing-only DDL mode,
    * dbCreator.ts:186-222): write only when absent.
    */
  def createIfMissing(table: String, df: DataFrame): Unit =
    if (!exists(table)) overwrite(table, df)

  /** Full atomic replace (initializeDb / reorg rebuild path): write to a
    * shadow dir, then swap — readers never observe a partial table
    * (schema.ts:10-49; reorgCleanupStrategy.ts:43-50).
    */
  def overwrite(table: String, df: DataFrame): Unit = {
    val target = tableDir(table)
    val shadow = Paths.get(root, s".${table}__shadow")
    deleteRecursively(shadow)
    df.write.mode(SaveMode.Overwrite).parquet(shadow.toString)
    val old = Paths.get(root, s".${table}__old")
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(shadow, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** PK merge: upsert `updates` into `table`. `versionCol` orders versions
    * within the incoming batch (e.g. blockNumber); rows whose keys match
    * existing rows replace them.
    */
  def merge(table: String, updates: DataFrame, pk: Seq[String],
            versionCol: Option[String] = None): Unit = {
    val latest = dedupeLastWins(updates, pk, versionCol)
    val merged =
      if (!exists(table)) latest
      else {
        val current = read(table)
        current.join(latest.select(pk.map(col): _*), pk, "left_anti")
          .unionByName(latest)
      }
    overwrite(table, merged)
  }

  /** Last-write-wins within a batch: one row per PK. */
  private def dedupeLastWins(df: DataFrame, pk: Seq[String],
                             versionCol: Option[String]): DataFrame = {
    val order = versionCol.map(v => Seq(col(v).desc)).getOrElse(Seq.empty) ++
      df.columns.filterNot(pk.contains).map(c => col(c).desc).toSeq
    val w = Window.partitionBy(pk.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}

object Retry {
  /** Exponential backoff: delay = initial * 2^(attempt-1), maxRetries
    * attempts (src/handlers/dbUpsert.ts:25-48; config/default.yml:7-8).
    */
  def withBackoff[T](maxRetries: Int, initialDelayMs: Long,
                     sleep: Long => Unit = Thread.sleep)(op: () => T): T = {
    var attempt = 0
    var result: Option[T] = None
    var lastError: Throwable = null
    while (result.isEmpty && attempt <= maxRetries) {
      if (attempt > 0) sleep(initialDelayMs * (1L << (attempt - 1)))
      try result = Some(op())
      catch { case e: Exception => lastError = e }
      attempt += 1
    }
    result.getOrElse(throw lastError)
  }
}
