package graft.sink

import org.apache.spark.sql.{DataFrame, Row}

/** Minimal SQL execution boundary — pluggable like the connector's
  * Transport so the writer is fully testable offline (the reference
  * mock-patches knex the same way, dbUpsert.test.ts). One instance per
  * partition; implementations need not be thread-safe.
  */
trait SqlConnection {
  /** Execute one parameterized statement; returns affected-row count. */
  def executeUpdate(sql: String, params: Seq[Any]): Int

  /** Execute one parameterized query; returns rows as value sequences.
    * Only admin paths ([[SchemaAdmin]]) need it, so writer-only fakes
    * can keep the default.
    */
  def executeQuery(sql: String, params: Seq[Any]): Seq[Seq[Any]] =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not implement executeQuery")

  def close(): Unit
}

/** Serializable factory shipped to executors; opens one connection per
  * partition (the standard foreachPartition-JDBC shape).
  */
trait SqlConnectionFactory extends Serializable {
  def connect(): SqlConnection
}

/** Postgres-parity upsert writer: the reference's actual sink is batched
  * `INSERT .. ON CONFLICT(pk) DO UPDATE SET col = EXCLUDED.col` through
  * knex (src/handlers/dbUpsert.ts:50-85, chunked by `batchSize` with
  * retry/backoff per chunk). This is that statement shape verbatim,
  * executed distributedly: `foreachPartition` opens one connection per
  * partition and streams `batchSize`-row multi-VALUES statements through
  * it — each executor writes its own partition concurrently, nothing
  * funnels through the driver.
  *
  * Exposes the same `merge(table, df, pk)` surface as [[UpsertSink]], so
  * pipelines swap between the parquet state store and a real Postgres by
  * switching the sink object. Idempotence (T8) comes from the ON
  * CONFLICT clause exactly as in the reference.
  *
  * At scale: batch inserts are bounded (`batchSize` rows per statement,
  * default 10,000 like config/default.yml:5); retry with exponential
  * backoff wraps each chunk (R1, dbUpsert.ts:25-48); a chunk that
  * exhausts retries throws and fails the task, so Spark's task retry +
  * the statement's idempotence give effectively-once delivery.
  */
final class JdbcUpsertSink(factory: SqlConnectionFactory,
                           batchSize: Int = 10000,
                           maxRetries: Int = 3,
                           initialRetryDelayMs: Long = 200L)
    extends Serializable {

  def merge(table: String, df: DataFrame, pk: Seq[String],
            versionCol: Option[String] = None): Unit = {
    require(pk.nonEmpty, s"merge into $table needs a primary key")
    val cols = df.columns.toSeq
    require(pk.forall(cols.contains), s"pk ${pk.mkString(",")} missing from ${cols.mkString(",")}")
    // one row per PK before batching: a chunk carrying the same key twice
    // makes Postgres reject the whole statement ("ON CONFLICT DO UPDATE
    // command cannot affect row a second time") — deterministically, so
    // retries cannot save it. Same last-wins semantics as UpsertSink.
    val deduped = MergeSemantics.dedupeLastWins(df, pk, versionCol)
    // the Postgres wire protocol carries the bind-parameter count as an
    // int16, so rows x cols per statement must stay under 32767 — a
    // row-count-only batchSize would fail deterministically on any
    // table with enough columns (10,000 rows x 4 cols = 40,000 binds)
    val bs = math.max(1, math.min(batchSize,
      JdbcUpsertSink.MaxBindParams / cols.size))
    val (f, mr, delay) = (factory, maxRetries, initialRetryDelayMs)
    deduped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        var conn = f.connect()
        try rows.grouped(bs).foreach { chunk =>
          val sql = JdbcUpsertSink.upsertSql(table, cols, pk, chunk.size)
          val params = chunk.iterator.flatMap(r => cols.map(c => r.getAs[Any](c))).toSeq
          Retry.withBackoff(mr, delay) { () =>
            try conn.executeUpdate(sql, params)
            catch { case e: Throwable =>
              // the dominant retryable failure is a dead/aborted
              // connection; retrying on it can never succeed — swap in
              // a fresh one before the backoff re-invokes
              try conn.close() catch { case _: Exception => () }
              conn = f.connect()
              throw e
            }
          }
        } finally conn.close()
      }
    }
  }
}

object JdbcUpsertSink {

  /** Postgres Bind carries the parameter count as int16; stay under it
    * with headroom (the effective per-statement row count is
    * `min(batchSize, MaxBindParams / columns)`).
    */
  val MaxBindParams: Int = 32000

  private def q(ident: String): String = SqlIdent.quote(ident)

  /** The reference's knex `.insert(batch).onConflict(pk).merge()` SQL:
    * multi-VALUES insert with DO UPDATE SET over every non-key column
    * (DO NOTHING when the row is all key). Parameter order is row-major,
    * matching the flattened row values.
    */
  def upsertSql(table: String, columns: Seq[String], pk: Seq[String],
                rowCount: Int): String = {
    require(rowCount > 0)
    val valuesRow = columns.map(_ => "?").mkString("(", ", ", ")")
    val values = Seq.fill(rowCount)(valuesRow).mkString(", ")
    val nonKey = columns.filterNot(pk.contains)
    val conflict =
      if (nonKey.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKey.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
    s"INSERT INTO ${q(table)} (${columns.map(q).mkString(", ")}) " +
      s"VALUES $values ON CONFLICT (${pk.map(q).mkString(", ")}) $conflict"
  }
}
