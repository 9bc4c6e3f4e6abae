package graft.sink

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** JDBC upsert writer through the pluggable connection seam: statement
  * shape, chunking by batchSize, retry composition — mirrors
  * dbUpsert.test.ts offline (no real Postgres in this environment).
  */
class JdbcUpsertSinkSpec extends SparkSpec {

  import spark.implicits._

  test("upsertSql: ON CONFLICT DO UPDATE over non-key columns") {
    val sql = JdbcUpsertSink.upsertSql("Builder",
      Seq("id", "name", "score"), Seq("id"), rowCount = 2)
    assert(sql ==
      """INSERT INTO "Builder" ("id", "name", "score") VALUES (?, ?, ?), (?, ?, ?) """ +
      """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "score" = EXCLUDED."score"""")
  }

  test("upsertSql: composite key; all-key rows degrade to DO NOTHING") {
    val composite = JdbcUpsertSink.upsertSql("t", Seq("k1", "k2", "v"),
      Seq("k1", "k2"), 1)
    assert(composite.contains("""ON CONFLICT ("k1", "k2") DO UPDATE SET "v" = EXCLUDED."v""""))
    val allKey = JdbcUpsertSink.upsertSql("t", Seq("k1", "k2"), Seq("k1", "k2"), 1)
    assert(allKey.endsWith("""ON CONFLICT ("k1", "k2") DO NOTHING"""))
  }

  test("merge chunks by batchSize and streams row-major params") {
    JdbcFakes.reset()
    val sink = new JdbcUpsertSink(new RecordingFactory, batchSize = 10)
    val df = (1 to 25).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(1).sortWithinPartitions("id")
    sink.merge("Builder", df, Seq("id"))
    val stmts = JdbcFakes.statements.asScala.toSeq
    assert(stmts.map(_._2.size / 2).sorted == Seq(5, 10, 10)) // 25 rows -> 10+10+5
    assert(stmts.forall(_._1.startsWith("""INSERT INTO "Builder"""")))
    val allParams = stmts.sortBy(_._2.head.asInstanceOf[Long])
      .flatMap(_._2.grouped(2).map(p => (p(0), p(1))))
    assert(allParams == (1 to 25).map(i => (i.toLong, s"n$i")))
    assert(JdbcFakes.closes.get == 1) // one connection for the one partition
  }

  test("chunk size is capped so rows x cols stays under the int16 bind limit") {
    JdbcFakes.reset()
    // 5 columns at batchSize 10000 would be 50,000 binds per statement —
    // past the Postgres wire protocol's int16 parameter-count cap; the
    // effective chunk must shrink to MaxBindParams / cols = 6400 rows
    val sink = new JdbcUpsertSink(new RecordingFactory, batchSize = 10000)
    val df = (1 to 7000).map(i => (i.toLong, i, i, i, s"n$i"))
      .toDF("id", "a", "b", "c", "name").repartition(1)
    sink.merge("t", df, Seq("id"))
    val sizes = JdbcFakes.statements.asScala.toSeq.map(_._2.size)
    assert(sizes.forall(_ <= JdbcUpsertSink.MaxBindParams),
      s"statement exceeds bind cap: ${sizes.max}")
    assert(sizes.sorted == Seq(600 * 5, 6400 * 5)) // 7000 rows -> 6400 + 600
  }

  test("each chunk retries with backoff; persistent failure propagates") {
    JdbcFakes.reset()
    JdbcFakes.failFirstN.set(2) // two transient failures, then healthy
    val sink = new JdbcUpsertSink(new RecordingFactory, batchSize = 100,
      maxRetries = 3, initialRetryDelayMs = 1)
    sink.merge("t", Seq((1L, "a")).toDF("id", "v").repartition(1), Seq("id"))
    assert(JdbcFakes.attempts.get == 3) // 2 failures + 1 success
    assert(JdbcFakes.statements.size == 1)

    JdbcFakes.reset()
    JdbcFakes.failFirstN.set(Int.MaxValue)
    val failing = new JdbcUpsertSink(new RecordingFactory, batchSize = 100,
      maxRetries = 1, initialRetryDelayMs = 1)
    val e = intercept[Exception] {
      failing.merge("t", Seq((1L, "a")).toDF("id", "v").repartition(1), Seq("id"))
    }
    assert(e.getMessage != null)
    assert(JdbcFakes.statements.isEmpty) // nothing recorded as written
  }
}

/** Executor-side recording state (local mode shares the JVM). */
object JdbcFakes {
  val statements = new ConcurrentLinkedQueue[(String, Seq[Any])]()
  val attempts = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val failFirstN = new AtomicInteger(0)
  def reset(): Unit = { statements.clear(); attempts.set(0); closes.set(0); failFirstN.set(0) }
}

final class RecordingFactory extends SqlConnectionFactory {
  def connect(): SqlConnection = new SqlConnection {
    def executeUpdate(sql: String, params: Seq[Any]): Int = {
      JdbcFakes.attempts.incrementAndGet()
      if (JdbcFakes.failFirstN.getAndUpdate(n => math.max(0, n - 1)) > 0)
        throw new RuntimeException("connection reset")
      JdbcFakes.statements.add(sql -> params)
      params.size
    }
    def close(): Unit = JdbcFakes.closes.incrementAndGet()
  }
}
