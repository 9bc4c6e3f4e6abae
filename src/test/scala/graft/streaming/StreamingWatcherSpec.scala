package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sink.UpsertSink

/** The full streaming DAG: BlockHeadStream -> foreachBatch strategy
  * dispatch (ReorgGuard / head log / StateReconcile) with idempotent
  * merges, killed and restarted from the checkpoint mid-stream (T8).
  */
class StreamingWatcherSpec extends SparkSpec {

  import spark.implicits._

  /** Chain whose head advances when the test says so. */
  private final class TestChain extends BlockSource {
    val head = new AtomicLong(5L)
    @volatile var states: Map[String, Int] = Map("p1" -> 1, "p2" -> 1)
    def latest(): Block = Block(BigInt(head.get), hashAt(BigInt(head.get)), BigInt(0))
    def hashAt(n: BigInt): String = s"0xh$n"
    def blockAt(n: BigInt): Block = Block(n, hashAt(n), BigInt(0))
    def multicall(ids: Seq[String]): Map[String, Int] = states
  }

  test("streaming DAG resumes from checkpoint and converges (kill/restart)") {
    val root = Files.createTempDirectory("graft_sw")
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val checkpoint = root.resolve("chk").toString
    val chain = new TestChain
    BlockHeadStream.registry("sw-chain") = chain

    sink.overwrite("Proposal",
      Seq(("p1", 1, "Active"), ("p2", 1, "Active")).toDF("id", "rawState", "state"),
      pk = Seq("id"))

    // strategies: idempotent head log merge, chain-state reconcile,
    // reorg guard, and one that always throws (isolation)
    val headLog = new Strategy {
      val name = "headLog"
      def onBlock(b: Block): Unit =
        sink.merge("Head", Seq((b.number.toLong, b.hash)).toDF("number", "hash"),
          Seq("number"))
    }
    val reconcile = new Strategy {
      val name = "stateReconcile"
      def onBlock(b: Block): Unit = {
        val updates = StateReconcile.reconcile(spark, sink.read("Proposal"),
          chain.multicall(Seq("p1", "p2")))
        if (!updates.isEmpty) sink.merge("Proposal", updates, Seq("id"))
      }
    }
    val reorg = new Strategy {
      val name = "reorgGuard"
      val guard = new ReorgGuard(chain, sink)
      def onBlock(b: Block): Unit = {
        // stored head always agrees in this test; must never rebuild
        val fired = guard.check(Some(Block(b.number, chain.hashAt(b.number), BigInt(0)))) {
          () => Map("Head" -> Seq((-1L, "REBUILT")).toDF("number", "hash"))
        }
        assert(!fired)
      }
    }
    val poisoned = new Strategy {
      val name = "poisoned"
      def onBlock(b: Block): Unit = throw new RuntimeException(s"boom@${b.number}")
    }

    val watcher = new StreamingWatcher(spark, "sw-chain",
      Seq(headLog, reconcile, reorg, poisoned), checkpoint)

    // --- run 1: head = 5 -> processes height 5, then the query stops
    val q1 = watcher.start(Trigger.AvailableNow())
    q1.awaitTermination(60000)
    assert(sink.read("Head").as[(Long, String)].collect().toSet == Set((5L, "0xh5")))

    // --- between runs: chain advances and p1's on-chain state changes
    chain.head.set(10L)
    chain.states = Map("p1" -> 7, "p2" -> 1)

    // --- run 2: same checkpoint -> resumes at 6, no gaps, no re-dos
    val q2 = watcher.start(Trigger.AvailableNow())
    q2.awaitTermination(60000)

    val heads = sink.read("Head").as[(Long, String)].collect().toSet
    assert(heads == (5L to 10L).map(n => n -> s"0xh$n").toSet,
      s"restart did not resume cleanly: $heads")
    // reconcile converged: p1 updated from the chain, p2 untouched
    val states = sink.read("Proposal").select("id", "state")
      .as[(String, String)].collect().toMap
    assert(states == Map("p1" -> "Executed", "p2" -> "Active"))
    // the poisoned strategy was isolated but recorded
    assert(watcher.errors("poisoned").getMessage.startsWith("boom@"))
  }
}
