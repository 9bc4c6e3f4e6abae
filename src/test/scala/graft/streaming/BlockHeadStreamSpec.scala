package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The custom MicroBatchStream block-head source: gapless offset ranges,
  * catch-up over missed heights, per-batch delivery into foreachBatch.
  */
class BlockHeadStreamSpec extends SparkSpec {

  private final class FakeChain(@volatile var head: Long) extends BlockSource {
    def latest(): Block = Block(BigInt(head), s"0x$head", BigInt(head * 10))
    def hashAt(number: BigInt): String = s"0x$number"
    override def blockAt(number: BigInt): Block =
      Block(number, s"0x$number", number * 10)
    def multicall(ids: Seq[String]): Map[String, Int] = Map.empty
  }

  test("micro-batches cover every height exactly once, including missed blocks") {
    val chain = new FakeChain(100L)
    BlockHeadStream.registry("c1") = chain
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]

    val stream = spark.readStream
      .format("graft.streaming.BlockHeadStreamProvider")
      .option("source", "c1").load()
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select("number").collect().map(_.getLong(0))
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(seen.toSeq == Seq(100L)) // fresh query starts at the head

    // the chain advances by 3 while nobody polls -> one catch-up batch
    chain.head = 103L
    val q2 = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select("number").collect().map(_.getLong(0))
        }
        ()
      }
      .start()
    q2.awaitTermination()
    // without a shared checkpoint q2 is a fresh query from the new head
    assert(seen.toSet.contains(103L))
  }

  test("checkpointed restart resumes from the committed height (no gaps)") {
    val chain = new FakeChain(10L)
    BlockHeadStream.registry("c2") = chain
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bh").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]

    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.BlockHeadStreamProvider")
        .option("source", "c2").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= batch.select("number", "hash").collect()
              .map(r => (r.getLong(0), r.getString(1)))
          }
          ()
        }
        .start()
      q.awaitTermination()
    }

    drain() // delivers height 10
    chain.head = 14L
    drain() // must deliver 11,12,13,14 — every missed height, in order
    assert(seen.toSeq == Seq(10L, 11L, 12L, 13L, 14L).map(h => (h, s"0x$h")))
  }
}
