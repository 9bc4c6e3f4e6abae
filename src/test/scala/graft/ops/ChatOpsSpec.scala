package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChatOpsSpec extends SparkSpec {

  import spark.implicits._

  private val twoTurn =
    """[{"role":"user","content":"hi there"},{"role":"assistant","content":"hello"}]"""
  private val trailingUser =
    """[{"role":"user","content":"a"},{"role":"assistant","content":"b"},{"role":"user","content":"c"}]"""

  test("flattenChat/turnCount/endsWithAssistant over well-formed conversations") {
    val out = Seq((1L, twoTurn), (2L, trailingUser)).toDF("id", "c")
      .select($"id", ChatOps.turnCount($"c").as("n"),
        ChatOps.endsWithAssistant($"c").as("v"),
        ChatOps.flattenChat($"c").as("f"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getBoolean(2), r.getString(3))).toMap
    assert(out(1L) == ((2, true, "<|user|>hi there<|assistant|>hello")))
    assert(out(2L) == ((3, false, "<|user|>a<|assistant|>b<|user|>c")))
  }

  test("unparseable and null payloads degrade to null, never throw") {
    val out = Seq((1L, "not json"), (2L, null.asInstanceOf[String]), (3L, "[]"))
      .toDF("id", "c")
      .select($"id", ChatOps.turnCount($"c").as("n"),
        ChatOps.endsWithAssistant($"c").as("v"),
        ChatOps.flattenChat($"c").as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1), r.isNullAt(2), r.isNullAt(3)))
      .toMap
    assert(out(1L) == ((-1, true, true)))  // malformed -> null through
    assert(out(2L) == ((-1, true, true)))  // null -> null
    // empty conversation: 0 turns, definitively NOT trainable (false,
    // not null), empty flat string
    assert(out(3L)._1 == 0 && !out(3L)._2)
  }

  test("null-content turns render empty, never vanish, and fail the gate") {
    val missingContent =
      """[{"role":"user","content":"hi"},{"role":"assistant"}]"""
    val r = Seq(missingContent).toDF("c")
      .select(ChatOps.turnCount($"c"), ChatOps.endsWithAssistant($"c"),
        ChatOps.flattenChat($"c"))
      .as[(Int, Boolean, String)].head()
    // the content-less assistant turn still appears in the flat string
    // (turnCount and flat agree), and the example is NOT trainable
    assert(r == ((2, false, "<|user|>hi<|assistant|>")))
  }

  test("extra JSON fields are ignored by the wire schema") {
    val extra =
      """[{"role":"assistant","content":"x","model":"m","tokens":42}]"""
    val r = Seq(extra).toDF("c")
      .select(ChatOps.flattenChat($"c"), ChatOps.endsWithAssistant($"c"))
      .as[(String, Boolean)].head()
    assert(r == (("<|assistant|>x", true)))
  }
}
