package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Conversation / SFT-data formatting operators: instruction-tuning
  * corpora arrive as JSON conversations (`[{role, content}, ...]`) and
  * leave as flat training strings with role sentinels. All row-local
  * (`from_json` + higher-order functions — no explode, no shuffle, no
  * UDF): a map-only scan at any corpus size.
  */
object ChatOps {

  /** The wire schema of one conversation: an array of (role, content)
    * turns. Unknown JSON fields are ignored by `from_json`; a
    * non-JSON payload parses to null (callers gate on [[turnCount]]).
    */
  val ConversationSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Typed turns of a conversation JSON string. */
  def parseConversation(json: Column): Column =
    from_json(json, ConversationSchema)

  /** Number of turns (null for unparseable payloads). */
  def turnCount(json: Column): Column = size(parseConversation(json))

  /** An SFT example must END on the assistant: a trailing user turn has
    * no target tokens to learn. (The standard validity gate.)
    * `try_element_at`: an EMPTY conversation has no last turn — under
    * ANSI mode a plain element_at(-1) would fail the task instead of
    * gating the row out with null.
    */
  def endsWithAssistant(json: Column): Column =
    try_element_at(parseConversation(json), lit(-1))
      .getField("role") === "assistant"

  /** Flatten a conversation into one training string:
    * `<|role|>content` per turn, concatenated in order — the generic
    * chat-template shape (swap the sentinel scheme at the call site for
    * a specific tokenizer's template).
    */
  def flattenChat(json: Column): Column =
    array_join(transform(parseConversation(json),
      t => concat(lit("<|"), t.getField("role"), lit("|>"),
        t.getField("content"))), "")
}
