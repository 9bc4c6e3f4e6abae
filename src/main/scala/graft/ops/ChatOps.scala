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

  /** An SFT example must END on the assistant — a trailing user turn has
    * no target tokens to learn — and that final turn must actually HAVE
    * content: a turn whose content field is missing/null offers nothing
    * to train on, so it must not pass the gate (the flattened string
    * renders such a turn with empty content; see [[flattenChat]]).
    * `try_element_at`: an EMPTY conversation has no last turn — under
    * ANSI mode a plain element_at(-1) would fail the task instead of
    * gating the row out with null.
    */
  def endsWithAssistant(json: Column): Column = {
    val turns = parseConversation(json)
    val last = try_element_at(turns, lit(-1))
    // unparseable/null payload -> null (unknown); parseable but empty
    // or content-less -> definitively FALSE, not null — "there is
    // nothing to train on" is an answer, not missing data
    when(turns.isNull, lit(null).cast("boolean"))
      .otherwise(last.getField("role") === "assistant" &&
        last.getField("content").isNotNull)
  }

  /** Flatten a conversation into one training string:
    * `<|role|>content` per turn, concatenated in order — the generic
    * chat-template shape (swap the sentinel scheme at the call site for
    * a specific tokenizer's template). Null role/content render as
    * empty strings rather than silently DROPPING the turn (a null
    * element would vanish in array_join, leaving [[turnCount]] and the
    * flat string disagreeing about what the conversation contains).
    */
  def flattenChat(json: Column): Column =
    array_join(transform(parseConversation(json),
      t => concat(lit("<|"), coalesce(t.getField("role"), lit("")),
        lit("|>"), coalesce(t.getField("content"), lit("")))), "")
}
