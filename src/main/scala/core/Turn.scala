package core

import java.sql.Timestamp

/** The pinned input schema (BASELINE.json:15 / SURVEY.md §2.2). */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Turn + scoring/labels (SURVEY.md §2.3 `ScoredTurn`). */
case class ScoredTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    lang: String,
    lang_conf: Double,
    ppl: Double,
    rule_hits: Seq[String],
    keep: Boolean,
    scrubbed_text: String)

/** Generator output: Turn fields + the planted violation/PII marker
  * (`""` = clean, a rule name, or `"pii"`) for conformance suite (a).
  */
case class GenTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    planted: String) {
  def toTurn: Turn = Turn(conv_id, turn_idx, role, text, tool, ts)
}
