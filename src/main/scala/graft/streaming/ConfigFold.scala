package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A4/J6 — the orchestrator's control/data merge: a config stream is folded
  * into per-key state, and the latest state is applied to every work item
  * (reference examples/orchestrator/src/lib.rs:73-104,244-287: `select!`
  * over ConfigUpdate + WorkItem, latest multiplier applied, floor 1).
  *
  * Streaming form: both streams are tagged and unioned upstream, then
  * grouped by key into `flatMapGroupsWithState` — the canonical Spark shape
  * for broadcast-state joins. State is checkpointed (strictly stronger
  * than the reference, whose guest state dies with the process —
  * SURVEY §7.4.6).
  */
object ConfigFold {

  /** Tagged union element: exactly one of `config` / `work` is set.
    * (The reference's two channels collapse to one tagged stream; tags
    * preserve which side each record came from.) */
  case class Tagged(key: String, seq: Long, isConfig: Boolean,
                    multiplier: Int, payload: String)

  case class ConfigState(version: Int, multiplier: Int)

  case class Applied(key: String, seq: Long, configVersion: Int,
                     multiplier: Int, output: String)

  val initialState: ConfigState = ConfigState(0, 1)

  implicit val taggedEnc: Encoder[Tagged] = Encoders.product[Tagged]
  implicit val stateEnc: Encoder[ConfigState] = Encoders.product[ConfigState]
  implicit val appliedEnc: Encoder[Applied] = Encoders.product[Applied]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  /** Per-key fold. Within a group, records are processed in `seq` order
    * (the arrival order of the merged stream — the reference applies
    * whichever arrives first, FIXTURES.md §4). */
  def fold(key: String, it: Iterator[Tagged],
           state: GroupState[ConfigState]): Iterator[Applied] = {
    var st = state.getOption.getOrElse(initialState)
    val out = Seq.newBuilder[Applied]
    it.toSeq.sortBy(_.seq).foreach { t =>
      if (t.isConfig) {
        st = ConfigState(st.version + 1, math.max(1, t.multiplier))
      } else {
        out += Applied(key, t.seq, st.version, st.multiplier,
          s"${t.payload} x ${st.multiplier}")
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Apply over a (possibly streaming) tagged Dataset. */
  def apply(tagged: Dataset[Tagged]): Dataset[Applied] =
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold _)
}
