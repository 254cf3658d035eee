package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-style ordered-funnel matching at ingest: a per-key state machine
  * over the event stream that recognizes the sequence
  * signup → click (within 24 h) → purchase (within 24 h of the click)
  * ACROSS micro-batches, emitting one completion record at the moment
  * the final stage matches — the complex-event-processing operator class
  * (MATCH_RECOGNIZE / Flink CEP territory), expressed as
  * `flatMapGroupsWithState` with checkpointed per-user state.
  *
  * The machine is forward-only and takes the FIRST qualifying event per
  * stage, so — given per-key in-time-order delivery — its output equals
  * the declarative MIN-per-stage batch formulation (q_funnel's shape),
  * which is what the oracle states. Within a batch the group iterator is
  * unordered; events sort by (t, event_id) before stepping. State per
  * key is three longs regardless of event volume.
  */
object FunnelMatch {

  case class Ev(user_id: Long, event_id: Long, event_type: String, t: Long)
  /** -1 = stage not reached. */
  case class FunnelState(t0: Long, t1: Long, t2: Long)
  case class Completion(user_id: Long, t0: Long, t1: Long, t2: Long)

  val WindowUs: Long = 86400000000L // 24 h in µs

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val stEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit val outEnc: Encoder[Completion] = Encoders.product[Completion]
  implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

  def step(user: Long, it: Iterator[Ev],
           state: GroupState[FunnelState]): Iterator[Completion] = {
    var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = Seq.newBuilder[Completion]
    // Hot-key posture: this buffers and sorts ONE key's events from ONE
    // micro-batch in task heap — the correct bound for keyed CEP (state
    // itself stays three longs), but a single pathologically hot user
    // can concentrate a whole trigger in one task. Salting is NOT an
    // option here (the machine is ordered per user; splitting a user
    // across tasks breaks sequence recognition) — the production lever
    // is admission control, bounding the trigger (maxFilesPerTrigger /
    // maxOffsetsPerTrigger) so batch-per-key stays heap-sized.
    it.toSeq.sortBy(e => (e.t, e.event_id)).foreach { e =>
      if (st.t2 < 0) e.event_type match {
        case "signup" if st.t0 < 0 =>
          st = st.copy(t0 = e.t)
        case "click" if st.t0 >= 0 && st.t1 < 0 &&
            e.t > st.t0 && e.t <= st.t0 + WindowUs =>
          st = st.copy(t1 = e.t)
        case "purchase" if st.t1 >= 0 &&
            e.t > st.t1 && e.t <= st.t1 + WindowUs =>
          st = st.copy(t2 = e.t)
          out += Completion(user, st.t0, st.t1, st.t2)
        case _ => ()
      }
    }
    state.update(st)
    out.result().iterator
  }

  def apply(events: Dataset[Ev]): Dataset[Completion] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step _)
}
