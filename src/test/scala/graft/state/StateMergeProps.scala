package graft.state

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import scala.jdk.CollectionConverters._

/** Property tests for the STATE merge semantics (SURVEY §7 "hard parts":
  * the reference's dual V1+V2 merge, reference tap.py:819-884). Random
  * interleavings of STREAM/GLOBAL/LEGACY messages must preserve:
  *   1. per-descriptor last-wins for STREAM entries,
  *   2. at most one GLOBAL entry (holding the last value),
  *   3. LEGACY clears the whole V2 list,
  *   4. the V2 list never holds two entries for one stream descriptor.
  */
object StateMergeProps extends Properties("StateStore.merge") {
  private val mapper = new ObjectMapper()

  sealed trait Msg
  final case class StreamMsg(name: String, cursor: Int) extends Msg
  final case class GlobalMsg(cursor: Int) extends Msg
  final case class LegacyMsg(cursor: Int) extends Msg

  private val genMsg: Gen[Msg] = Gen.oneOf(
    for { n <- Gen.oneOf("s1", "s2", "s3"); c <- Gen.choose(0, 999) } yield StreamMsg(n, c),
    Gen.choose(0, 999).map(GlobalMsg(_)),
    Gen.choose(0, 999).map(LegacyMsg(_)))

  private def toJson(m: Msg) = m match {
    case StreamMsg(n, c) => mapper.readTree(
      s"""{"type":"STREAM","stream":{"stream_descriptor":{"name":"$n"},"stream_state":{"c":"$c"}}}""")
    case GlobalMsg(c) => mapper.readTree(
      s"""{"type":"GLOBAL","global":{"shared_state":{"c":"$c"}}}""")
    case LegacyMsg(c) => mapper.readTree(s"""{"type":"LEGACY","legacy":{"c":"$c"}}""")
  }

  property("last-wins per descriptor; singleton GLOBAL; LEGACY clears") =
    Prop.forAll(Gen.listOf(genMsg)) { msgs =>
      val store = new StateStore()
      msgs.foreach(m => store.merge(toJson(m)))
      val v2 = Option(store.snapshot.get("airbyte_state")).toSeq
        .flatMap(_.elements().asScala).toSeq

      // model: replay the rules on plain maps
      val sinceLegacy = msgs.reverse.takeWhile(!_.isInstanceOf[LegacyMsg]).reverse
      val legacySeen = msgs.exists(_.isInstanceOf[LegacyMsg])
      val expectStreams = sinceLegacy.collect { case StreamMsg(n, c) => n -> c }
        .groupBy(_._1).view.mapValues(_.last._2).toMap
      val expectGlobal = sinceLegacy.collect { case GlobalMsg(c) => c }.lastOption

      val gotStreams = v2.filter(_.path("type").asText == "STREAM").map { e =>
        e.path("stream").path("stream_descriptor").path("name").asText ->
          e.path("stream").path("stream_state").path("c").asText.toInt
      }.toMap
      val globals = v2.filter(_.path("type").asText == "GLOBAL")
      val legacies = v2.filter(_.path("type").asText == "LEGACY")

      (gotStreams == expectStreams) :| s"streams: $gotStreams != $expectStreams" &&
      (v2.count(_.path("type").asText == "STREAM") == gotStreams.size) :| "dup descriptors" &&
      (globals.size == expectGlobal.size) :| s"globals: ${globals.size}" &&
      expectGlobal.forall(c =>
        globals.head.path("global").path("shared_state").path("c").asText.toInt == c) :| "global value" &&
      (legacySeen || legacies.isEmpty) :| "phantom legacy" &&
      (!(legacySeen && sinceLegacy.isEmpty) || (legacies.size == 1 && v2.size == 1)) :| "legacy clear"
    }
}
