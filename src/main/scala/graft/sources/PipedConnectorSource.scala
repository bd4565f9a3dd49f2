package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.StructType
import graft.state.StateStore

/** Distributed connector extraction: N connector invocations run as N Spark
  * tasks, each streaming its child's stdout through a lazy iterator — the
  * cluster-scale generalization of [[SubprocessSource]] (whose single pipe
  * is inherently one producer, exactly like the reference).
  *
  * Shape: `parallelize(commands)` → `flatMap(spawn + line-iterate)` → typed
  * demux in Spark. Each task holds ONE line in memory at a time; 1000
  * executors run 1000 connector segments concurrently (per-stream shards,
  * per-table connectors, date-range splits…). This is the `RDD.pipe` idea
  * with protocol awareness: RECORD lines become rows, STATE lines are
  * collected (they're tiny) and folded into the driver-side [[StateStore]]
  * in command order, TRACE ERRORs fail the task (Spark retries/propagates —
  * the distributed analog of kill-on-early-exit, reference tap.py:626-642).
  */
object PipedConnectorSource {

  /** One protocol message row. `seq` is the message's position within its
    * command's output — STATE merge order must be total, and Spark's sort
    * is not stable, so (cmd_index, seq) is the deterministic fold key.
    */
  final case class RawMessage(
      cmd_index: Int, seq: Long, msg_type: String, stream: String, payload: String)

  /** Run every command as its own task; parse the Airbyte JSONL protocol
    * into [[RawMessage]] rows. Lazy per-line — no buffering of the child's
    * output beyond the current line.
    */
  def readMessages(spark: SparkSession, commands: Seq[Seq[String]]): Dataset[RawMessage] = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(commands.zipWithIndex, math.max(commands.size, 1))
      .flatMap { case (cmd, idx) =>
        val pb = new ProcessBuilder(cmd: _*)
        val proc = pb.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        val mapper = new ObjectMapper()
        new Iterator[RawMessage] {
          private var nextLine: String = advance()
          private var msgSeq = 0L
          private def advance(): String = {
            val l = reader.readLine()
            if (l == null) {
              val code = proc.waitFor()
              reader.close()
              if (code != 0) throw new RuntimeException(s"connector[$idx] exited $code")
            }
            l
          }
          override def hasNext: Boolean = nextLine != null
          override def next(): RawMessage = {
            val line = nextLine
            nextLine = advance()
            val s = msgSeq
            msgSeq += 1
            try {
              val node = mapper.readTree(line)
              val t = Option(node.get("type")).map(_.asText).getOrElse("UNKNOWN")
              t match {
                case "RECORD" =>
                  val rec = node.get("record")
                  RawMessage(idx, s, "RECORD", rec.path("stream").asText,
                    mapper.writeValueAsString(rec.get("data")))
                case "TRACE"
                    if node.path("trace").path("type").asText == "ERROR" =>
                  throw new RuntimeException(
                    s"connector[$idx] error: ${node.path("trace").path("error").toString}")
                case other =>
                  RawMessage(idx, s, other, "", mapper.writeValueAsString(node))
              }
            } catch {
              case e: RuntimeException => throw e
              case _: Exception => RawMessage(idx, s, "UNPARSEABLE", "", line)
            }
          }
        }
      }
      .toDS()
  }

  /** Typed records of one stream from the distributed message set. */
  def records(messages: Dataset[RawMessage], stream: String, schema: StructType): DataFrame =
    messages
      .filter(col("msg_type") === "RECORD" && col("stream") === stream)
      .select(from_json(col("payload"), schema).as("r"))
      .select("r.*")

  /** Fold the (few, small) STATE messages into `state` in deterministic
    * (cmd_index, seq) order — a total order, so last-wins merge is
    * well-defined even for multiple STATEs from one command. STATE volume
    * is O(checkpoints), not O(rows) — collecting to the driver is the
    * correct topology, same as the reference emitting them on its single
    * stdout.
    */
  def foldStates(messages: Dataset[RawMessage], state: StateStore): StateStore = {
    val mapper = new ObjectMapper()
    messages.filter(col("msg_type") === "STATE")
      .orderBy(col("cmd_index"), col("seq"))
      .collect()
      .foreach { m =>
        val node = mapper.readTree(m.payload)
        Option(node.get("state")).foreach(state.merge)
      }
    state
  }
}
