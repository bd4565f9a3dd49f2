package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Inventory integrity: Scala Map literals silently deduplicate
  * repeated keys and `++` silently lets the later map win, so a query
  * name defined twice SHADOWS a green query without any error — it
  * happened twice (r14 found q_gini/q_scd2/q_time_travel dead in
  * Relational, and nearly re-lost q_readability/q_k_anonymity the same
  * way). This spec makes the collision loud: every `"q_*" ->` key in
  * the query source files must appear EXACTLY twice (once in
  * `queries`, once in `oracleSql`), and the assembled maps must agree
  * key-for-key.
  */
class InventorySpec extends AnyFunSuite {

  private val queryFiles = Seq(
    "src/main/scala/graft/queries/Parity.scala",
    "src/main/scala/graft/queries/Relational.scala",
    "src/main/scala/graft/queries/LlmOps.scala",
    "src/main/scala/graft/queries/SqlSurface.scala",
    "src/main/scala/graft/queries/StreamSync.scala")

  test("every query key appears exactly twice in the sources (query + oracle)") {
    val keyRe = """"(q_[a-z0-9_]+)"\s*->""".r
    val counts = queryFiles
      .flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.charset.StandardCharsets.UTF_8)
        keyRe.findAllMatchIn(src).map(_.group(1)).toSeq
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    val bad = counts.filter(_._2 != 2)
    assert(bad.isEmpty,
      s"query keys not defined exactly twice (shadowing or missing oracle): " +
        bad.toSeq.sortBy(_._1).mkString(", "))
  }

  test("assembled queries and oracleSql maps agree key-for-key") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }
}
