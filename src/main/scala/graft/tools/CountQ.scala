package graft.tools
object CountQ { def main(a: Array[String]): Unit = {
  println(s"queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
  val q = graft.SparkEntry.queries.keySet; val o = graft.SparkEntry.oracleSql.keySet
  println(s"unoracled=${(q -- o).toSeq.sorted.mkString(",")}")
  println(s"orphan_oracles=${(o -- q).toSeq.sorted.mkString(",")}")
}}
