package graft.expressions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[BoundedTopKAgg]] must equal the window rank it replaces —
  * `row_number().over(partitionBy(group).orderBy(score, id))` — on
  * arbitrary data: duplicate scores (id tiebreak), negative scores,
  * groups smaller than k, both sort directions, and inputs spread
  * over multiple partitions (so the partial/merge/serialize paths all
  * execute, not just a single update loop).
  */
object BoundedTopKProps extends Properties("BoundedTopK") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("bounded-topk-props").getOrCreate()

  private val genCase: Gen[(Seq[(String, Double, Long)], Int, Boolean)] = for {
    n <- Gen.chooseNum(1, 120)
    groups <- Gen.chooseNum(1, 4)
    // small integral score domain → guaranteed ties → id tiebreak matters
    scores <- Gen.listOfN(n, Gen.chooseNum(-5, 5))
    k <- Gen.chooseNum(1, 8)
    asc <- Gen.oneOf(true, false)
  } yield (scores.zipWithIndex.map { case (s, i) =>
    (s"g${i % groups}", s.toDouble, i.toLong)
  }, k, asc)

  property("equals the window row_number rank it replaces") =
    Prop.forAll(genCase) { case (rows, k, asc) =>
      import spark.implicits._
      val df = rows.toDF("g", "s", "id").repartition(4)
      val got = df.groupBy(col("g"))
        .agg(BoundedTopKAgg.bounded_top_k(col("s"), col("id"), k, asc).as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), (col("pos") + 1).as("rank"),
          col("col.score").as("s"), col("col.id").as("id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (g, grp) =>
        val ord = if (asc) grp.sortBy(t => (t._2, t._3))
                  else grp.sortBy(t => (-t._2, t._3))
        ord.take(k).zipWithIndex.map { case ((_, s, id), i) => (g, i + 1, s, id) }
      }.toSet
      got == want
    }
}
