package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  test("triangleCount counts closed wedges once each") {
    // K4 on {1,2,3,4} (4 triangles) plus a dangling edge (4,5)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L))
    val df = spark.createDataFrame(edges).toDF("id_a", "id_b")
    assert(Components.triangleCount(df).collect().head.getLong(0) === 4L)
  }

  test("a triangle-free graph counts zero") {
    val path = spark.createDataFrame(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
      .toDF("id_a", "id_b")
    assert(Components.triangleCount(path).collect().head.getLong(0) === 0L)
  }
}
