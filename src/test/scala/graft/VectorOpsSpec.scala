package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(1.0f, 1.0f, 0.0f)),
    (3L, Seq(2.0f, 0.0f, 0.0f)) // colinear with 0
  ).toDF("vec_id", "embedding")

  private lazy val prep = VectorOps.prepared(vecs, "vec_id", "embedding")

  test("dot and norm2 fold deterministically") {
    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
      .as[Double].collect()(0)
    assert(d == 32.0)
  }

  test("native dot is bit-identical to the HOF fold on real embeddings") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
    val both = VectorOps.prepared(emb, "vec_id", "embedding")
      .select(VectorOps.dot(col("v"), col("v")).as("native"),
        VectorOps.dotHof(col("v"), col("v")).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("native dot fails fast on unequal lengths, nulls propagate") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("native dot yields null on null ELEMENTS, matching the HOF fold") {
    val row = Seq((Seq(Option(1.0), None, Option(3.0)),
      Seq(Option(1.0), Option(2.0), Option(3.0))))
      .toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dotHof(col("a"), col("b")).as("hof"))
      .collect()(0)
    assert(row.isNullAt(0), "native dot must not fold garbage over nulls")
    assert(row.isNullAt(1))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak, excludes self") {
    val out = VectorOps.bruteForceTopK(prep, prep.filter(col("id") === 0), 3)
      .select("id_n", "cos", "rank").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    // neighbor order for probe 0: colinear 3 (cos 1), diagonal 2, orthogonal 1
    assert(out.map(_._1).toSeq == Seq(3L, 2L, 1L))
    assert(out(0)._2 == 1.0)
    assert(out(2)._2 == 0.0)
  }

  test("lshTopK buckets colinear vectors together") {
    val out = VectorOps.lshTopK(prep, prep.filter(col("id") === 0), 8, 3, 3)
      .select("id_n").as[Long].collect().toSet
    assert(out.contains(3L)) // identical direction => identical bucket
  }

  test("ivfTopK searches only routed cells and ranks exactly") {
    val centroids = prep.filter(col("id") < 2)
    val out = VectorOps.ivfTopK(prep, prep.filter(col("id") === 0),
      centroids, nProbe = 2, k = 3)
      .select("id_n", "cos", "rank").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    // cells: {0,2,3} -> centroid 0 (2 ties, id asc), {1} -> centroid 1;
    // probe 0 routes to both cells => neighbors 3 (cos 1), 2, 1
    assert(out.map(_._1).toSeq == Seq(3L, 2L, 1L))
    assert(out(0)._2 == 1.0)
    assert(out(2)._2 == 0.0)
  }

  test("assignToCentroids picks the nearest centroid") {
    val centroids = prep.filter(col("id") < 2)
    val out = VectorOps.assignToCentroids(prep, centroids)
      .select("id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(out(0L) == 0L)
    assert(out(1L) == 1L)
    assert(out(3L) == 0L) // colinear with centroid 0
  }
}
