package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SpatialJoinSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("epsJoin matches brute force on random points") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 200).map(i =>
      (i.toLong, rnd.nextDouble() * 10 - 5, rnd.nextDouble() * 10 - 5))
    val eps = 0.8
    val expected = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if i != j && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps
    } yield (i, j)).toSet

    val df = pts.toDF("id", "x", "y")
    val got = SpatialJoin.epsJoin(df, df, eps)
      .filter($"l_id" =!= $"r_id")
      .select($"l_id", $"r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.length shouldBe got.toSet.size // no duplicate pairs from the 3x3 replication
    got.toSet shouldBe expected
  }

  test("neighborCounts matches brute-force degrees") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.1, 0.0), (3L, 0.2, 0.0), (4L, 5.0, 5.0))
    val got = SpatialJoin.neighborCounts(pts.toDF("id", "x", "y"), 0.15, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got shouldBe Map(1L -> 1L, 2L -> 2L, 3L -> 1L) // 4 has none and is absent
  }
}

class DBSCANClusteringMlSpec extends AnyFunSuite with Matchers {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimator fit + model transform assigns new points to clusters") {
    val df = graft.core.Golden.rows.map(_._1).toDF()
    val model = new graft.ml.DBSCANClustering()
      .setEps(0.3).setMinPoints(10).setMaxPointsPerPartition(250)
      .fit(df)

    model.labeled.count() shouldBe 749
    model.partitions should not be empty

    // Transform the training points: non-noise points must get their own
    // cluster (their nearest core within eps is in that cluster).
    val labeledMap = model.labeled.collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getInt(2)).toMap
    val out = model.transform(df).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getInt(2)))
    out.length shouldBe 749
    val mismatches = out.count { case (p, c) =>
      val expected = labeledMap(p)
      expected != 0 && c != expected
    }
    mismatches shouldBe 0
  }

  test("model save/load round-trips params, labels, partitions, transform") {
    val df = graft.core.Golden.rows.map(_._1).toDF()
    val model = new graft.ml.DBSCANClustering()
      .setEps(0.3).setMinPoints(10).setMaxPointsPerPartition(250)
      .fit(df)
    val path = java.nio.file.Files.createTempDirectory("graft_ml_model")
      .resolve("m").toString
    model.write.overwrite().save(path)
    val loaded = graft.ml.DBSCANClusteringModel.load(path)

    loaded.uid shouldBe model.uid
    loaded.getEps shouldBe model.getEps
    loaded.getMinPoints shouldBe model.getMinPoints
    loaded.partitions shouldBe model.partitions

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getDouble(0), r.getDouble(1), r.getInt(2), r.getString(3))
    loaded.labeled.collect().map(key).sorted shouldBe
      model.labeled.collect().map(key).sorted

    // transform through the loaded model must equal the original's
    val probe = Seq((0.0, 0.0), (9.9, 9.9)).toDF("x", "y")
    val a = model.transform(probe).collect().map(r => (r.getDouble(0), r.getInt(2)))
    val b = loaded.transform(probe).collect().map(r => (r.getDouble(0), r.getInt(2)))
    b.sorted shouldBe a.sorted
  }
}
