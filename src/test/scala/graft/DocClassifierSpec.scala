package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocClassifier

/** Trained linear classifier: separable-corpus convergence, bit-level
  * training determinism (the property the oracle gate rests on), and the
  * sf0.001 gate flags — the learnability claims the DuckDB oracle only
  * sees as frozen TRUE literals. */
class DocClassifierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Two disjoint vocabularies → linearly separable bag-of-words. */
  private def separable(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val y = i % 2
      val text =
        if (y == 1) s"alpha bravo charlie delta echo token${i % 7}"
        else s"zulu yankee xray whiskey victor word${i % 7}"
      (i.toLong, y, text)
    }.toDF("doc_id", "y", "text")
  }

  test("separable corpus trains to perfect holdout accuracy") {
    spark.sparkContext.setLogLevel("WARN")
    val m = DocClassifier.fitOn(separable(400))
    assert(m.nTrain > 0 && m.nTest > 0)
    assert(m.accTrain === 1.0, s"train acc ${m.accTrain}")
    assert(m.accTest === 1.0, s"test acc ${m.accTest}")
  }

  test("training is bit-deterministic across runs and partitionings") {
    val a = DocClassifier.fitOn(separable(300).repartition(7))
    val b = DocClassifier.fitOn(separable(300).repartition(2))
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.accTest === b.accTest)
  }

  test("sf0.001 gate: learns the quality boundary past the majority prior") {
    val df = DocClassifier.classifierGate(spark, "/root/testdata/sf0.001")
    val r = df.collect().head
    val m = DocClassifier.fit(spark, "/root/testdata/sf0.001")
    info(s"accTrain=${m.accTrain} accTest=${m.accTest} " +
      s"nTrain=${m.nTrain} nTest=${m.nTest} nPosTest=${m.nPosTest}")
    assert(r.getBoolean(4), s"acc_train_ok false (acc=${m.accTrain})")
    assert(r.getBoolean(5), s"acc_test_ok false (acc=${m.accTest})")
    assert(r.getBoolean(6), "beats_majority false")
  }

  test("sf0.01 gate: flags hold at the driver's correctness scale") {
    val r = DocClassifier.classifierGate(spark, "/root/testdata/sf0.01").collect().head
    val m = DocClassifier.fit(spark, "/root/testdata/sf0.01")
    info(s"accTrain=${m.accTrain} accTest=${m.accTest} nTest=${m.nTest}")
    assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
      s"gate flags ${r}, accTrain=${m.accTrain} accTest=${m.accTest}")
  }

  test("holdout scoring agrees with the gate's test accuracy") {
    val m = DocClassifier.fit(spark, "/root/testdata/sf0.001")
    val scored = DocClassifier.scoreHoldout(spark, "/root/testdata/sf0.001").collect()
    assert(scored.length.toLong == m.nTest)
    val ok = scored.count(r => r.getInt(1) == r.getInt(2))
    assert(ok.toDouble / scored.length === m.accTest)
  }
}
