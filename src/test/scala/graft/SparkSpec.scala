package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = {}
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${java.util.UUID.randomUUID().toString.take(8)}")
    .getOrCreate()

  /** Deterministic synthetic regression data: y = 3 + 2*x1 - 1.5*x2 + noise. */
  def regressionDF(spark: SparkSession, n: Int = 400, seed: Long = 7L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rnd.nextGaussian() * 2.0 + 1.0
      val x2 = rnd.nextGaussian() * 0.5 - 2.0
      val x3 = rnd.nextGaussian() // irrelevant feature
      val y = 3.0 + 2.0 * x1 - 1.5 * x2 + rnd.nextGaussian() * 0.3
      (x1, x2, x3, y)
    }.toDF("x1", "x2", "x3", "y")
  }

  /** Deterministic synthetic binary-label data (logistic ground truth). */
  def binaryDF(spark: SparkSession, n: Int = 500, seed: Long = 11L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rnd.nextGaussian()
      val x2 = rnd.nextGaussian() * 2.0
      val eta = -0.5 + 1.5 * x1 - 0.8 * x2
      val p = 1.0 / (1.0 + math.exp(-eta))
      val y = if (rnd.nextDouble() < p) 1.0 else 0.0
      (x1, x2, y)
    }.toDF("x1", "x2", "y")
  }

  /** Three-class data with class-dependent means. */
  def multiclassDF(spark: SparkSession, n: Int = 600, seed: Long = 13L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val c = i % 3
      val x1 = rnd.nextGaussian() + (if (c == 0) -2.0 else if (c == 1) 0.0 else 2.0)
      val x2 = rnd.nextGaussian() + (if (c == 1) 1.5 else 0.0)
      (x1, x2, s"c$c")
    }.toDF("x1", "x2", "cls")
  }
}
