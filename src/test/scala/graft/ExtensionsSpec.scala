package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Specs for the SparkSessionExtensions surface: the chunk_text SQL
  * Generator and the HOF-dot-product optimizer rewrite.
  *
  * Needs its own SparkSession: extensions bind at session build, and
  * getOrCreate would silently return another suite's session — so the
  * default/active session is cleared first (the underlying
  * SparkContext is still shared; only the session state is new). */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    // leave a clean slate so later suites build their own session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("chunk_text UDTF explodes text into ordered chunks that round-trip") {
    val s = spark; import s.implicits._
    Seq(("line one\nline two\nline three", 0)).toDF("t", "id")
      .createOrReplaceTempView("chunk_in")
    val rows = spark.sql(
      """SELECT chunk_idx, chunk FROM chunk_in
        |LATERAL VIEW chunk_text(t, 12) AS chunk_idx, chunk""".stripMargin)
      .collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1).length <= 12))
    assert(rows.map(_.getString(1)).mkString("") == "line one\nline two\nline three")
  }

  test("chunk_text defaults to the 1000-char reference budget") {
    val s = spark; import s.implicits._
    Seq(("x" * 2500, 0)).toDF("t", "id").createOrReplaceTempView("chunk_in2")
    val rows = spark.sql(
      "SELECT chunk FROM chunk_in2 LATERAL VIEW chunk_text(t) AS chunk_idx, chunk")
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(0).length <= 1000))
  }

  test("optimizer rewrites the HOF dot product to LongArrayDot") {
    // parquet-backed input: a local relation would be constant-folded
    // away before the plan can be inspected
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr(
        "vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0) as bigint)) AS a")
      .createOrReplaceTempView("vecs")
    val df = spark.sql(
      """SELECT vec_id, aggregate(zip_with(a, a, (x, y) -> x * y),
        |  0L, (acc, v) -> acc + v) AS nrm FROM vecs""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("longarraydot"), s"rule did not fire; plan: $plan")
    // self dot product = squared norm > 0 for every non-zero vector
    assert(df.collect().forall(_.getLong(1) > 0))
  }

  test("rule leaves non-matching (double) aggregates untouched") {
    val s = spark; import s.implicits._
    Seq((Array(1.0, 2.0), Array(4.0, 5.0))).toDF("a", "b")
      .createOrReplaceTempView("dvecs")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  cast(0.0 as double), (acc, v) -> acc + v) AS dot FROM dvecs""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("longarraydot"))
    assert(df.collect()(0).getDouble(0) == 14.0)
  }
}
