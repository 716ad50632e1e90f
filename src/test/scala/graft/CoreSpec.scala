package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core._

class CoreSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: Seq[(Int, String)]): SourceNode =
    (_: RunContext) => rows.toDF("id", "value")

  test("empty chain is identity (Graph() with no nodes is legal)") {
    val g = Graph(src(Seq(1 -> "a", 2 -> "b")))
    g.run(spark).collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
  }

  test("chain composes nodes in order") {
    val g = Graph(src(Seq(1 -> "a", 2 -> "b", 3 -> "c")))
      .add((df: DataFrame) => df.filter(col("id") > 1))
      .add((df: DataFrame) => df.withColumn("id2", col("id") * 2))
    val out = g.run(spark).orderBy("id").collect()
    out.map(_.getInt(0)) shouldBe Array(2, 3)
    out.map(_.getInt(2)) shouldBe Array(4, 6)
  }

  test("nodes can fan out 1->N (generator analog = flatMap/explode)") {
    val g = Graph(src(Seq(2 -> "x")))
      .add((df: DataFrame) =>
        df.withColumn("i", explode(sequence(lit(0), col("id")))))
    g.run(spark).count() shouldBe 3
  }

  test("Bufferize-style stateful sink node: collects what flowed through " +
    "it for post-run assertion (tests/test_integration.py:144-152,186-188)") {
    // The reference's Bufferize is a stateful callable appended to a chain
    // whose buffer the test inspects after the run. The Spark analog is a
    // node holding driver-side state, materialized at its own action
    // boundary — a test/debug sink shape, not a data-path operator.
    class Bufferize extends Node {
      val buffer = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      def apply(in: DataFrame, ctx: RunContext): DataFrame = {
        buffer ++= in.orderBy("id").collect()
          .map(r => (r.getInt(0), r.getString(1)))
        in // pass-through, like the reference's sinks (writers.py:70-73)
      }
    }
    val golden = (0 until 10).map(i => (i, s"value for $i"))
    val sink = new Bufferize
    val out = Graph(src(golden), sink).run(spark)
    sink.buffer.toSeq shouldBe golden
    out.count() shouldBe 10 // rows still flow downstream of the sink
  }

  test("service resolution failure is fatal and names the missing service") {
    val ex = intercept[UnrecoverableOperationalError] {
      ServiceRegistry(Map("a" -> 1)).apply[String]("missing")
    }
    ex.getMessage should include("missing")
    ex.getMessage should include("a")
  }

  test("JdbcEngine.postgres: overrides > env > defaults (util.py:26-31)") {
    val env = Map("POSTGRES_HOST" -> "envhost", "POSTGRES_PORT" -> "5555")
    val e = JdbcEngine.postgres(
      overrides = Map("host" -> "ovrhost"),
      getenv = env.get)
    e.url shouldBe "jdbc:postgresql://ovrhost:5555/postgres?client_encoding=utf8"
    e.user shouldBe "postgres"
    val d = JdbcEngine.postgres(getenv = _ => None)
    d.url shouldBe "jdbc:postgresql://localhost:5432/postgres?client_encoding=utf8"
  }

  test("Operation default allowed set is (INSERT, UPDATE) (writers.py:29-34)") {
    Operation.defaultAllowed shouldBe Set(Operation.Insert, Operation.Update)
  }
}
