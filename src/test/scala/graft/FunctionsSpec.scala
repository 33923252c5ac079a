package graft

import graft.functions.GraftFunctions
import graft.operators.Llm
import org.apache.spark.sql.functions._

/** Native expression registration + equivalence. */
class FunctionsSpec extends SparkSuite {

  test("graft_hist: boundary binning, null skip, and partition-merge invariance") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // lo=0 hi=10 bins=5: v=0→bin1, v=9.999→bin5, v=10→overflow, v=-0.1→underflow
    val vals: Seq[java.lang.Double] =
      Seq(0.0, 9.999, 10.0, -0.1, 2.0, 2.0, null)
    val df = vals.toDF("v").selectExpr("cast(v as double) as v")
    def hist(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.selectExpr("graft_hist(v, 0.0d, 10.0d, 5) as h").as[Seq[Long]].head()
    val h1 = hist(df.coalesce(1))
    val h7 = hist(df.repartition(7)) // forces serialize + merge across partials
    assert(h1 == Seq(1L, 1L, 2L, 0L, 0L, 1L, 1L), s"got $h1")
    assert(h7 == h1, "merge across partitions must equal single-partition result")
  }

  test("graft_cosine resolves in SQL after registration and matches HOF bit-for-bit") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("emb_fn_test")
    // resolves through the SQL parser/analyzer path
    assert(spark.sql(
      "SELECT graft_cosine(a.embedding, b.embedding) s FROM emb_fn_test a " +
        "JOIN emb_fn_test b ON b.vec_id = 0 WHERE a.vec_id < 50").count() == 50)
    // compare native vs HOF vs UDF on the same pairs
    val e = Tables.embeddings(spark, sf0001)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    val both = e.filter(col("vec_id") < 50).crossJoin(broadcast(probe))
      .withColumn("s_native", expr("graft_cosine(embedding, pv)"))
      .withColumn("s_hof", Llm.cosine("embedding", "pv"))
      .withColumn("s_udf", Llm.cosineUdf(col("embedding"), col("pv")))
    assert(both.filter(col("s_native") =!= col("s_hof")).count() == 0)
    assert(both.filter(col("s_native") =!= col("s_udf")).count() == 0)
  }

  test("graft_cosine survives both codegen and interpreted paths") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf0001).limit(20)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    def run() = e.crossJoin(broadcast(probe))
      .select(expr("graft_cosine(embedding, pv)").as("s")).collect().map(_.getDouble(0)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(withCodegen == interpreted)
  }

  test("graft_cosine null/arity behavior") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1f, 0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(expr("graft_cosine(a, b)")).head().isNullAt(0))
    val err = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0f))").collect())
    assert(err.getMessage.toLowerCase.contains("argument"))
  }
}
