package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-explicit loaders for the driver-generated test tables.
  *
  * Every `SparkEntry.queries` entry receives a scale-factor directory and
  * goes through these loaders, so column pruning / filter pushdown reach
  * the parquet scan (Catalyst prunes to the referenced columns — verified
  * via `.explain("formatted")` ReadSchema).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** events.ts is INT64 TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (exact long arithmetic downstream —
    * double division of 1e18-scale nanos would lose whole seconds). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}
