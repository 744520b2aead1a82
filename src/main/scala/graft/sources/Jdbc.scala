package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Config-injected JDBC roster source (ref: votervoice/match.py:95-105
  * builds a Postgres connection from environment config and pulls the
  * candidate roster; the SQL under queries/ runs over it).
  *
  * Connection settings come from Spark conf / environment — NEVER
  * hardcoded. Reads resolve keys in order: explicit Config field →
  * `graft.jdbc.*` session conf → `GRAFT_JDBC_*` env var.
  *
  * Scale posture: `spark.read.jdbc` pushes filters and column pruning
  * into the database (Catalyst JDBC pushdown), and partitioned reads
  * (partitionColumn/lowerBound/upperBound/numPartitions) parallelise the
  * pull across executors — without them a JDBC read is a single
  * connection on one task, which at roster scale (millions of rows) is
  * the bottleneck. `fetchsize` keeps the driver from buffering the
  * whole result.
  */
object Jdbc {

  final case class Config(
      url: String,
      table: String, // table name or "(subquery) AS t"
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      fetchSize: Int = 10000,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Option[Int] = None)

  /** Resolve a Config from session conf / env for a table:
    * graft.jdbc.url / GRAFT_JDBC_URL etc. Fails fast with the missing
    * key name — credentials never default. */
  def configFor(spark: SparkSession, table: String): Config = {
    def opt(confKey: String, envKey: String): Option[String] =
      spark.conf.getOption(confKey).orElse(sys.env.get(envKey))
    val url = opt("graft.jdbc.url", "GRAFT_JDBC_URL").getOrElse(
      throw new IllegalArgumentException(
        "JDBC url not configured: set graft.jdbc.url or GRAFT_JDBC_URL"))
    Config(
      url = url, table = table,
      user = opt("graft.jdbc.user", "GRAFT_JDBC_USER"),
      password = opt("graft.jdbc.password", "GRAFT_JDBC_PASSWORD"),
      driver = opt("graft.jdbc.driver", "GRAFT_JDBC_DRIVER"))
  }

  /** Configured reader — split from [[read]] so plumbing is testable
    * without a live database (load() is the only call that connects). */
  def reader(spark: SparkSession, cfg: Config): DataFrameReader = {
    val base = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("fetchsize", cfg.fetchSize)
    val withAuth = Seq(
      "user" -> cfg.user, "password" -> cfg.password, "driver" -> cfg.driver
    ).foldLeft(base) {
      case (r, (k, Some(v))) => r.option(k, v)
      case (r, _) => r
    }
    (cfg.partitionColumn, cfg.lowerBound, cfg.upperBound, cfg.numPartitions) match {
      case (Some(c), Some(lo), Some(hi), Some(n)) =>
        withAuth.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n)
      case _ => withAuth
    }
  }

  /** Read the table. Returned frame participates in normal Catalyst
    * JDBC pushdown (filters/pruning travel into the database), so
    * downstream RosterQuery params filter at the source. */
  def read(spark: SparkSession, cfg: Config): DataFrame =
    reader(spark, cfg).load()
}
