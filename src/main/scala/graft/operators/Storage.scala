package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for 100TB tables: bucketing for
  * shuffle-free co-located joins/aggregations, date-partitioning for
  * partition pruning. On a petabyte fact table these two layouts are
  * the difference between a per-query shuffle of the whole table and
  * none at all.
  */
object Storage {

  /** Write `df` bucketed (and sorted) by `keyCol` into `nBuckets` as a
    * managed table. Two tables bucketed identically join/aggregate on
    * the key with ZERO exchange — Catalyst sees the matching output
    * partitioning (verified in StorageSpec by plan assertion).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)

  /** Write partitioned by (low-cardinality) `partCols`; readers with
    * equality/range predicates on them scan only matching directories
    * (PartitionFilters in the scan node).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partCols: _*).parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Morton (Z-order) code: interleave the low `bits` bits of each
    * column, column c's bit j landing at position j·n+c. Inputs must
    * already be quantized to non-negative ints < 2^bits (e.g.
    * `pmod(hash(col), 2^bits)` or a rank bucket); the result fits a
    * long for bits·n ≤ 63. Pure bit arithmetic over built-ins —
    * whole-stage codegen, no UDF.
    */
  def mortonCode(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "interleave needs >= 2 columns")
    require(bits * cols.size <= 63, "morton code must fit a long")
    val n = cols.size
    (for (j <- 0 until bits; (cl, ci) <- cols.zipWithIndex) yield
      shiftleft(shiftright(cl.cast("long"), j).bitwiseAND(lit(1L)),
        j * n + ci))
      .reduce(_ + _)
  }

  /** Z-order cluster `df` by `cols` for multi-dimensional file
    * skipping: rows close in EVERY dimension land in the same file,
    * so min/max footer stats prune scans with predicates on ANY
    * subset of the dimensions — the public Delta/Iceberg OPTIMIZE
    * ZORDER technique, expressed as repartitionByRange + in-partition
    * sort on the interleaved code. One range exchange (sampled
    * bounds), then a local sort: the same cost shape as a global
    * orderBy, amortized over every future scan of the table.
    *
    * `quantize` maps each raw column into [0, 2^bits) — default is a
    * non-negative hash bucket, which spreads skewed domains evenly;
    * pass rank-based quantization when locality of the NATURAL order
    * matters (range predicates).
    */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
               numPartitions: Int = 0,
               quantize: Column => Column = null): DataFrame = {
    val q = Option(quantize).getOrElse((c: Column) =>
      pmod(xxhash64(c), lit(1L << bits)).cast("long"))
    val z = mortonCode(cols.map(c => q(col(c))), bits)
    val withZ = df.withColumn("__z", z)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions,
        col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
