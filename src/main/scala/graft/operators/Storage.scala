package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
