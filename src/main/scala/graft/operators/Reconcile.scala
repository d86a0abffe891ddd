package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Merkle-style snapshot reconciliation: find every row that differs
  * between two snapshots of the same keyed table WITHOUT shuffling either
  * full table on the primary key.
  *
  * The 100-TB problem: "did yesterday's copy drift from today's?" as a
  * naive full-outer join shuffles 2×100 TB on the pk. The Merkle answer
  * (the anti-entropy digest-tree of Dynamo/Cassandra — DeCandia et al.
  * 2007, public paper): hash-partition rows into `buckets` by pk, reduce
  * each bucket to an order-independent digest (XOR of per-row hashes —
  * commutative, associative, overflow-free; plus the row count), compare
  * the two digest tables (tiny — `buckets` rows), and run the row-level
  * outer join ONLY inside buckets whose digests differ. For mostly-equal
  * snapshots (the common reconciliation case) the expensive join touches
  * a vanishing fraction of rows; digest aggregation itself is one
  * map-side-combined pass over each table with no wide rows.
  *
  * Digest equality is probabilistic (XOR of 60-bit md5 hashes): a
  * differing bucket reporting an identical digest needs either a 60-bit
  * hash collision or an xor-cancelling row SET — negligible and, because
  * the hash is keyed on content, deterministic (re-runs agree). Rows with
  * NULLs participate via an explicit sentinel so NULL ≠ "" ≠ absent.
  *
  * Returns one row per differing pk: (pk, status) with status ∈
  * {'deleted' (in a, not b), 'added' (in b, not a), 'changed'}.
  */
object Reconcile {

  private def sig(cols: Seq[String]) =
    md5Long(concat_ws("",
      cols.map(c => coalesce(col(c).cast("string"), lit("NULL"))): _*))

  def merkleDiff(a: DataFrame, b: DataFrame, pkCol: String,
                 sigCols: Seq[String], buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val allCols = pkCol +: sigCols
    def keyed(df: DataFrame): DataFrame = df.select(
      col(pkCol).as("pk"),
      pmod(xxhash64(col(pkCol)), lit(buckets.toLong)).as("bucket"),
      sig(allCols).as("rsig"))
    val ka = keyed(a).localCheckpoint() // consumed twice: digests + drill-down
    val kb = keyed(b).localCheckpoint()
    def digests(k: DataFrame): DataFrame = k.groupBy("bucket")
      .agg(expr("bit_xor(rsig)").as("dig"), count(lit(1)).as("cnt"))
    val diffBuckets = digests(ka).toDF("bucket", "dig_a", "cnt_a")
      .join(digests(kb).toDF("bucket", "dig_b", "cnt_b"), Seq("bucket"), "full_outer")
      .filter(col("dig_a").isNull || col("dig_b").isNull ||
        col("dig_a") =!= col("dig_b") || col("cnt_a") =!= col("cnt_b"))
      .select("bucket")
    // drill down only into differing buckets (semi-join is a broadcast —
    // the bucket list is at most `buckets` rows), then the row-level
    // compare on that small slice
    val da = ka.join(broadcast(diffBuckets), Seq("bucket"), "left_semi")
    val db = kb.join(broadcast(diffBuckets), Seq("bucket"), "left_semi")
    da.select(col("pk"), col("rsig").as("sig_a"))
      .join(db.select(col("pk"), col("rsig").as("sig_b")), Seq("pk"), "full_outer")
      .withColumn("status",
        when(col("sig_b").isNull, lit("deleted"))
          .when(col("sig_a").isNull, lit("added"))
          .when(col("sig_a") =!= col("sig_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("pk"), col("status"))
  }
}
