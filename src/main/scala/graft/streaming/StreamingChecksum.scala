package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming table checksum — q265's continuous face (25th streaming
  * face): the order-free content digest (sum of per-row 60-bit md5
  * hashes mod 2^62) maintained live as rows arrive, so replica
  * reconciliation at 100 TB never re-scans history.
  *
  * Contract: NONE on arrival order — modular addition commutes, so
  * arbitrary interleaving converges to the batch digest (the
  * DDSketch/AbSpend class of face; the spec feeds fully shuffled
  * chunks). Per-key state is O(1) (row count + running modular sum).
  *
  * Scale shape: state is keyed by (table, shard) with `shards` hash
  * shards per table, so the stateful stage is key-parallel instead of
  * funneling every row of a table through one state group; the final
  * digest is a shards-sized rollup, congruent to the single mod by
  * associativity.
  */
object StreamingChecksum extends Serializable {

  val Mod: Long = 4611686018427387904L // 2^62

  case class RowHash(table: String, shard: Long, h: Long)
  case class ShardSum(table: String, shard: Long, n_rows: Long, hsum: Long)

  /** First 15 md5 hex digits of the canonical row text as a 60-bit
    * BIGINT — the same expression the q265 batch face and the DuckDB
    * oracle compute.
    */
  def rowHash(canon: Column): Column =
    conv(substring(md5(canon), 1, 15), 16, 10).cast("long")

  /** Canonical row text for the orders table (money via
    * DECIMAL(18,2)→string, date via explicit yyyy-MM-dd).
    */
  def ordersCanon: Column =
    concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").cast("string"),
      date_format(col("o_orderdate"), "yyyy-MM-dd"), col("o_orderpriority"))

  /** Canonical row text for the customer table. */
  def customerCanon: Column =
    concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal").cast("decimal(18,2)").cast("string"), col("c_mktsegment"))

  /** Rows of a table as (table, shard, rowhash) triples. */
  def rowHashes(df: DataFrame, table: String, canon: Column,
      shards: Int = 64): Dataset[RowHash] = {
    import df.sparkSession.implicits._
    df.select(lit(table).as("table"),
        pmod(rowHash(canon), lit(shards.toLong)).as("shard"),
        rowHash(canon).as("h"))
      .as[RowHash]
  }

  /** Latest per-shard digest snapshot. Batch and streaming run the same
    * group function; batch = one group call holding all rows.
    */
  def shardSums(rows: Dataset[RowHash], streaming: Boolean): Dataset[ShardSum] = {
    import rows.sparkSession.implicits._

    def fn(key: (String, Long), it: Iterator[RowHash],
        state: GroupState[(Long, Long)]): ShardSum = {
      var (n, sm) = state.getOption.getOrElse((0L, 0L))
      it.foreach { r => n += 1; sm = (sm + r.h) % Mod }
      if (streaming) state.update((n, sm))
      ShardSum(key._1, key._2, n, sm)
    }

    rows.groupByKey(r => (r.table, r.shard))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fn)
  }

  /** Shards → per-table digest; congruent to the batch single-sum mod
    * by associativity of modular addition (shard sums < 2^62 each, so
    * the rollup sums in DECIMAL(38,0) exactly like the batch face).
    */
  def rollup(sums: DataFrame): DataFrame =
    sums.groupBy(col("table").as("table_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        (sum(col("hsum").cast("decimal(38,0)")) % lit(Mod))
          .cast("long").as("checksum"))
}
