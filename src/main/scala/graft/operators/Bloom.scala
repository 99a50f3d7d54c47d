package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter pattern that
  * makes big-side joins cheap at scale: hash the (small) build side's
  * join keys into an m-bit filter, broadcast the filter, and drop
  * big-side rows that cannot match BEFORE any shuffle or join. The
  * big side is reduced by a per-row arithmetic test (no exchange of
  * the probe side at all); only survivors reach the real join. At
  * 100 TB this is the difference between shuffling the full fact
  * table and shuffling the ~selectivity fraction that can match.
  *
  * The filter is deliberately engine-portable: the k probe positions
  * come from md5 over a seeded key string (like the LSH hyperplanes,
  * `Similarity.lshTopK`), so any engine — and the DuckDB oracle —
  * rebuilds the exact same bit pattern and the exact same pass set.
  * xxhash64 would be faster but exists only in Spark; determinism
  * across engines is the contract here (see SURVEY §7 determinism
  * rules). A set bit is a set bit: `pass(key) = ∀i. bit(pos_i(key))`,
  * which both sides compute identically, so false-positive COUNTS
  * match exactly, and false negatives are structurally impossible.
  *
  * Representation: the filter is m/32-word bit array held as one
  * map<widx,word> row (only non-zero words are materialized — the
  * map is to the dense bitset what a sparse vector is to a dense
  * one). Build = one explode + one tiny groupBy over positions (k
  * rows per build key); probe = broadcast of the single-row map +
  * per-row bit arithmetic. 32-bit words keep `1 << bit` inside a
  * non-negative BIGINT in every engine (1L << 63 would overflow
  * DuckDB's signed shift).
  */
object Bloom {

  /** The i-th probe position of a key in an m-bit filter:
    * first 8 md5 hex chars of "bloom:i:key" as an integer, mod m.
    * 8 hex chars < 2^32, so the BIGINT is always non-negative. */
  def position(key: Column, i: Int, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"bloom:$i:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(m.toLong))

  /** Build the filter over the build side's keys: one row,
    * `bloom: map<bigint,bigint>` of 32-bit words keyed by word index.
    * k·|build| position rows feed one small groupBy — the build side
    * is the SMALL side of the reduction by assumption. */
  def build(small: DataFrame, keyCol: String, k: Int, m: Int): DataFrame = {
    val positions = array((0 until k).map(i => position(col(keyCol), i, m)): _*)
    small
      .select(explode(positions).as("p"))
      .select(shiftright(col("p"), 5).as("widx"), pmod(col("p"), lit(32L)).as("bit"))
      .groupBy("widx")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").as("word"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("widx"), col("word")))).as("bloom"))
  }

  /** Append `bloom_pass` to `big`: true iff every one of the k probe
    * bits is set. The single-row filter map is broadcast; the probe
    * itself is pure per-row arithmetic — zero shuffle of the big
    * side, which is the entire point of the pattern. */
  def probe(big: DataFrame, keyCol: String, filter: DataFrame, k: Int, m: Int): DataFrame = {
    // same contract AsOfJoin enforces on payload names: a big-side
    // column named like the probe internals would resolve ambiguously
    // and then be silently dropped with them
    val reserved = Seq("bloom", "bloom_pass") ++
      (0 until k).flatMap(i => Seq(s"_p$i", s"_hit$i"))
    val clash = reserved.filter(big.columns.contains)
    require(clash.isEmpty,
      s"probe's internal columns $clash collide with big-side columns; rename them")
    val withBits = (0 until k).foldLeft(big.crossJoin(broadcast(filter))) { (df, i) =>
      df.withColumn(s"_p$i", position(col(keyCol), i, m))
        .withColumn(s"_hit$i",
          expr(s"(shiftright(coalesce(element_at(bloom, shiftright(_p$i, 5)), CAST(0 AS BIGINT))," +
            s" CAST(_p$i % 32 AS INT)) & 1) = 1"))
    }
    val pass = (0 until k).map(i => col(s"_hit$i")).reduce(_ && _)
    withBits
      .withColumn("bloom_pass", pass)
      .drop("bloom")
      .drop((0 until k).flatMap(i => Seq(s"_p$i", s"_hit$i")): _*)
  }

  /** The composed reduction: rows of `big` that MIGHT match a build
    * key — a superset of the true semi-join (no false negatives),
    * smaller than `big` by roughly the filter's pass rate. Feed the
    * survivors to the real join. */
  def semiJoinReduce(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      k: Int = 3, m: Int = 1 << 13): DataFrame =
    probe(big, bigKey, build(small, smallKey, k, m), k, m)
      .filter(col("bloom_pass")).drop("bloom_pass")
}
