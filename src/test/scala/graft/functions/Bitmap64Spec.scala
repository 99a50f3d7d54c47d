package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the compressed 64-bit bitmap under the sketch
  * algebra: exactness vs a reference Set over hostile key mixes,
  * the array→bitmap promotion boundary, canonical serialization
  * (bytes are a pure function of the SET), and the non-materializing
  * intersection count. */
class Bitmap64Spec extends AnyFunSuite {

  private def bm(keys: Iterable[Long]): Bitmap64 = {
    val b = new Bitmap64()
    keys.foreach(b.add)
    b
  }

  test("exact vs reference Set over a hostile key mix (sparse, dense, negative, extreme)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(20000)(rnd.nextLong()) ++ // sparse 64-bit
      (0L until 5000L) ++ // dense low ints
      Seq.fill(5000)((rnd.nextLong() % 1000L) - 500L) ++ // dup-heavy, negatives
      Seq(Long.MinValue, Long.MaxValue, -1L, 0L, 1L,
        1L << 33, (1L << 33) + 1, Int.MaxValue.toLong, Int.MaxValue + 1L)
    val ref = keys.toSet
    val b = bm(keys)
    assert(b.cardinality === ref.size.toLong)
    // round-trip preserves cardinality and intersection-with-self
    val rt = Bitmap64.deserialize(b.serialize())
    assert(rt.cardinality === ref.size.toLong)
    assert(Bitmap64.andCardinality(b, rt) === ref.size.toLong)
  }

  test("array container promotes at 4096 within one bucket, exactly") {
    // 5000 distinct lows in one 2^16 bucket: crosses the 4096 boundary
    val base = 1L << 40
    val lows = (0 until 5000).map(i => i * 13 % 65536).distinct
    val b = bm(lows.map(base + _))
    assert(b.cardinality === lows.size.toLong)
    assert(Bitmap64.deserialize(b.serialize()).cardinality === lows.size.toLong)
    // and a fully dense bucket
    val dense = bm((0L until 65536L).map(base + _))
    assert(dense.cardinality === 65536L)
    assert(Bitmap64.deserialize(dense.serialize()).cardinality === 65536L)
  }

  test("serialization is canonical: same set, any insert/merge order, same bytes") {
    val rnd = new scala.util.Random(7)
    val keys = (Seq.fill(6000)(rnd.nextLong() % 100000L) ++
      Seq.fill(2000)(rnd.nextLong())).distinct
    val a = bm(keys)
    val b = bm(rnd.shuffle(keys))
    // a third copy built by merging two halves in the opposite order
    val (h1, h2) = keys.splitAt(keys.size / 3)
    val c = bm(h2); c.or(bm(h1))
    val ba = a.serialize(); val bb = b.serialize(); val bc = c.serialize()
    assert(java.util.Arrays.equals(ba, bb), "insert order changed the bytes")
    assert(java.util.Arrays.equals(ba, bc), "merge order changed the bytes")
  }

  test("or is a true union and does not mutate its argument") {
    val rnd = new scala.util.Random(11)
    val k1 = Seq.fill(3000)(rnd.nextLong() % 50000L).toSet
    val k2 = Seq.fill(3000)(rnd.nextLong() % 50000L).toSet
    val a = bm(k1)
    val other = bm(k2)
    val otherBytes = other.serialize()
    a.or(other)
    assert(a.cardinality === (k1 ++ k2).size.toLong)
    assert(java.util.Arrays.equals(other.serialize(), otherBytes),
      "or() mutated its argument")
    // merging the same partial twice is idempotent (OR semantics)
    a.or(other)
    assert(a.cardinality === (k1 ++ k2).size.toLong)
  }

  test("andCardinality is exact across container kinds") {
    val base = 1L << 35
    // dense bucket (bitmap container) vs sparse picks (array container)
    val dense = bm((0L until 10000L).map(base + _))
    val sparse = bm(Seq(base + 5L, base + 9999L, base + 50000L, -42L))
    assert(Bitmap64.andCardinality(dense, sparse) === 2L)
    assert(Bitmap64.andCardinality(sparse, dense) === 2L)
    // array vs array
    val a = bm(Seq(1L, 2L, 3L, 1L << 40))
    val b = bm(Seq(2L, 3L, 4L, 1L << 41))
    assert(Bitmap64.andCardinality(a, b) === 2L)
    // bitmap vs bitmap
    val d2 = bm((5000L until 15000L).map(base + _))
    assert(Bitmap64.andCardinality(dense, d2) === 5000L)
    // disjoint buckets
    assert(Bitmap64.andCardinality(bm(Seq(0L)), bm(Seq(1L << 20))) === 0L)
  }

  test("andNotCardinality is exact, asymmetric, and agrees with reference Sets") {
    val rnd = new scala.util.Random(7)
    val xs = Set.fill(4000)(rnd.nextLong() % 100000L) // cross-container dups
    val ys = Set.fill(4000)(rnd.nextLong() % 100000L)
    val a = bm(xs.toSeq)
    val b = bm(ys.toSeq)
    assert(Bitmap64.andNotCardinality(a, b) === (xs -- ys).size.toLong)
    assert(Bitmap64.andNotCardinality(b, a) === (ys -- xs).size.toLong)
    // identical sets -> 0; disjoint -> |A|; empty sides
    assert(Bitmap64.andNotCardinality(a, a) === 0L)
    val far = bm(Seq(1L << 50, -7L))
    assert(Bitmap64.andNotCardinality(a, far) === xs.size.toLong)
    assert(Bitmap64.andNotCardinality(new Bitmap64(), a) === 0L)
    assert(Bitmap64.andNotCardinality(a, new Bitmap64()) === xs.size.toLong)
  }

  test("bitmap_andnot_count: Column + SQL forms agree with EXCEPT semantics") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val B = BitmapDistinct
    GraftFunctions.register(spark)
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L))
      .toDF("g", "k")
    val sk = df.groupBy($"g").agg(B.bitmap_sketch($"k").as("sk"))
    val row = sk.filter($"g" === "a").crossJoin(
        sk.filter($"g" === "b").select($"sk".as("sk_b")))
      .select(B.bitmap_andnot_count($"sk", $"sk_b").as("a_minus_b"),
        B.bitmap_andnot_count($"sk_b", $"sk").as("b_minus_a"))
      .head()
    assert(row.getLong(0) === 1L) // {1}
    assert(row.getLong(1) === 2L) // {4, 5}
    df.createOrReplaceTempView("bm_andnot_in")
    val viaSql = spark.sql(
      """SELECT bitmap_andnot_count(
        |  (SELECT bitmap_sketch(k) FROM bm_andnot_in WHERE g = 'b'),
        |  (SELECT bitmap_sketch(k) FROM bm_andnot_in WHERE g = 'a')) AS d""".stripMargin)
      .head().getLong(0)
    assert(viaSql === 2L)
  }

  test("empty and single-key round trips") {
    val e = new Bitmap64()
    assert(e.cardinality === 0L && e.isEmpty)
    assert(Bitmap64.deserialize(e.serialize()).cardinality === 0L)
    val one = bm(Seq(Long.MinValue))
    assert(one.cardinality === 1L)
    assert(Bitmap64.deserialize(one.serialize()).cardinality === 1L)
  }

  test("deserialize rejects foreign bytes loudly") {
    val e = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(Array[Byte](1, 2, 3, 4, 5, 6, 7))
    }
    assert(e.getMessage.contains("magic"))
  }

  test("hostile container payloads fail loudly: lying cardinality, unsorted array, truncation, trailing (r12)") {
    // KindBitmap with card != popcount: `cardinality` reads the stored
    // count directly (silent miscount) and re-serialize sizes encodings
    // from it (BufferOverflow mid-write) — must die at deserialize
    def denseBytes(card: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(6 + 8 + 1 + 4 + 8 * 1024)
      buf.put(0x47.toByte).put(1.toByte).putInt(1) // magic, v1, 1 container
      buf.putLong(0L).put(1.toByte).putInt(card)   // bucket 0, KindBitmap
      var i = 0
      while (i < 1024) { buf.putLong(-1L); i += 1 } // all 65536 bits set
      buf.array()
    }
    assert(Bitmap64.deserialize(denseBytes(65536)).cardinality === 65536L)
    val lie = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(denseBytes(3))
    }
    assert(lie.getMessage.contains("does not match"))
    // unsorted array container: andCard's two-pointer walk and the
    // binarySearch paths silently misbehave on it
    val unsorted = {
      val buf = java.nio.ByteBuffer.allocate(6 + 8 + 1 + 4 + 4)
      buf.put(0x47.toByte).put(1.toByte).putInt(1)
      buf.putLong(0L).put(0.toByte).putInt(2)
      buf.putChar(9.toChar).putChar(3.toChar)
      buf.array()
    }
    val order = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(unsorted)
    }
    assert(order.getMessage.contains("canonical"))
    // truncation mid-container and trailing junk: the house loud
    // format errors, never a raw BufferUnderflowException
    val good = bm(Seq(5L, 900000L)).serialize()
    val trunc = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(java.util.Arrays.copyOf(good, good.length - 1))
    }
    assert(trunc.getMessage.contains("truncated"))
    val trail = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(java.util.Arrays.copyOf(good, good.length + 2))
    }
    assert(trail.getMessage.contains("trailing"))
  }

  // ---- RUN containers (r11: serialized-only third kind) ----------------

  test("consecutive ranges serialize as runs: a full bucket costs bytes, not a page") {
    // 65536 consecutive keys = one run: 6 header + 8 hi + 1 kind + 4 + 4
    val full = bm(0L until 65536L)
    val bytes = full.serialize()
    assert(bytes.length === 6 + 8 + 1 + 4 + 4, s"full bucket took ${bytes.length} B")
    val rt = Bitmap64.deserialize(bytes)
    assert(rt.cardinality === 65536L)
    assert(java.util.Arrays.equals(rt.serialize(), bytes), "round-trip not byte-stable")
    // dense-but-gappy (every value except each 100th): 656 runs ≈ 2.6 KiB,
    // where the r10 format paid the 8 KiB bitmap page
    val gappy = bm((0L until 65536L).filter(_ % 100 != 0))
    val gb = gappy.serialize()
    assert(gb.length < 8 * 1024 / 2, s"gappy range took ${gb.length} B")
    val grt = Bitmap64.deserialize(gb)
    assert(grt.cardinality === gappy.cardinality)
    // intersection semantics survive the run round-trip (expansion is
    // exact, andCard walks the expanded kinds)
    assert(Bitmap64.andCardinality(grt, bm(0L until 1000L)) ===
      (0L until 1000L).count(_ % 100 != 0))
  }

  test("canonical rule is a pure function of the set across all three kinds") {
    // same set through scattered inserts vs merged halves: identical
    // bytes even when the winning encoding is RUN
    val keys = (0L until 20000L) ++ (1000000L to 1000005L) ++ Seq(-5L, -4L, -3L)
    val direct = bm(keys)
    val a = bm(keys.zipWithIndex.collect { case (k, i) if i % 2 == 0 => k })
    val b = bm(keys.zipWithIndex.collect { case (k, i) if i % 2 == 1 => k })
    a.or(b)
    assert(java.util.Arrays.equals(a.serialize(), direct.serialize()))
    // sparse scattered keys still pick the array kind (runs would be
    // 4 B/run vs 2 B/value): 100 isolated keys in one bucket ->
    // 1 kind + 4 + 200 payload
    val sparse = bm((0 until 100).map(i => i.toLong * 500L))
    assert(sparse.serialize().length === 6 + 8 + 1 + 4 + 200)
  }

  test("hostile run bytes are rejected: overlapping, adjacent, or out-of-range runs") {
    def runSketch(runs: (Int, Int)*): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(1 + 1 + 4 + 8 + 1 + 4 + 4 * runs.size)
      buf.put(0x47.toByte).put(1.toByte).putInt(1)
      buf.putLong(0L)
      buf.put(2.toByte) // kind = run
      buf.putInt(runs.size)
      runs.foreach { case (st, lenM1) => buf.putChar(st.toChar).putChar(lenM1.toChar) }
      buf.array()
    }
    // a sane run list round-trips
    assert(Bitmap64.deserialize(runSketch((10, 4), (100, 0))).cardinality === 6L)
    // overlapping runs
    val e1 = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(runSketch((10, 10), (15, 2)))
    }
    assert(e1.getMessage.contains("not canonical"))
    // adjacent runs (must be one run in canonical form)
    val e2 = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(runSketch((10, 4), (15, 2)))
    }
    assert(e2.getMessage.contains("not canonical"))
    // run past the container end: start 65535 with length 2
    val e3 = intercept[IllegalArgumentException] {
      Bitmap64.deserialize(runSketch((65535, 1)))
    }
    assert(e3.getMessage.contains("past container end"))
  }

  test("a deserialized zero-size array container accepts adds (growth never multiplies 0)") {
    // hand-crafted bytes: one bucket holding an EMPTY array container —
    // unreachable via serialize() (containers always hold ≥ 1 value) but
    // legal per readContainer's n >= 0 check; add() must grow the backing
    // array from 0, not copy to size 0*2 and throw out-of-bounds
    val buf = java.nio.ByteBuffer.allocate(1 + 1 + 4 + 8 + 1 + 4)
    buf.put(0x47.toByte).put(1.toByte).putInt(1)
    buf.putLong(0L)      // bucket hi = 0
    buf.put(0.toByte)    // kind = array
    buf.putInt(0)        // n = 0
    val b = Bitmap64.deserialize(buf.array())
    assert(b.cardinality === 0L)
    (0L until 10L).foreach(b.add)
    assert(b.cardinality === 10L)
    assert(Bitmap64.deserialize(b.serialize()).cardinality === 10L)
  }
}
