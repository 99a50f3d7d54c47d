package graft.functions

import java.nio.ByteBuffer

/** Compressed exact bitmap over the FULL 64-bit key domain — the
  * roaring-bitmap container scheme (Chambi, Lemire, Kaser, Godin:
  * "Better bitmap performance with Roaring bitmaps", 2016), built
  * pure-JVM so the sketch algebra carries no dependency.
  *
  * Why it exists: the r9 sketch algebra buffered on `java.util.BitSet`,
  * which caps keys at a dense `[0, 2^31-8)` int domain — real corpora
  * key on 64-bit snowflake ids, hashes, or dictionary codes, and there
  * the whole INIT/MERGE/AND family failed fast with no alternate path.
  * This structure keeps the dense fast path (a fully-populated 2^16
  * range costs the same 8 KiB page a flat bitmap pays) while making
  * sparse and negative keys cheap: an isolated key costs one 2-byte
  * array slot, not a bit position.
  *
  * Layout: the key's high 48 bits (`key >>> 16` — unsigned, so
  * negative longs land in high buckets and every Long is legal) select
  * a container; the low 16 bits live inside it. Containers are
  *  - ARRAY: a sorted `Char` array, ≤ 4096 entries (≤ 8 KiB) — the
  *    sparse representation;
  *  - BITMAP: 1024 longs (8 KiB fixed) — the dense representation,
  *    promoted to when an array would exceed 4096 entries.
  * 4096 is the classic crossover: above it the 2-byte-per-entry array
  * would outgrow the fixed 8 KiB page.
  *
  * Algebra: `add`, in-place `or` (set union — associative, commutative,
  * idempotent, so partial-aggregate merges are order-independent),
  * `cardinality`, and a non-materializing `andCardinality` (exact
  * |A ∩ B| straight off the serialized form's containers — the only
  * intersection the engine needs).
  *
  * Serialization is CANONICAL: containers are written in ascending
  * bucket order, each in the SMALLEST of its three encodings — RUN
  * (sorted (start, length-1) pairs: consecutive ranges like timestamps
  * or sequential ids cost 4 bytes per gap instead of the 8 KiB page),
  * array, or bitmap — under a fixed tie preference (run, array,
  * bitmap), regardless of in-memory promotion history. The bytes are
  * therefore a pure function of the SET — any merge order, any
  * partitioning, same sketch bytes. That is what lets a sketch column
  * itself be grouped, compared, or stored without leaking the
  * aggregation tree that built it. RUN is a wire format only: reads
  * expand it to the array/bitmap kind, so the add/or/andCardinality
  * hot paths stay two-kind.
  */
final class Bitmap64 private (
    private val containers: java.util.TreeMap[java.lang.Long, Bitmap64.Container]) {
  import Bitmap64._

  def this() = this(new java.util.TreeMap[java.lang.Long, Bitmap64.Container]())

  // hot-path locality cache: consecutive dense keys share a bucket for
  // 65536 adds at a time; skipping the TreeMap probe there keeps the
  // dense path close to the flat-BitSet cost it replaced
  private var lastHi: Long = -1L
  private var lastC: Container = null

  /** Set `key`'s bit. Any Long is legal, including negatives. */
  def add(key: Long): Unit = {
    val hi = key >>> 16
    val lo = (key & 0xFFFFL).toInt
    if (hi == lastHi && (lastC ne null)) {
      val c2 = lastC.add(lo)
      if (c2 ne lastC) { containers.put(hi, c2); lastC = c2 }
    } else {
      var c = containers.get(hi)
      if (c eq null) { c = new ArrayContainer(); containers.put(hi, c) }
      val c2 = c.add(lo)
      if (c2 ne c) containers.put(hi, c2)
      lastHi = hi
      lastC = c2
    }
  }

  /** In-place set union. `other` is NOT mutated (its dense pages are
    * cloned before absorption), so a deserialized partial can be
    * merged into many buffers safely. */
  def or(other: Bitmap64): Unit = {
    val it = other.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = containers.get(e.getKey)
      val merged =
        if (mine eq null) e.getValue.copy()
        else mine.or(e.getValue)
      containers.put(e.getKey, merged)
    }
    lastHi = -1L
    lastC = null
  }

  def cardinality: Long = {
    var n = 0L
    val it = containers.values().iterator()
    while (it.hasNext) n += it.next().cardinality
    n
  }

  def isEmpty: Boolean = containers.isEmpty

  /** Largest set key in UNSIGNED key order (the bucket order the
    * serialization already walks), or null when the set is empty — the
    * coded-tier audit's "max set bit" probe. Dictionary codes are
    * dense non-negative longs, where unsigned max = max. Walks
    * descending buckets and skips legally-deserialized empty
    * containers. */
  def maxKeyOrNull: java.lang.Long = {
    val it = containers.descendingMap().entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.cardinality > 0)
        return java.lang.Long.valueOf(
          (e.getKey.longValue() << 16) | e.getValue.maxValue.toLong)
    }
    null
  }

  /** Canonical bytes: ascending bucket order, each container in the
    * smallest of its run / array / bitmap encodings under a fixed
    * preference order ([[Bitmap64.Container.encodedBytes]]) — a pure
    * function of the set. */
  def serialize(): Array[Byte] = writeBytes(tagged = false, null)

  /** CODED canonical bytes (V2): the same container payload, prefixed
    * with the DICTIONARY-IDENTITY tag — the vhist-unit / dds-alpha
    * discipline applied to the one seam that lacked it: a bitmap over
    * [[graft.operators.Dictionary]] codes carries WHICH dictionary
    * lineage produced its bits, so merges of sketches coded by
    * independent (or rebuilt) dictionaries fail loudly instead of
    * silently aliasing two key mappings. `id = null` is the
    * unset-partial sentinel (an empty merge buffer that has never seen
    * a coded row) and only ever serializes EMPTY. Bytes stay a pure
    * function of (set, id). */
  private[functions] def serializeTagged(id: java.lang.Long): Array[Byte] =
    writeBytes(tagged = true, id)

  private def writeBytes(tagged: Boolean, id: java.lang.Long): Array[Byte] = {
    require(tagged || (id eq null), "Bitmap64: internal - id on untagged bytes")
    require(!tagged || (id ne null) || containers.isEmpty,
      "bitmap_coded: internal - unset dict_id on a non-empty sketch")
    // (cardinality, runCount) are O(container) scans — compute each
    // ONCE in the sizing pass and reuse them in the write pass, rather
    // than re-deriving the same pair per container (serialize runs per
    // merge partial / per group / per micro-batch state round-trip)
    val m = containers.size()
    val ns = new Array[Int](m)
    val rs = new Array[Int](m)
    var size =
      if (tagged) 1 + 1 + 1 + (if (id ne null) 8 else 0) + 4 else HeaderBytes
    var i = 0
    val it0 = containers.values().iterator()
    while (it0.hasNext) {
      val c = it0.next()
      ns(i) = c.cardinality
      rs(i) = c.runCount
      size += 8 + Container.encodedBytes(ns(i), rs(i))
      i += 1
    }
    val buf = ByteBuffer.allocate(size)
    buf.put(Magic)
    if (tagged) {
      buf.put(VersionTagged)
      buf.put(if (id ne null) 1.toByte else 0.toByte)
      if (id ne null) buf.putLong(id.longValue())
    } else buf.put(Version)
    buf.putInt(m)
    i = 0
    val keys = containers.entrySet().iterator()
    while (keys.hasNext) {
      val e = keys.next()
      buf.putLong(e.getKey)
      Container.writeCanonical(e.getValue, buf, ns(i), rs(i))
      i += 1
    }
    buf.array()
  }
}

object Bitmap64 {
  private[functions] val ArrayMax = 4096
  private[functions] val BitmapWords = 1024
  private val Magic: Byte = 0x47 // 'G'
  private val Version: Byte = 1
  private val HeaderBytes = 1 + 1 + 4
  private val KindArray: Byte = 0
  private val KindBitmap: Byte = 1
  /** RUN container (r11): the full Roaring scheme's third kind — a
    * sorted (start, length-1) char-pair list, SERIALIZED-ONLY (in
    * memory runs expand to the array/bitmap kind add/or/andCard already
    * handle). Dense-but-not-full ranges (timestamps, sequential ids
    * with gaps) stop paying the 8 KiB page: a full bucket costs 8
    * bytes, k runs cost 4 + 4k. The canonical rule stays a pure
    * function of the set — a kind is chosen by STRICT serialized-size
    * comparison (run < array < bitmap on ties), so any merge order or
    * promotion history yields identical bytes. Pre-r11 bytes (kinds
    * 0/1 only) still deserialize unchanged. */
  private val KindRun: Byte = 2
  /** V2 CODED wire format (r12): `magic, 2, hasId(0|1)[, id:long],
    * count, containers…` — the dictionary-identity tag rides IN the
    * bytes ([[Bitmap64.serializeTagged]]). Plain V1 readers reject V2
    * loudly ("unsupported version") and the coded reader rejects V1
    * ("untagged bytes"), so a coded tier and a plain tier can never be
    * silently mixed. */
  private[functions] val VersionTagged: Byte = 2

  def deserialize(bytes: Array[Byte]): Bitmap64 = {
    val buf = ByteBuffer.wrap(bytes)
    // length floor reported as truncation, not a bogus magic mismatch
    require(buf.remaining() >= HeaderBytes, "Bitmap64: truncated sketch header")
    require(buf.get() == Magic, "Bitmap64: not a graft sketch (bad magic)")
    val v = buf.get()
    require(v == Version,
      if (v == VersionTagged)
        "Bitmap64: dictionary-CODED sketch bytes in a plain bitmap read - " +
          "use the bitmap_*_coded family so the dict_id tag is reconciled"
      else s"Bitmap64: unsupported sketch version $v")
    new Bitmap64(readContainers(buf, "Bitmap64"))
  }

  /** Read V2 CODED bytes → (dict id | null when unset-empty, bitmap).
    * Rejects plain V1 bytes loudly: an untagged sketch merged into a
    * coded tier is exactly the unidentified-key-mapping corruption the
    * tag exists to stop. */
  private[functions] def deserializeTagged(bytes: Array[Byte]): (java.lang.Long, Bitmap64) = {
    val buf = ByteBuffer.wrap(bytes)
    // length floor FIRST and named as truncation (an input shorter than
    // the 2-byte magic+version is truncated, not a magic mismatch); then
    // magic + version BEFORE any further floor: a plain V1 EMPTY sketch
    // is exactly 6 bytes, and it must hit the purpose-built
    // plain-bytes-in-a-coded-merge message, not a bogus "bad magic"
    require(buf.remaining() >= 2, "bitmap_coded: truncated sketch header")
    require(buf.get() == Magic, "bitmap_coded: not a graft sketch (bad magic)")
    val v = buf.get()
    require(v == VersionTagged,
      if (v == Version)
        "bitmap_coded: plain bitmap_sketch bytes in a coded merge - build " +
          "the tier with bitmap_sketch_coded so the dict_id travels with the bits"
      else s"bitmap_coded: unsupported sketch version $v")
    require(buf.remaining() >= 1, "bitmap_coded: truncated sketch header")
    val hasId = buf.get()
    require(hasId == 0 || hasId == 1, s"bitmap_coded: bad id flag $hasId")
    val id: java.lang.Long =
      if (hasId == 1) {
        require(buf.remaining() >= 12, "bitmap_coded: truncated sketch header")
        java.lang.Long.valueOf(buf.getLong())
      } else null
    val bm = new Bitmap64(readContainers(buf, "bitmap_coded"))
    // id-less bytes are the unset-partial sentinel and only ever
    // serialize EMPTY — hostile id-less bytes carrying containers would
    // slip past id reconciliation into any coded tier
    require((id ne null) || bm.isEmpty,
      "bitmap_coded: untagged sketch carrying containers is not a graft sketch")
    (id, bm)
  }

  /** Shared container-block reader: `count, (bucket, container)…` with
    * per-entry truncation guards and trailing-bytes rejection (the
    * kmv/dds canonical-bytes discipline). `fn` prefixes every error so
    * a truncated CODED sketch surfaces a coded-path-branded message,
    * not a plain-bitmap one (review-caught r12). */
  private def readContainers(buf: ByteBuffer, fn: String): java.util.TreeMap[java.lang.Long, Container] = {
    require(buf.remaining() >= 4, s"$fn: truncated sketch header")
    val n = buf.getInt()
    require(n >= 0, s"$fn: bad container count $n")
    val m = new java.util.TreeMap[java.lang.Long, Container]()
    var i = 0
    while (i < n) {
      require(buf.remaining() >= 9, s"$fn: truncated sketch entry")
      val hi = buf.getLong()
      m.put(hi, readContainer(buf, fn))
      i += 1
    }
    require(buf.remaining() == 0, s"$fn: trailing bytes after containers")
    m
  }

  private def readContainer(buf: ByteBuffer, fn: String): Container = buf.get() match {
    case KindArray =>
      require(buf.remaining() >= 4, s"$fn: truncated array container")
      val n = buf.getInt()
      require(n >= 0 && n <= ArrayMax, s"$fn: bad array container size $n")
      require(buf.remaining() >= 2 * n, s"$fn: truncated array container")
      val vs = new Array[Char](n)
      var i = 0
      var prev = -1
      while (i < n) {
        vs(i) = buf.getChar()
        // canonical form is strictly ascending; an unsorted hostile
        // array would silently break andCard's two-pointer walk and
        // the binarySearch contains/add paths
        require(vs(i).toInt > prev, s"$fn: array container not canonical")
        prev = vs(i).toInt
        i += 1
      }
      new ArrayContainer(vs, n)
    case KindBitmap =>
      require(buf.remaining() >= 4, s"$fn: truncated bitmap container")
      val card = buf.getInt()
      require(buf.remaining() >= 8 * BitmapWords,
        s"$fn: truncated bitmap container")
      val words = new Array[Long](BitmapWords)
      var i = 0
      var n = 0
      while (i < BitmapWords) {
        words(i) = buf.getLong()
        n += java.lang.Long.bitCount(words(i))
        i += 1
      }
      // the stored cardinality must MATCH the bits: `cardinality` reads
      // it directly (a lying card = silent miscount) and re-serialize
      // sizes encodings from it (a low card = BufferOverflow mid-write)
      require(card == n,
        s"$fn: bitmap container cardinality $card does not match its $n set bits")
      new BitmapContainer(words, n)
    case KindRun =>
      require(buf.remaining() >= 4, s"$fn: truncated run container")
      // runs expand to the in-memory kind their cardinality dictates —
      // RUN is a wire format only, the add/or/andCard hot paths never
      // see a third kind
      val r = buf.getInt()
      require(r >= 0 && r <= 32768, s"$fn: bad run count $r")
      require(buf.remaining() >= 4 * r, s"$fn: truncated run container")
      val starts = new Array[Int](r)
      val lens = new Array[Int](r)
      var total = 0
      var prevEnd = -2
      var i = 0
      while (i < r) {
        val st = buf.getChar().toInt
        val len = buf.getChar().toInt + 1 // stored as length-1
        // canonical form: ascending, non-adjacent (adjacent runs would
        // be one run), in-range — reject anything else loudly
        require(st > prevEnd + 1, s"$fn: runs not canonical at start $st")
        require(st + len <= 65536, s"$fn: run past container end")
        starts(i) = st; lens(i) = len
        prevEnd = st + len - 1
        total += len
        i += 1
      }
      if (total <= ArrayMax) {
        val vs = new Array[Char](total)
        var k = 0; i = 0
        while (i < r) {
          var v = starts(i); val end = starts(i) + lens(i)
          while (v < end) { vs(k) = v.toChar; k += 1; v += 1 }
          i += 1
        }
        new ArrayContainer(vs, total)
      } else {
        val words = new Array[Long](BitmapWords)
        i = 0
        while (i < r) {
          var v = starts(i); val end = starts(i) + lens(i)
          while (v < end) { words(v >>> 6) |= (1L << v); v += 1 }
          i += 1
        }
        new BitmapContainer(words, total)
      }
    case k => throw new IllegalArgumentException(s"$fn: bad container kind $k")
  }

  /** Exact |A \ B| without materializing the difference: the identity
    * |A| − |A ∩ B| — set difference costs exactly one intersection
    * walk plus a container-cardinality sum, and inherits
    * [[andCardinality]]'s non-materializing co-resident-bucket walk.
    * (A dedicated subtraction kernel would save nothing: every bucket
    * the intersection walk visits is exactly a bucket a subtraction
    * would visit.) */
  def andNotCardinality(a: Bitmap64, b: Bitmap64): Long =
    a.cardinality - andCardinality(a, b)

  /** Exact |A ∩ B| without materializing the intersection: walk the
    * shorter container map, intersect only co-resident buckets. */
  def andCardinality(a: Bitmap64, b: Bitmap64): Long = {
    val (small, big) =
      if (a.containers.size() <= b.containers.size()) (a, b) else (b, a)
    var n = 0L
    val it = small.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = big.containers.get(e.getKey)
      if (other ne null) n += Container.andCard(e.getValue, other)
    }
    n
  }

  // ---- containers ---------------------------------------------------

  private[functions] sealed trait Container {
    /** Returns the container holding the result — `this`, or the
      * promoted replacement when an array overflows. */
    def add(lo: Int): Container
    /** Set-union `other` into this container's storage (or a fresh
      * promotion); must NOT mutate `other`. */
    def or(other: Container): Container
    def cardinality: Int
    def contains(lo: Int): Boolean
    def copy(): Container
    /** Number of maximal consecutive-value runs in the set. */
    def runCount: Int
    /** Visit every set low-16 value in ascending order. */
    def foreachValue(f: Int => Unit): Unit
    /** Largest set low-16 value; undefined when empty (callers guard
      * on cardinality). */
    def maxValue: Int
  }

  private[functions] object Container {
    /** Serialized payload size (kind byte included) under the canonical
      * rule: the SMALLEST of run (1+4+4r), array (1+4+2n, n ≤ ArrayMax
      * only), bitmap (1+4+8·words) encodings; run wins ties over array,
      * array over bitmap — a fixed preference order, so the bytes are a
      * pure function of the set. */
    def encodedBytes(n: Int, r: Int): Int = 1 + payload(n, r)

    private def payload(n: Int, r: Int): Int =
      math.min(runBytes(r), math.min(arrayBytes(n), bitmapBytes))
    private def runBytes(r: Int): Int = 4 + 4 * r
    private def arrayBytes(n: Int): Int =
      if (n <= ArrayMax) 4 + 2 * n else Int.MaxValue
    private def bitmapBytes: Int = 4 + 8 * BitmapWords

    /** Write the canonical encoding [[encodedBytes]] sized for; `n`/`r`
      * are the container's (cardinality, runCount), already computed by
      * the caller's sizing pass. */
    def writeCanonical(c: Container, buf: ByteBuffer, n: Int, r: Int): Unit = {
      if (runBytes(r) <= math.min(arrayBytes(n), bitmapBytes)) {
        buf.put(KindRun)
        buf.putInt(r)
        // emit maximal runs as (start, length-1) char pairs, ascending
        var start = -2
        var prev = -2
        c.foreachValue { v =>
          if (v != prev + 1) {
            if (start >= 0) { buf.putChar(start.toChar); buf.putChar((prev - start).toChar) }
            start = v
          }
          prev = v
        }
        if (start >= 0) { buf.putChar(start.toChar); buf.putChar((prev - start).toChar) }
      } else if (n <= ArrayMax) {
        buf.put(KindArray)
        buf.putInt(n)
        c.foreachValue(v => buf.putChar(v.toChar))
      } else {
        buf.put(KindBitmap)
        buf.putInt(n)
        val words = c.asInstanceOf[BitmapContainer].words // n > ArrayMax ⇒ promoted
        var i = 0
        while (i < BitmapWords) { buf.putLong(words(i)); i += 1 }
      }
    }

    def andCard(x: Container, y: Container): Int = (x, y) match {
      case (a: ArrayContainer, b: ArrayContainer) =>
        // two-pointer walk over the sorted value arrays
        var i = 0; var j = 0; var n = 0
        while (i < a.n && j < b.n) {
          val av = a.values(i); val bv = b.values(j)
          if (av == bv) { n += 1; i += 1; j += 1 }
          else if (av < bv) i += 1
          else j += 1
        }
        n
      case (a: ArrayContainer, b: BitmapContainer) => probeCount(a, b)
      case (a: BitmapContainer, b: ArrayContainer) => probeCount(b, a)
      case (a: BitmapContainer, b: BitmapContainer) =>
        var i = 0; var n = 0
        while (i < BitmapWords) {
          n += java.lang.Long.bitCount(a.words(i) & b.words(i)); i += 1
        }
        n
    }
    private def probeCount(a: ArrayContainer, b: BitmapContainer): Int = {
      var i = 0; var n = 0
      while (i < a.n) { if (b.contains(a.values(i))) n += 1; i += 1 }
      n
    }
  }

  private[functions] final class ArrayContainer(
      var values: Array[Char], var n: Int) extends Container {
    def this() = this(new Array[Char](8), 0)

    def add(lo: Int): Container = {
      val c = lo.toChar
      val idx = java.util.Arrays.binarySearch(values, 0, n, c)
      if (idx >= 0) this
      else if (n < ArrayMax) {
        // max(8, …): a deserialized container may legally carry n = 0
        // (readContainer allows it), where n * 2 = 0 would "grow" to an
        // empty array and the insert below would throw out-of-bounds
        if (n == values.length)
          values = java.util.Arrays.copyOf(values,
            math.max(8, math.min(ArrayMax, n * 2)))
        val ins = -idx - 1
        System.arraycopy(values, ins, values, ins + 1, n - ins)
        values(ins) = c
        n += 1
        this
      } else promote().add(lo)
    }

    private def promote(): BitmapContainer = {
      val words = new Array[Long](BitmapWords)
      var i = 0
      while (i < n) {
        val v = values(i).toInt
        words(v >>> 6) |= (1L << v)
        i += 1
      }
      new BitmapContainer(words, n)
    }

    def or(other: Container): Container = other match {
      case o: ArrayContainer =>
        // merged size bounded by n + o.n; spill to a bitmap only when
        // the union actually exceeds the array ceiling
        val merged = new Array[Char](n + o.n)
        var i = 0; var j = 0; var k = 0
        while (i < n && j < o.n) {
          val av = values(i); val bv = o.values(j)
          if (av == bv) { merged(k) = av; i += 1; j += 1 }
          else if (av < bv) { merged(k) = av; i += 1 }
          else { merged(k) = bv; j += 1 }
          k += 1
        }
        while (i < n) { merged(k) = values(i); i += 1; k += 1 }
        while (j < o.n) { merged(k) = o.values(j); j += 1; k += 1 }
        if (k <= ArrayMax) new ArrayContainer(merged, k)
        else {
          val words = new Array[Long](BitmapWords)
          var x = 0
          while (x < k) {
            val v = merged(x).toInt
            words(v >>> 6) |= (1L << v)
            x += 1
          }
          new BitmapContainer(words, k)
        }
      case o: BitmapContainer =>
        // absorb into a CLONE of the dense page: `or` must not mutate
        // its argument (partials can be merged into several buffers)
        val b = new BitmapContainer(o.words.clone(), o.card)
        var i = 0
        while (i < n) { b.add(values(i).toInt); i += 1 }
        b
    }

    def cardinality: Int = n

    def contains(lo: Int): Boolean =
      java.util.Arrays.binarySearch(values, 0, n, lo.toChar) >= 0

    def copy(): Container =
      new ArrayContainer(java.util.Arrays.copyOf(values, n), n)

    def runCount: Int =
      if (n == 0) 0
      else {
        var r = 1
        var i = 1
        while (i < n) { if (values(i) != values(i - 1) + 1) r += 1; i += 1 }
        r
      }

    def foreachValue(f: Int => Unit): Unit = {
      var i = 0
      while (i < n) { f(values(i).toInt); i += 1 }
    }

    def maxValue: Int = values(n - 1).toInt
  }

  private[functions] final class BitmapContainer(
      val words: Array[Long], var card: Int) extends Container {

    def add(lo: Int): Container = {
      val w = lo >>> 6
      val bit = 1L << lo // JVM shifts mask to the low 6 bits — exactly lo & 63
      if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
      this
    }

    def or(other: Container): Container = other match {
      case o: ArrayContainer =>
        var i = 0
        while (i < o.n) { add(o.values(i).toInt); i += 1 }
        this
      case o: BitmapContainer =>
        var i = 0; var n = 0
        while (i < BitmapWords) {
          words(i) |= o.words(i)
          n += java.lang.Long.bitCount(words(i))
          i += 1
        }
        card = n
        this
    }

    def cardinality: Int = card

    def contains(lo: Int): Boolean =
      (words(lo >>> 6) & (1L << lo)) != 0L

    def copy(): Container = new BitmapContainer(words.clone(), card)

    def runCount: Int = {
      // a run starts at every 1-bit whose predecessor bit is 0; the
      // carry threads the predecessor across word boundaries
      var r = 0
      var carry = 0L
      var w = 0
      while (w < BitmapWords) {
        val x = words(w)
        r += java.lang.Long.bitCount(x & ~((x << 1) | carry))
        carry = x >>> 63
        w += 1
      }
      r
    }

    def foreachValue(f: Int => Unit): Unit = {
      var w = 0
      while (w < BitmapWords) {
        var bits = words(w)
        while (bits != 0L) {
          val t = java.lang.Long.numberOfTrailingZeros(bits)
          f((w << 6) | t)
          bits &= bits - 1
        }
        w += 1
      }
    }

    def maxValue: Int = {
      var w = BitmapWords - 1
      while (w >= 0) {
        if (words(w) != 0L)
          return (w << 6) | (63 - java.lang.Long.numberOfLeadingZeros(words(w)))
        w -= 1
      }
      -1 // unreachable for non-empty containers
    }
  }
}
