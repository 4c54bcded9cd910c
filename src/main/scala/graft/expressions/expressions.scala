package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions backing graft.functions.
  *
  * These evaluate directly over ArrayData/UTF8String (no boxing, no
  * UDF serialization). They use CodegenFallback — each call is a
  * virtual eval() inside an otherwise codegen'd stage; the per-row
  * work (hashing/dot product) dominates, so fallback cost is noise.
  */

private object Fnv {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xff); h *= Prime; i += 1 }
    h
  }
}

/** Shared helpers for the expression family below. */
private object Util {

  /** ASCII regex-\s whitespace (space, \t, \n, \u000B, \f, \r) — the
    * exact class Spark's split("\\s+") uses, so fused byte tokenizers
    * agree with tokenize() on every input.
    */
  def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Unboxed accessor for a numeric array child. */
  def numericGetter(e: Expression,
                    fname: String): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _)  => (a, i) => a.getDouble(i)
      case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
      case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
      case t => throw new IllegalArgumentException(
        s"$fname: unsupported input type $t")
    }

  def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
    case _ => false
  }

  /** Java source snippet reading element i of `arr` as double. */
  def javaGetter(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case t => throw new IllegalArgumentException(s"unsupported $t")
    }

  /** Analysis-time check: every child must be a numeric array (fail at
    * plan time, not as an executor ClassCastException mid-job).
    */
  def checkNumericArrays(fname: String,
                         children: Seq[Expression]): TypeCheckResult =
    children.find(c => !isNumericArray(c.dataType)) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$fname requires array<numeric> arguments, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}

/** 64-bit SimHash over an array<string> of tokens: FNV-1a hash per
  * token, per-bit ±1 vote, sign → bit. Duplicate tokens vote once per
  * occurrence (standard SimHash with unit weights).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Fnv.hashBytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** SimHash64 straight from raw text: whitespace tokenization over the
  * UTF-8 bytes fused with the per-token FNV hash and bit votes — no
  * token-array materialization (the hot-path spelling of
  * SimHash64(tokenize(text))).
  */
case class SimHashText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64_text requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val votes = new Array[Int](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && Util.isWs(bytes(i) & 0xff)) i += 1
      if (i < len) {
        var h = Fnv.Offset
        while (i < len && !Util.isWs(bytes(i) & 0xff)) {
          h ^= (bytes(i) & 0xff); h *= Fnv.Prime; i += 1
        }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashText =
    copy(child = c)
}

/** MD5-based 64-bit SimHash over an array<string> of tokens: per-token
  * hash = first 8 bytes of MD5(UTF-8), MSB-first; per-bit ±1 vote per
  * occurrence; bit k of the result = 1 iff vote > 0 (bit 0 = MSB).
  *
  * Exists alongside the FNV family because MD5 is a public standard
  * every engine implements — an external system (e.g. a SQL oracle)
  * can recompute signatures bit-for-bit from `md5(token)` hex, which
  * makes banded near-dup output exactly verifiable end-to-end
  * (hamming ≤ 3 over 4×16-bit bands ⇒ ≥1 band collides, so the banded
  * pair set IS the full ≤3-hamming set — no probabilistic recall).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64_md5 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = SimHashMd5.digests.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var k = 0
        while (k < 64) {
          if (((digest(k >> 3) >> (7 - (k & 7))) & 1) == 1) votes(k) += 1
          else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sig |= (1L << (63 - k)); k += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5 =
    copy(child = c)
}

object SimHashMd5 {
  // MessageDigest is stateful and not thread-safe; expression instances
  // can be shared across tasks in one executor JVM
  private[expressions] val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}

/** 128-bit MD5 SimHash over an array<string> of tokens → array<bigint>
  * of [hi, lo]: the full 16-byte digest votes per bit (bit 0 = MSB of
  * the digest, hi word first), so `hi` equals [[SimHashMd5]]'s 64-bit
  * signature exactly and `lo` extends it with the remaining 64 digest
  * bits.
  *
  * This is the scale path past the 64-bit family's ceiling: banding
  * 128 bits as 4×32-bit keys keeps the hamming≤3 pigeonhole guarantee
  * while growing the bucket space from 2^16 to 2^32 per band — the
  * expected within-bucket candidate volume drops from N²/65k to
  * N²/4.3B per band, so the banded join stays linear far beyond the
  * ~10M-docs-per-scope point where 16-bit buckets saturate. Same
  * external verifiability as [[SimHashMd5]]: any engine with md5()
  * recomputes signatures bit-for-bit.
  */
case class SimHashMd5Wide(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash128_md5 requires array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = SimHashMd5.digests.get()
    val votes = new Array[Int](128)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var k = 0
        while (k < 128) {
          if (((digest(k >> 3) >> (7 - (k & 7))) & 1) == 1) votes(k) += 1
          else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) hi |= (1L << (63 - k)); k += 1 }
    while (k < 128) { if (votes(k) > 0) lo |= (1L << (127 - k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(hi, lo))
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5Wide =
    copy(child = c)
}

/** Distinct word n-gram shingles hashed straight to 64-bit values in
  * one pass over the UTF-8 bytes: whitespace tokenization, FNV-1a per
  * token, n consecutive token hashes mixed into one shingle hash —
  * no token strings, no shingle strings, no intermediate arrays.
  * A document shorter than n tokens yields one whole-text shingle.
  * The semantic twin of Dedup.shingles + xxhash64, collisions aside
  * (~2^-64 per pair).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && n <= 16, "n must be in [1,16]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${child.dataType}")

  private def mix(a: Long, b: Long): Long = {
    // boost-style hash_combine on 64 bits
    a ^ (b + 0x9e3779b97f4a7c15L + (a << 12) + (a >>> 4))
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // tokenize: runs of non-whitespace bytes
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && Util.isWs(bytes(i) & 0xff)) i += 1
      if (i < len) {
        var h = Fnv.Offset
        while (i < len && !Util.isWs(bytes(i) & 0xff)) {
          h ^= (bytes(i) & 0xff); h *= Fnv.Prime; i += 1
        }
        tokenHashes += h
      }
    }
    val m = tokenHashes.length
    val out =
      if (m < n) {
        // whole-text shingle: mix every token hash
        var h = 0L
        var j = 0
        while (j < m) { h = mix(h, tokenHashes(j)); j += 1 }
        Array(h)
      } else {
        val set = new java.util.HashSet[java.lang.Long](m * 2)
        val arr = new scala.collection.mutable.ArrayBuffer[Long](m)
        var j = 0
        while (j <= m - n) {
          var h = 0L
          var k = 0
          while (k < n) { h = mix(h, tokenHashes(j + k)); k += 1 }
          if (set.add(h)) arr += h
          j += 1
        }
        arr.toArray
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** POSITIONAL word n-gram hashes in one pass over the UTF-8 bytes:
  * out(i) = 64-bit hash of tokens [i, i+n), every occurrence kept in
  * token order (no dedup — `posexplode` over the result yields the
  * (token-position, gram-hash) stream that positional operators like
  * repeated-span removal consume). A document shorter than n tokens
  * yields an EMPTY array — positional grams do not exist for it
  * (contrast [[ShingleHashes]], which is distinct/positionless and
  * falls back to one whole-text shingle). Tokenization and hashing
  * match [[ShingleHashes]] exactly: ASCII-\s runs, FNV-1a per token,
  * boost-style hash_combine across the window; collisions ~2^-64 per
  * pair, so downstream group-by-hash semantics equal group-by-text
  * (oracles replay on the raw text).
  */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires string, got ${child.dataType}")

  private def mix(a: Long, b: Long): Long =
    a ^ (b + 0x9e3779b97f4a7c15L + (a << 12) + (a >>> 4))

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && Util.isWs(bytes(i) & 0xff)) i += 1
      if (i < len) {
        var h = Fnv.Offset
        while (i < len && !Util.isWs(bytes(i) & 0xff)) {
          h ^= (bytes(i) & 0xff); h *= Fnv.Prime; i += 1
        }
        tokenHashes += h
      }
    }
    val m = tokenHashes.length
    val out =
      if (m < n) Array.emptyLongArray
      else {
        val arr = new Array[Long](m - n + 1)
        var j = 0
        while (j <= m - n) {
          var h = 0L
          var k = 0
          while (k < n) { h = mix(h, tokenHashes(j + k)); k += 1 }
          arr(j) = h
          j += 1
        }
        arr
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): GramHashes =
    copy(child = c)
}

/** Aho–Corasick automaton over UTF-8 bytes (Aho & Corasick 1975),
  * built once per JVM from a broadcast-sized phrase list, in two
  * memory tiers chosen automatically by trie size:
  *
  *  - DENSE (trie ≤ [[AhoCorasick.DenseMaxNodes]] nodes): 256-wide
  *    `next` transition table with fail links folded in at build, so
  *    matching is one table read per input byte. Cost ~1 KB per node
  *    (≈ total phrase bytes) — ≤ ~64 MB per executor at the
  *    threshold, typically far less with shared prefixes.
  *  - SPARSE (above the threshold — 100k+-phrase blocklists whose
  *    dense table would cost executor GBs): per-node sorted child
  *    arrays + explicit fail links; matching binary-searches the
  *    node's real children and walks the fail chain on miss
  *    (amortized O(1) fail steps per input byte). Cost ~8 bytes per
  *    trie EDGE, so a 1M-phrase list is tens of MB, not GBs. Built
  *    from the sorted pattern list so construction touches only the
  *    rightmost trie spine — no transient dense tables.
  *
  * Both tiers carry per-node flattened emit lists (own terminals ++
  * fail-chain terminals), so every occurrence — overlapping included
  * — of every phrase is counted in a single pass, and both count
  * bit-identically (spec-asserted against each other at 100k
  * generated phrases).
  */
private[graft] object AhoCorasick {

  /** Dense tier ceiling: 1 KB/node ⇒ ≤ ~64 MB resident. */
  val DenseMaxNodes: Int = 1 << 16

  sealed trait Automaton {
    def countInto(text: Array[Byte], counts: Array[Long]): Unit
    def nNodes: Int

    /** True iff ANY pattern occurs — early-exits on the first emit
      * and allocates nothing, so a pure drop-filter scan never pays
      * the k-wide counts array ([[MultiPatternAny]]).
      */
    def anyMatch(text: Array[Byte]): Boolean
  }

  final class DenseAutomaton(val next: Array[Array[Int]],
                             val emits: Array[Array[Int]])
      extends Automaton {
    def nNodes: Int = next.length
    def countInto(text: Array[Byte], counts: Array[Long]): Unit = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = next(s)(text(i) & 0xff)
        val em = emits(s)
        var k = 0
        while (k < em.length) { counts(em(k)) += 1; k += 1 }
        i += 1
      }
    }
    def anyMatch(text: Array[Byte]): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = next(s)(text(i) & 0xff)
        if (emits(s).length > 0) return true
        i += 1
      }
      false
    }
  }

  /** keys(s) = sorted child byte values of node s; targets(s) aligned
    * child states; fail = suffix links (root = 0).
    */
  final class SparseAutomaton(val keys: Array[Array[Byte]],
                              val targets: Array[Array[Int]],
                              val fail: Array[Int],
                              val emits: Array[Array[Int]])
      extends Automaton {
    def nNodes: Int = keys.length

    // sorted UNSIGNED byte search (keys stored as raw bytes; compare
    // on & 0xff, matching the sorted-pattern build order)
    private def child(s: Int, c: Int): Int = {
      val ks = keys(s)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = ks(mid) & 0xff
        if (k == c) return targets(s)(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    def countInto(text: Array[Byte], counts: Array[Long]): Unit = {
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text(i) & 0xff
        var t = child(s, c)
        while (t < 0 && s != 0) { s = fail(s); t = child(s, c) }
        s = if (t < 0) 0 else t
        val em = emits(s)
        var k = 0
        while (k < em.length) { counts(em(k)) += 1; k += 1 }
        i += 1
      }
    }
    def anyMatch(text: Array[Byte]): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text(i) & 0xff
        var t = child(s, c)
        while (t < 0 && s != 0) { s = fail(s); t = child(s, c) }
        s = if (t < 0) 0 else t
        if (emits(s).length > 0) return true
        i += 1
      }
      false
    }
  }

  /** Unsigned-lexicographic byte-array ordering — the trie child
    * order the sparse build appends in.
    */
  private def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Exact trie node count without building: 1 (root) + per sorted
    * pattern its bytes beyond the common prefix with the previous
    * pattern. Drives the dense/sparse tier choice.
    */
  def trieNodeCount(patterns: Seq[Array[Byte]]): Int = {
    val sorted = patterns.sortWith(compareUnsigned(_, _) < 0)
    var nodes = 1L
    var prev: Array[Byte] = Array.emptyByteArray
    sorted.foreach { p =>
      var l = 0
      val max = math.min(prev.length, p.length)
      while (l < max && prev(l) == p(l)) l += 1
      nodes += p.length - l
      prev = p
    }
    math.min(nodes, Int.MaxValue).toInt
  }

  def build(patterns: Seq[Array[Byte]]): Automaton =
    if (trieNodeCount(patterns) <= DenseMaxNodes) buildDense(patterns)
    else buildSparse(patterns)

  // One automaton per DISTINCT phrase list per JVM: every task
  // deserializes its own expression copy, so a per-instance lazy val
  // would rebuild the automaton once per task thread (measured 12.7 s
  // for a 100k-phrase scan at local[32] — builds dominated the scan).
  // Key = SHA-256 over the full-4-byte-length-prefixed pattern bytes
  // (injective framing at any pattern length — a 2-byte prefix would
  // let ≥64 KiB patterns alias another list's framing and silently
  // serve the wrong automaton). SHA-256, not MD5: chosen-prefix MD5
  // collisions are practical and this length-framed input is exactly
  // the collision-friendly shape, so two distinct blocklists could
  // be crafted to alias — serving the wrong automaton for a POLICY
  // filter is a wrong result, not a perf bug. Digest cost is noise
  // next to the automaton build this cache exists to amortize. BOUNDED: an access-order LRU capped
  // at CacheMaxEntries, so a long-lived executor cycling through many
  // distinct blocklists (Thrift server, notebooks) tops out at
  // ~CacheMaxEntries × automaton size instead of growing without
  // eviction; a rebuild after eviction is correctness-neutral.
  private val CacheMaxEntries = 8
  private val cache =
    new java.util.LinkedHashMap[String, Automaton](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Automaton]): Boolean =
        size() > CacheMaxEntries
    }

  def cachedBuild(patterns: Seq[Array[Byte]]): Automaton = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val len = java.nio.ByteBuffer.allocate(4)
    patterns.foreach { p =>
      len.clear(); len.putInt(p.length)
      md.update(len.array()); md.update(p)
    }
    val key = java.util.Base64.getEncoder.encodeToString(md.digest()) +
      ":" + patterns.length
    // lock only the map, not the build: concurrent first touches of
    // the SAME key may both build (benign — last insert wins), but
    // distinct lists never serialize behind each other's build
    val hit = cache.synchronized(Option(cache.get(key)))
    hit.getOrElse {
      val a = build(patterns)
      cache.synchronized(cache.put(key, a))
      a
    }
  }

  def buildDense(patterns: Seq[Array[Byte]]): DenseAutomaton = {
    val goto = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
    val term = new scala.collection.mutable.ArrayBuffer[List[Int]]()
    def newNode(): Int = {
      goto += Array.fill(256)(-1); term += Nil; goto.length - 1
    }
    newNode()
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (goto(s)(c) < 0) goto(s)(c) = newNode()
        s = goto(s)(c)
      }
      term(s) = id :: term(s)
    }
    val nNodes = goto.length
    val fail = new Array[Int](nNodes)
    val emits = new Array[Array[Int]](nNodes)
    emits(0) = term(0).reverse.toArray
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val u = goto(0)(c)
      if (u < 0) goto(0)(c) = 0
      else { fail(u) = 0; queue.add(u) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      emits(u) = (term(u).reverse ++ emits(fail(u))).toArray
      var c = 0
      while (c < 256) {
        val v = goto(u)(c)
        if (v < 0) goto(u)(c) = goto(fail(u))(c) // fold fail into next
        else { fail(v) = goto(fail(u))(c); queue.add(v) }
        c += 1
      }
    }
    new DenseAutomaton(goto.toArray, emits)
  }

  def buildSparse(patterns: Seq[Array[Byte]]): SparseAutomaton = {
    // sort (keeping original pattern ids) so trie insertion only ever
    // appends to the rightmost path: each node's children arrive in
    // sorted order and per-node growable buffers never re-sort
    val sorted = patterns.zipWithIndex
      .sortWith((a, b) => compareUnsigned(a._1, b._1) < 0)
    val keysB = new scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[Byte]]()
    val targetsB = new scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.ArrayBuffer[Int]]()
    val term = new scala.collection.mutable.ArrayBuffer[List[Int]]()
    def newNode(): Int = {
      keysB += new scala.collection.mutable.ArrayBuffer[Byte](4)
      targetsB += new scala.collection.mutable.ArrayBuffer[Int](4)
      term += Nil
      keysB.length - 1
    }
    newNode()
    // path(d) = node at depth d of the current rightmost path
    var path = new Array[Int](16)
    path(0) = 0
    var prev: Array[Byte] = Array.emptyByteArray
    sorted.foreach { case (p, id) =>
      var l = 0
      val max = math.min(prev.length, p.length)
      while (l < max && prev(l) == p(l)) l += 1
      if (p.length + 1 > path.length) {
        path = java.util.Arrays.copyOf(path, math.max(path.length * 2,
          p.length + 1))
      }
      var d = l
      var s = path(d)
      while (d < p.length) {
        val t = newNode()
        keysB(s) += p(d)
        targetsB(s) += t
        s = t
        d += 1
        path(d) = s
      }
      term(s) = id :: term(s)
      prev = p
    }
    val n = keysB.length
    val keys = new Array[Array[Byte]](n)
    val targets = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      keys(i) = keysB(i).toArray; targets(i) = targetsB(i).toArray
      i += 1
    }
    // BFS fail links over the sparse structure (classic form — no
    // fold-in; the matcher walks the chain)
    val fail = new Array[Int](n)
    val emits = new Array[Array[Int]](n)
    emits(0) = term(0).reverse.toArray
    def childOf(s: Int, c: Int): Int = {
      val ks = keys(s)
      var lo = 0
      var hi = ks.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = ks(mid) & 0xff
        if (k == c) return targets(s)(mid)
        else if (k < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
    val queue = new java.util.ArrayDeque[Int]()
    var k = 0
    while (k < keys(0).length) {
      val u = targets(0)(k)
      fail(u) = 0
      queue.add(u)
      k += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      emits(u) = (term(u).reverse ++ emits(fail(u))).toArray
      var k = 0
      while (k < keys(u).length) {
        val c = keys(u)(k) & 0xff
        val v = targets(u)(k)
        var f = fail(u)
        var t = childOf(f, c)
        while (t < 0 && f != 0) { f = fail(f); t = childOf(f, c) }
        fail(v) = if (t < 0 || t == v) 0 else t
        queue.add(v)
        k += 1
      }
    }
    new SparseAutomaton(keys, targets, fail, emits)
  }
}

/** Per-phrase occurrence counts in one Aho–Corasick pass:
  * array<long> aligned with the phrase list, counting EVERY start
  * position (overlapping occurrences included) of every phrase as a
  * plain byte substring — no word boundaries, no case folding (pair
  * with `normalize_text` upstream for case-insensitive policy
  * lists). The blocklist/safety-phrase filtering stage of a curation
  * pipeline: one automaton pass over each document where k regex
  * scans would pay k passes. Phrases ship once in the plan closure;
  * the automaton builds lazily per JVM.
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "patterns must not be empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_counts requires string, got ${child.dataType}")

  @transient private lazy val ac = AhoCorasick.cachedBuild(
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  override def nullSafeEval(input: Any): Any = {
    val counts = new Array[Long](patterns.length)
    ac.countInto(input.asInstanceOf[UTF8String].getBytes, counts)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  override protected def withNewChildInternal(c: Expression)
      : MultiPatternCounts = copy(child = c)
}

/** Boolean ANY-pattern test in one Aho–Corasick pass with first-hit
  * early exit and ZERO per-row allocation — the drop-filter spelling
  * of [[MultiPatternCounts]]: a 100k-phrase blocklist drop must not
  * allocate (and zero) a 100k-long counts array per row when all it
  * needs is one bit (the sf0.1 100k-phrase scan measured 12.7 s with
  * per-task builds + per-row count arrays and 0.28 s with the cached
  * automaton + this early-exit form). Same byte-exact substring
  * semantics and the same per-JVM cached automaton as the counting
  * form.
  */
case class MultiPatternAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "patterns must not be empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_any requires string, got ${child.dataType}")

  @transient private lazy val ac = AhoCorasick.cachedBuild(
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  override def nullSafeEval(input: Any): Any =
    ac.anyMatch(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(c: Expression)
      : MultiPatternAny = copy(child = c)
}

/** Winnowing fingerprint selection in one native pass (Schleimer et
  * al. 2003): md5 every n-token gram, slide a `window`-wide window
  * over the gram digests, select each window's minimum with ties to
  * the RIGHTMOST position, emit the distinct (pos, fp) selections in
  * position order (fp = leading 8 hex chars; selection compares the
  * FULL digest — raw unsigned digest bytes order exactly like the
  * hex string, so a SQL oracle replaying on md5 hex agrees bit for
  * bit). A doc with fewer than n tokens yields an empty array; one
  * with 1..window-1 grams yields the single min-of-all selection.
  *
  * Why native: the Column-API spelling pays a token-array slice, a
  * string concat, an md5 call AND per-window array slice/reverse/
  * position ops per gram — this pass reuses one digest instance over
  * token byte ranges and a monotonic deque (amortized O(1) per gram;
  * popping equal values as new ones enter makes the deque front the
  * rightmost minimum by construction). Same whitespace tokenization
  * as [[GramHashes]].
  */
case class WinnowFingerprints(child: Expression, n: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n must be >= 1")
  require(window >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got ${child.dataType}")

  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token byte spans
    val starts = new scala.collection.mutable.ArrayBuffer[Int](64)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && Util.isWs(bytes(i) & 0xff)) i += 1
      if (i < len) {
        starts += i
        while (i < len && !Util.isWs(bytes(i) & 0xff)) i += 1
        ends += i
      }
    }
    val m = starts.length
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val g = m - n + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = Array[Byte](' ')
    val digests = new Array[Array[Byte]](g)
    var j = 0
    while (j < g) {
      md.reset()
      var t = j
      while (t < j + n) {
        if (t > j) md.update(space)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      digests(j) = md.digest()
      j += 1
    }
    // monotonic deque of gram indices; popping `>=` on entry keeps
    // the rightmost minimum at the front
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      2 * g / (window + 1) + 2)
    var lastSel = -1
    def emit(sel: Int): Unit = if (sel != lastSel) {
      lastSel = sel
      val d = digests(sel)
      val hex = new Array[Char](8)
      var b = 0
      while (b < 4) {
        hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      out += new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](sel.toLong,
          UTF8String.fromString(new String(hex))))
    }
    j = 0
    while (j < g) {
      while (tail > head && cmp(digests(dq(tail - 1)), digests(j)) >= 0)
        tail -= 1
      dq(tail) = j
      tail += 1
      val ws = j - window + 1 // window start for windows ending at j
      if (ws >= 0) {
        while (dq(head) < ws) head += 1
        emit(dq(head))
      }
      j += 1
    }
    // short doc: fewer grams than the window — one min-of-all pick
    if (g < window) emit(dq(head))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : WinnowFingerprints = copy(child = c)
}

/** MinHash signature in one pass: per shingle ONE byte-level hash
  * (FNV-1a) expanded into k permutation values via h1 + i·h2
  * (h2 = splitmix64(h1)) — the standard trick, k× cheaper than k
  * seeded re-hashings and allocation-free until the final signature.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && k <= 512, "k must be in [1,512]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string|bigint>, got $t")
    }
  import Util.splitmix64

  @transient private lazy val elemHash: (ArrayData, Int) => Long =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case StringType => (a, i) => Fnv.hashBytes(a.getUTF8String(i).getBytes)
      case LongType   => (a, i) => splitmix64(a.getLong(i))
      case t => throw new IllegalArgumentException(
        s"minhash_signature requires array<string|bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h1 = elemHash(arr, i)
        val h2 = splitmix64(h1) | 1L // odd → full-period increments
        var hv = h1
        var j = 0
        while (j < k) {
          if (hv < sig(j)) sig(j) = hv
          hv += h2
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Cosine similarity of two numeric arrays, accumulated in double with
  * a single sequential loop (parity with scalar reference
  * implementations, e.g. DuckDB's list_cosine_similarity on DOUBLE[]).
  * Returns null on length mismatch or zero-norm input.
  * Fully code-generated (participates in whole-stage codegen — this is
  * the ANN scoring hot loop).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("cosine_similarity", children)

  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) { ${ev.isNull} = true; }
        |else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $x = ${Util.javaGetter(left, a, i)};
        |    double $y = ${Util.javaGetter(right, b, i)};
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) *
        |    java.lang.Math.sqrt($nb)); }
        |}
      """.stripMargin
    })
  }

  @transient private lazy val getL = Util.numericGetter(left, "cosine_similarity")
  @transient private lazy val getR = Util.numericGetter(right, "cosine_similarity")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimilarity = copy(l, r)
}

/** Dot product of two numeric arrays in double. Null on length
  * mismatch. Fully code-generated.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("dot_product", children)

  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) { ${ev.isNull} = true; }
        |else {
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += (${Util.javaGetter(left, a, i)}) *
        |      (${Util.javaGetter(right, b, i)});
        |  }
        |  ${ev.value} = $dot;
        |}
      """.stripMargin
    })
  }

  @transient private lazy val getL = Util.numericGetter(left, "dot_product")
  @transient private lazy val getR = Util.numericGetter(right, "dot_product")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) { dot += getL(a, i) * getR(b, i); i += 1 }
    dot
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(l, r)
}

/** L2-normalize a numeric array → array<double> (unit vector). Null
  * for zero-norm input.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("l2_normalize", Seq(child))

  @transient private lazy val getElem = Util.numericGetter(child, "l2_normalize")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = getElem(a, i); ss += x * x; i += 1 }
    if (ss == 0.0) return null
    val inv = 1.0 / math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = getElem(a, i) * inv; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): L2Normalize =
    copy(child = c)
}

/** Numeric array → array of IEEE 754 bit patterns
  * (doubleToRawLongBits per element, floats widened first). Lossless
  * long-array transport for embeddings through surfaces that carry
  * only bigint arrays — e.g. the streaming dedup bucket-state payload
  * — so a downstream cosine recomputed from the bits is bit-identical
  * to one computed on the source column.
  */
case class DoubleBits(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("double_bits", Seq(child))

  @transient private lazy val getElem =
    Util.numericGetter(child, "double_bits")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Double.doubleToRawLongBits(getElem(a, i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): DoubleBits =
    copy(child = c)
}

/** Polynomial rolling hash (Rabin-Karp) over UTF-8 bytes:
  * h = h·1000003 + byte, wrapping 64-bit. Fingerprinting primitive —
  * stable across partitions/engines, cheap to combine incrementally.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
}

/** Sign-random-projection LSH bucket: bit p = (dot(x, plane_p) > 0).
  * Planes are GAUSSIAN vectors derived deterministically from
  * (seed, p, dim-index) via splitmix64 + Box-Muller — identical on
  * every executor with zero broadcast.
  *
  * Gaussian (spherically symmetric) plane coordinates are load-bearing,
  * not cosmetic: the SRP guarantee P(plane separates a pair) = θ/π
  * holds PER PAIR only when the plane direction is rotation-invariant.
  * An earlier uniform-[-1,1) coordinate draw kept the AVERAGE collision
  * curve but grew a fat per-pair tail on structured (quantized-lattice)
  * embeddings — measured on the test fixture: pairs at cos ≈ 0 agreeing
  * on all 16 sign bits at ~100× the binomial rate, concentrating 10% of
  * a corpus into one bucket and turning banded near-dup candidate
  * volume superlinear. With Gaussian coordinates the same fixture's
  * 16-bit agreement tail matches the binomial prediction exactly.
  */
case class HyperplaneLshBucket(child: Expression, nPlanes: Int, dim: Int,
                               seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(nPlanes > 0 && nPlanes <= 30, "nPlanes must be in [1,30]")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("hyperplane_lsh_bucket", Seq(child))
  import Util.splitmix64

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { i =>
        val h1 = splitmix64(seed ^ (p.toLong << 32) ^ i.toLong)
        val h2 = splitmix64(h1 ^ 0x5851F42D4C957F2DL)
        // Box-Muller; u1 offset by half an ulp-step so log(0) can't occur
        val u1 = ((h1 >>> 11).toDouble + 0.5) / (1L << 53).toDouble
        val u2 = (h2 >>> 11).toDouble / (1L << 53).toDouble
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
    }

  @transient private lazy val getElem =
    Util.numericGetter(child, "hyperplane_lsh_bucket")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += getElem(a, i) * plane(i); i += 1 }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(c: Expression)
      : HyperplaneLshBucket = copy(child = c)
}

/** Unicode normalization (java.text.Normalizer) → string. `form` is
  * NFC/NFD/NFKC/NFKD, validated at construction. The canonical-form
  * step every exact-dedup / decontamination pipeline runs before
  * hashing: visually-identical strings with different codepoint
  * sequences (composed vs combining accents, compatibility forms)
  * otherwise hash apart. Fast path: already-normalized text (the
  * common case for clean corpora) is detected with
  * `Normalizer.isNormalized` and returned as-is, no re-encode.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val nf =
    java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires string, got ${child.dataType}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $form")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, nf)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }

  override protected def withNewChildInternal(c: Expression)
      : UnicodeNormalize = copy(child = c)
}

/** Strip combining marks: NFD-decompose, drop \p{M}, NFC-recompose —
  * 'café' → 'cafe'. Matches DuckDB/utf8proc `strip_accents` on Latin
  * accents (the d-family oracles rely on that agreement). ASCII input
  * short-circuits without decomposition.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val marks = java.util.regex.Pattern.compile("\\p{M}+")

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // pure-ASCII fast path: no accents possible, skip the decompose
    val bytes = u.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) u
    else {
      val d = java.text.Normalizer.normalize(u.toString,
        java.text.Normalizer.Form.NFD)
      UTF8String.fromString(java.text.Normalizer.normalize(
        marks.matcher(d).replaceAll(""),
        java.text.Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(c: Expression)
      : StripAccents = copy(child = c)
}

/** Greedy longest-match subword tokenization — the WordPiece inference
  * algorithm (Wu et al. 2016; the BERT tokenizer's public max-munch
  * rule): each whitespace word is consumed left-to-right, at every
  * position taking the LONGEST vocab piece that matches (pieces at
  * word-start match verbatim; pieces inside a word match their `##`-
  * prefixed continuation form); a position with no match fails the
  * WHOLE word to `unk`. Output is the concatenated piece sequence of
  * all words in order, continuations carrying their `##` prefix.
  *
  * This is the REAL subword-token count — what packing budgets and
  * per-token pricing actually meter — where `tokenize_bpeish` only
  * approximates pre-token boundaries. The reference has no tokenizer
  * surface at all (its scalar library stops at string functions,
  * /root/reference/py-denormalized/python/denormalized/datafusion/functions.py).
  *
  * Whitespace splitting mirrors `TextAnalysis.tokenize` exactly (trim
  * the ASCII regex-\s class, split on runs of it), so
  * `size(wordpiece_encode(text, v))` composes with every
  * token-count-based operator here.
  *
  * Scale: the vocab ships once per task in the plan closure (a
  * 30k-piece production vocab is ~0.5 MB — broadcast-sized, not
  * data-sized) and builds a per-JVM hash lookup lazily; per-row cost
  * is O(chars × maxPieceLen) with no allocation beyond the output.
  * Pure projection: no shuffle, streams as-is.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           unk: String)
    extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires string, got ${child.dataType}")

  // start pieces verbatim; continuation pieces stored stripped of
  // their "##" marker, keyed separately
  @transient private lazy val startSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (!p.startsWith("##")) s.add(p))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
    s
  }
  @transient private lazy val maxStartLen: Int =
    vocab.iterator.filterNot(_.startsWith("##")).map(_.length)
      .foldLeft(0)(math.max)
  @transient private lazy val maxContLen: Int =
    vocab.iterator.filter(_.startsWith("##")).map(_.length - 2)
      .foldLeft(0)(math.max)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var a = 0
    var b = text.length
    while (a < b && Util.isWs(text.charAt(a))) a += 1
    while (b > a && Util.isWs(text.charAt(b - 1))) b -= 1
    val words = text.substring(a, b).split("[ \t\n\u000B\f\r]+", -1)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      words.length * 2)
    words.foreach { w =>
      if (w.nonEmpty) {
        val pieces = new scala.collection.mutable.ArrayBuffer[String](4)
        var pos = 0
        var failed = false
        while (!failed && pos < w.length) {
          val atStart = pos == 0
          val set = if (atStart) startSet else contSet
          val cap = math.min(
            if (atStart) maxStartLen else maxContLen, w.length - pos)
          var l = cap
          var hit = -1
          while (hit < 0 && l >= 1) {
            if (set.contains(w.substring(pos, pos + l))) hit = l
            else l -= 1
          }
          if (hit < 0) failed = true
          else {
            pieces += (if (atStart) w.substring(pos, pos + hit)
                       else "##" + w.substring(pos, pos + hit))
            pos += hit
          }
        }
        if (failed) out += UTF8String.fromString(unk)
        else pieces.foreach(p => out += UTF8String.fromString(p))
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : WordPieceEncode = copy(child = c)
}

/** Merge-list byte-pair encoding (the Sennrich 2016 / GPT-2 BPE
  * inference algorithm): whitespace-split words start as code-point
  * symbols; repeatedly the PRESENT adjacent pair with the lowest
  * merge rank is merged at every occurrence left-to-right
  * (non-overlapping), until no listed pair remains; tokens emit in
  * word order. `merges` entries are "left right" pairs in priority
  * order — the real artifact a trained BPE tokenizer ships, where
  * [[WordPieceEncode]] models the greedy-longest-match family. A
  * word with no applicable merges tokenizes to its code points
  * (character fallback — never an UNK).
  *
  * Oracle note (t29): for merge lists with left ≠ right whose
  * operands are only formable by earlier merges (true of learned
  * lists and the gate's list), this iterative-lowest semantic equals
  * applying each merge to fixpoint in rank order — which is the
  * separator-string replace() form a SQL oracle can express;
  * equivalence verified exhaustively (≤7-symbol strings over the
  * operand alphabet) plus 200k-string fuzz, and the self-pair
  * left-to-right case (where the forms differ) is spec-pinned to
  * the canonical semantic here.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(merges.nonEmpty, "merges must not be empty")
  require(merges.forall { p =>
    val f = p.split(" ", -1)
    f.length == 2 && f.forall(_.nonEmpty)
  }, "each merge must be a 'left right' pair (exactly one space, " +
    "non-empty sides)")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${child.dataType}")

  // parsed once (the constructor require guarantees exactly two
  // non-empty space-separated sides, so the pattern match is total);
  // the space key separator is unambiguous because symbols come from
  // whitespace-split words and can never contain one
  @transient private lazy val pairs: Array[(String, String)] =
    merges.map { p => val f = p.split(" ", -1); (f(0), f(1)) }.toArray

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }

  private def encodeWord(w: String,
                         out: scala.collection.mutable.ArrayBuffer[
                           UTF8String]): Unit = {
    var syms = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var n = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    var count = n
    var done = count <= 1
    while (!done) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var k = 0
      while (k < count - 1) {
        val r = rank.get(syms(k) + " " + syms(k + 1))
        if (r != null && r < best) best = r
        k += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = pairs(best)
        val next = new Array[String](count)
        var src = 0
        var dst = 0
        while (src < count) {
          if (src < count - 1 && syms(src) == a && syms(src + 1) == b) {
            next(dst) = a + b; src += 2
          } else {
            next(dst) = syms(src); src += 1
          }
          dst += 1
        }
        syms = next
        count = dst
        done = count <= 1
      }
    }
    var j = 0
    while (j < count) { out += UTF8String.fromString(syms(j)); j += 1 }
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    text.split("[ \t\n\u000B\f\r]+", -1).foreach { w =>
      if (w.nonEmpty) encodeWord(w, out)
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : BpeEncode = copy(child = c)
}

/** BYTE-LEVEL (GPT-2-style) BPE encoding — the inference half of
  * [[graft.operators.Tokenizer.learnByteBpeMerges]]: pretokenize
  * with the GPT-2 regex (the space travels WITH the following word),
  * map each pretoken's UTF-8 bytes through the byte→unicode fallback
  * table ([[graft.operators.Tokenizer.ByteToUnicode]] — ≤ 256 base
  * symbols, so NO input is ever out-of-alphabet), then apply merges
  * by the same iterative lowest-rank rule as [[BpeEncode]]. Tokens
  * concatenate back to the byte-mapped text exactly (the pretokenizer
  * partitions the input), so
  * [[graft.operators.Tokenizer.decodeByteTokens]] inverts the
  * encoding losslessly — spec-pinned round trip.
  */
case class ByteBpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(merges.nonEmpty, "merges must not be empty")
  require(merges.forall { p =>
    val f = p.split(" ", -1)
    f.length == 2 && f.forall(_.nonEmpty)
  }, "each merge must be a 'left right' pair (exactly one space, " +
    "non-empty sides)")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"byte_bpe_encode requires string, got ${child.dataType}")

  @transient private lazy val pairs: Array[(String, String)] =
    merges.map { p => val f = p.split(" ", -1); (f(0), f(1)) }.toArray

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, i)
    }
    m
  }

  @transient private lazy val pretokenizer: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      graft.operators.Tokenizer.Gpt2Pretokenizer)

  private def encodePretoken(tok: String,
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms: Array[String] =
      graft.operators.Tokenizer.byteSymbols(tok)
    var count = syms.length
    var done = count <= 1
    while (!done) {
      var best = Int.MaxValue
      var k = 0
      while (k < count - 1) {
        val r = rank.get(syms(k) + " " + syms(k + 1))
        if (r != null && r < best) best = r
        k += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = pairs(best)
        val next = new Array[String](count)
        var src = 0
        var dst = 0
        while (src < count) {
          if (src < count - 1 && syms(src) == a && syms(src + 1) == b) {
            next(dst) = a + b; src += 2
          } else {
            next(dst) = syms(src); src += 1
          }
          dst += 1
        }
        syms = next
        count = dst
        done = count <= 1
      }
    }
    var j = 0
    while (j < count) { out += UTF8String.fromString(syms(j)); j += 1 }
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val m = pretokenizer.matcher(text)
    while (m.find()) {
      val tok = m.group()
      if (tok.nonEmpty) encodePretoken(tok, out)
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : ByteBpeEncode = copy(child = c)
  override def prettyName: String = "byte_bpe_encode"
}

/** Unigram-LM (SentencePiece-style) encoding — the inference half of
  * [[graft.operators.Tokenizer.learnUnigram]]: whitespace-split (the
  * same word boundaries as [[BpeEncode]]/[[WordPieceEncode]]), then
  * Viterbi-best segmentation of each word under the piece
  * log-probabilities ([[graft.operators.Tokenizer.viterbiSegment]] —
  * the SAME routine the trainer's E-step runs, so training statistics
  * and inference segmentations agree by construction). Out-of-
  * vocabulary code points emit `<unk>` at `unkLogProb` one code point
  * at a time. The vocab ships once in the plan closure (like a merge
  * list or a blocklist automaton); evaluation is a pure projection.
  */
case class UnigramEncode(child: Expression,
                         vocab: Seq[(String, Double)],
                         unkLogProb: Double =
                           graft.operators.Tokenizer.UnkLogProb)
    extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.forall(_._1.nonEmpty), "empty piece in vocab")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "duplicate pieces in vocab")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string, got ${child.dataType}")

  @transient private lazy val logProb
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (piece, lp) => m.put(piece, lp) }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    vocab.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    text.split("[ \t\n\u000B\f\r]+", -1).foreach { w =>
      if (w.nonEmpty)
        graft.operators.Tokenizer
          .viterbiSegment(w, logProb, maxPieceLen, unkLogProb)
          .foreach(piece => out += UTF8String.fromString(piece))
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : UnigramEncode = copy(child = c)
  override def prettyName: String = "unigram_encode"
}

/** BYTE-FALLBACK unigram-LM encoding — the inference half of
  * [[graft.operators.Tokenizer.learnByteUnigram]]: pretokenize with
  * the GPT-2 regex (the space travels WITH the following word — the
  * same boundaries as [[ByteBpeEncode]]), map each pretoken's UTF-8
  * bytes through the byte→unicode fallback table, then Viterbi-best
  * segment the byte-symbol string under the piece log-probabilities
  * (the SAME [[graft.operators.Tokenizer.viterbiSegment]] the
  * trainer's E-step runs). Against a [[graft.operators.Tokenizer
  * .learnByteUnigram]] vocabulary (full byte alphabet seeded, never
  * pruned) no input ever emits `<unk>` — emoji, CJK, broken
  * encodings segment into byte pieces — and tokens concatenate back
  * to the byte-mapped text, so [[graft.operators.Tokenizer
  * .decodeByteTokens]] inverts the encoding losslessly (spec-pinned
  * round trip). The vocab ships once in the plan closure; evaluation
  * is a pure projection.
  */
case class ByteUnigramEncode(child: Expression,
                             vocab: Seq[(String, Double)],
                             unkLogProb: Double =
                               graft.operators.Tokenizer.UnkLogProb)
    extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.forall(_._1.nonEmpty), "empty piece in vocab")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "duplicate pieces in vocab")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"byte_unigram_encode requires string, got ${child.dataType}")

  @transient private lazy val logProb
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (piece, lp) => m.put(piece, lp) }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    vocab.iterator.map(p => p._1.codePointCount(0, p._1.length)).max

  @transient private lazy val pretokenizer: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      graft.operators.Tokenizer.Gpt2Pretokenizer)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val m = pretokenizer.matcher(text)
    while (m.find()) {
      val tok = m.group()
      if (tok.nonEmpty) {
        val mapped =
          graft.operators.Tokenizer.byteSymbols(tok).mkString
        graft.operators.Tokenizer
          .viterbiSegment(mapped, logProb, maxPieceLen, unkLogProb)
          .foreach(piece => out += UTF8String.fromString(piece))
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression)
      : ByteUnigramEncode = copy(child = c)
  override def prettyName: String = "byte_unigram_encode"
}

/** Dense matrix × vector product with a driver-built constant matrix
  * — the projection an OPQ rotation ([[graft.operators.Similarity
  * .fitOpqRotation]]) applies in front of PQ assign/encode: out_i =
  * Σ_j R[i][j]·x_j in one tight primitive loop per row (d² multiply-
  * adds — ~4k flops at d = 64, noise next to the scan). Inputs
  * shorter than the matrix width read as zero-padded (the
  * [[PqAssign]] convention); `null` maps to null via the unary
  * null-safety contract. The matrix ships once in the plan closure.
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(matrix.nonEmpty && matrix(0).nonEmpty,
    "mat_vec: empty matrix")
  require(matrix.forall(_.length == matrix(0).length),
    "mat_vec: ragged matrix")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("mat_vec", Seq(child))

  @transient private lazy val getElem = Util.numericGetter(child, "mat_vec")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val d = matrix.length
    val w = matrix(0).length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val row = matrix(i)
      var acc = 0.0
      var j = 0
      val lim = math.min(w, n)
      while (j < lim) { acc += row(j) * getElem(a, j); j += 1 }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MatVec =
    copy(child = c)
  override def prettyName: String = "mat_vec"
}

/** PQ code assignment (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split the (optionally L2-normalized)
  * vector into cb.length subvectors and emit each one's
  * nearest-codeword id — the m-byte compressed representation the
  * ADC scan reads instead of the float vector. Tight primitive loops
  * over ArrayData; the relational spelling (per-subspace
  * zip_with/aggregate argmins) evaluates interpreted lambdas with
  * boxing on every row, which IS the hot path of a corpus encode.
  * Distance ties break to the lowest code id. The codebook is a
  * constructor parameter (driver-built, ~KiB, serialized once per
  * task), not a child expression.
  */
case class PqAssign(child: Expression, cb: Array[Array[Array[Double]]],
                    normalize: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("pq_assign", Seq(child))

  @transient private lazy val getElem = Util.numericGetter(child, "pq_assign")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = cb.length
    val sd = cb(0)(0).length
    val n = a.numElements()
    var inv = 1.0
    if (normalize) {
      var ss = 0.0
      var i = 0
      while (i < n) { val x = getElem(a, i); ss += x * x; i += 1 }
      inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * sd
      val book = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < sd) {
          val x = (if (base + i < n) getElem(a, base + i) * inv else 0.0) -
            cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqAssign =
    copy(child = c)
}

/** Per-query ADC distance table: for each subspace, the squared L2
  * distance from the (normalized) query subvector to every codeword —
  * array<array<double>>, m × nCodes. Built once per query row; the
  * corpus-side scan then pays only m lookups per row ([[PqAdc]]).
  */
case class PqDistTable(child: Expression,
                       cb: Array[Array[Array[Double]]],
                       normalize: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Util.checkNumericArrays("pq_dist_table", Seq(child))

  @transient private lazy val getElem =
    Util.numericGetter(child, "pq_dist_table")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = cb.length
    val sd = cb(0)(0).length
    val n = a.numElements()
    // normalize = false is the RESIDUAL mode (IVF-PQ): residual
    // vectors are differences on the unit sphere, not unit vectors —
    // normalizing them would distort every codeword distance
    val inv = if (!normalize) 1.0
      else {
        var ss = 0.0
        var i = 0
        while (i < n) { val x = getElem(a, i); ss += x * x; i += 1 }
        if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
      }
    val tabs = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * sd
      val book = cb(s)
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < sd) {
          val x = (if (base + j < n) getElem(a, base + j) * inv else 0.0) -
            cent(j)
          d += x * x
          j += 1
        }
        row(c) = d
        c += 1
      }
      tabs(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(tabs)
  }

  override protected def withNewChildInternal(c: Expression): PqDistTable =
    copy(child = c)
}

/** The ADC score itself: sum over subspaces of dtab[s][codes[s]] —
  * the approximate (squared-L2-of-normalized ≈ cosine-rank) distance
  * between a query and a PQ-compressed corpus row. m primitive
  * lookups per row; this expression × corpus size is the whole scan
  * cost of a PQ candidate pass, which is why it's native.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<array<double>>), got ($l, $r)")
    }
  }

  override def nullSafeEval(codesIn: Any, dtabIn: Any): Any = {
    val codes = codesIn.asInstanceOf[ArrayData]
    val dtab = dtabIn.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // mismatched subspace counts = mixed index/codebook geometry; a
    // silent min() would return a plausible-but-wrong distance where
    // every other geometry mismatch in the library refuses loudly
    if (dtab.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: codes have $m subspaces but the distance table has " +
          s"${dtab.numElements()} — mixed PQ index/codebook geometry")
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += dtab.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
}

/** Mutable bounded bottom-k buffer for [[KmvSketchAgg]]: ascending
  * sorted distinct longs, at most k. insert is O(log k) for the
  * common post-warmup case (value above the current kth-min → skip)
  * and one arraycopy when it lands; merge is a two-pointer
  * sorted-merge. Mutability is the point — the typed-Aggregator
  * spelling of this buffer re-allocated the array on every insert
  * and paid the encoder round trip per row.
  */
final class KmvBuffer(val k: Int) {
  private[expressions] var arr = new Array[Long](math.min(k, 16))
  private[expressions] var size = 0

  def insert(h: Long): Unit = {
    if (size == k && h >= arr(size - 1)) return
    val pos = java.util.Arrays.binarySearch(arr, 0, size, h)
    if (pos >= 0) return // already present
    val ins = -pos - 1
    if (size < k) {
      if (size == arr.length)
        arr = java.util.Arrays.copyOf(arr, math.min(k, arr.length * 2))
      System.arraycopy(arr, ins, arr, ins + 1, size - ins)
      arr(ins) = h
      size += 1
    } else {
      // full: the former kth-min falls off the end
      System.arraycopy(arr, ins, arr, ins + 1, size - ins - 1)
      arr(ins) = h
    }
  }

  def mergeWith(o: KmvBuffer): KmvBuffer = {
    if (o.size == 0) return this
    if (size == 0) { arr = o.arr; size = o.size; return this }
    val out = new Array[Long](math.min(size + o.size, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < size || j < o.size)) {
      val takeThis = j >= o.size || (i < size && arr(i) <= o.arr(j))
      val v = if (takeThis) arr(i) else o.arr(j)
      if (takeThis) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    arr = out
    size = n
    this
  }

  def toSortedArray: Array[Long] = java.util.Arrays.copyOf(arr, size)
}

/** Bottom-k (KMV) distinct-sketch aggregate as a native
  * TypedImperativeAggregate: the buffer is a mutable [[KmvBuffer]]
  * object held per group, serialized only at the partial→final
  * exchange (≤ k longs + a length), and each input row costs one
  * `child.eval` + one bounded insert — no per-row encoder round
  * trip, which is what made the typed-Aggregator spelling ~3× the
  * cost of a codegen'd min/max on the same scan. Runs under
  * ObjectHashAggregate with map-side partials: each task reduces its
  * partition to ≤ k longs before anything moves.
  *
  * The child must already be the (flipped) 64-bit hash — hashing and
  * the unsigned→signed order map stay in codegen'd expressions
  * upstream; null children are skipped like COUNT(DISTINCT).
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"k must be >= 2 (got $k)")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren(0))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a bigint hash input, got ${child.dataType}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer =
    b.mergeWith(o)

  override def eval(b: KmvBuffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.toSortedArray)

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new KmvBuffer(k)
    b.arr = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.arr(i) = bb.getLong(); i += 1 }
    b.size = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
}

/** Mutable Misra–Gries frequent-items summary for [[FreqSketchAgg]]:
  * at most `capacity` (item → count) counters plus the summary-level
  * undercount bound `err` (total decrement rounds). Unit-weight MG:
  * a new item arriving at a full summary decrements every counter by
  * one and drops zeros — O(capacity) per round, amortized O(1) per
  * row (each round pays for ≥ capacity prior arrivals). True
  * frequency f(x) satisfies count(x) ≤ f(x) ≤ count(x) + err for
  * stored items, and f(x) ≤ err for absent ones; with
  * capacity ≥ distinct items no round ever fires and every count is
  * EXACT (the driver-gate regime).
  */
final class FreqBuffer(val capacity: Int) {
  private[expressions] val counts =
    new java.util.HashMap[UTF8String, java.lang.Long]()
  private[expressions] var err = 0L

  /** `item` may alias reused row memory (UnsafeRow-backed
    * UTF8String): it is CLONED before being stored as a new key, and
    * only hashed/compared transiently otherwise — so the common
    * repeated-item path allocates nothing. (java.util.HashMap.put on
    * an existing mapping keeps the original stored key.)
    */
  def add(item: UTF8String): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item.clone(), 1L)
    else {
      // MG decrement round: the arrival and one unit of every counter
      // annihilate
      err += 1L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove()
        else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Mergeable-summaries combine (Agarwal et al. 2013): sum counts,
    * then if over capacity subtract the (capacity+1)-th largest
    * count from every counter and drop non-positives — deterministic
    * in the combined CONTENT (ties at the threshold all drop),
    * independent of merge order in the exact regime.
    */
  def mergeWith(o: FreqBuffer): FreqBuffer = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (cur == null) e.getValue else cur + e.getValue)
    }
    err += o.err
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // keep items strictly above the (capacity+1)-th largest
      val t = vals(vals.length - capacity - 1)
      err += t
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= t) ei.remove()
        else e.setValue(e.getValue - t)
      }
    }
    this
  }
}

/** Misra–Gries heavy-hitters aggregate: `freq_sketch(item, capacity)`
  * → struct(items: map<string,bigint> lower-bound counts, err:
  * bigint). The 100 TB shape: a full `GROUP BY item` for "top
  * phrases/n-grams" exchanges every distinct item's partial count —
  * at web scale the distinct-gram set IS the data; this summary
  * bounds every task's state and exchange payload at `capacity`
  * counters, with the classic MG error contract (scaladoc on
  * [[FreqBuffer]]). Map keys are emitted SORTED so the output row is
  * content-deterministic. Null items are skipped.
  */
case class FreqSketchAgg(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[FreqBuffer] {

  require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren(0))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string item, got ${child.dataType}")
  }

  override def createAggregationBuffer(): FreqBuffer =
    new FreqBuffer(capacity)

  override def update(b: FreqBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: FreqBuffer, o: FreqBuffer): FreqBuffer =
    b.mergeWith(o)

  override def eval(b: FreqBuffer): Any = {
    val keys = new Array[UTF8String](b.counts.size)
    b.counts.keySet().toArray(keys)
    // binary UTF-8 order — the same order Spark's and DuckDB's
    // ORDER BY apply to strings
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder())
    val ks = new Array[Any](keys.length)
    val vs = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      ks(i) = keys(i)
      vs(i) = b.counts.get(keys(i)).longValue()
      i += 1
    }
    import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new ArrayBasedMapData(
        new GenericArrayData(ks), new GenericArrayData(vs)), b.err))
  }

  override def serialize(b: FreqBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.writeLong(b.err)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new FreqBuffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      b.counts.put(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    b.err = in.readLong()
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = StructType(Seq(
    StructField("items",
      MapType(StringType, LongType, valueContainsNull = false),
      nullable = false),
    StructField("err", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"
}

/** Mutable element-wise sum buffer for [[VecSumAgg]]: one
  * fixed-length double array per group, allocated on the first
  * non-null row (the aggregate learns the dimension from the data).
  */
final class VecSumBuffer {
  private[expressions] var arr: Array[Double] = null
  private[expressions] var n: Long = 0L

  def add(v: ArrayData, asFloat: Boolean): Unit = {
    val d = v.numElements()
    if (arr == null) arr = new Array[Double](d)
    else require(d == arr.length,
      s"vec_sum: ragged input — got a $d-dim vector into a " +
        s"${arr.length}-dim sum (embedding columns must be " +
        "fixed-dimension; filter or repair upstream)")
    // null ELEMENTS raise as loudly as ragged dims: unsafe rows would
    // silently read a null slot as 0.0 (generic rows would NPE),
    // skewing every centroid downstream — a whole-null vector is
    // skipped by the caller, but a hole inside one is corruption
    var i = 0
    if (asFloat)
      while (i < d) {
        require(!v.isNullAt(i),
          s"vec_sum: null element at position $i of a $d-dim vector " +
            "— embedding vectors must be dense (filter or repair " +
            "upstream)")
        arr(i) += v.getFloat(i); i += 1
      }
    else
      while (i < d) {
        require(!v.isNullAt(i),
          s"vec_sum: null element at position $i of a $d-dim vector " +
            "— embedding vectors must be dense (filter or repair " +
            "upstream)")
        arr(i) += v.getDouble(i); i += 1
      }
    n += 1
  }

  def mergeWith(o: VecSumBuffer): VecSumBuffer = {
    if (o.arr == null) return this
    if (arr == null) { arr = o.arr; n = o.n; return this }
    require(o.arr.length == arr.length,
      s"vec_sum: merging a ${o.arr.length}-dim partial into a " +
        s"${arr.length}-dim sum — ragged embedding column")
    var i = 0
    while (i < arr.length) { arr(i) += o.arr(i); i += 1 }
    n += o.n
    this
  }
}

/** Element-wise vector-sum aggregate as a native
  * TypedImperativeAggregate: sums an `array<float|double>` embedding
  * column into ONE double array per group — the bounded-state
  * primitive behind the embedding-centroid drift monitor
  * ([[graft.operators.Drift]]). Per-group state and exchange payload
  * are `dim` doubles + a count regardless of row volume (map-side
  * partials combine element-wise), where the relational spelling
  * (posexplode + groupBy position) multiplies the shuffle by `dim`
  * and needs a second aggregation to reassemble. Null vectors are
  * skipped (callers count them separately); ragged dimensions raise
  * loudly — a silent dim mismatch would corrupt every centroid
  * downstream. Cosine against a frozen centroid is scale-invariant,
  * so consumers use the SUM directly and never divide by the count.
  */
case class VecSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren(0))

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_sum requires array<float> or array<double>, got $t")
    }
  }

  override def createAggregationBuffer(): VecSumBuffer =
    new VecSumBuffer

  override def update(b: VecSumBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData], isFloat)
    b
  }

  override def merge(b: VecSumBuffer, o: VecSumBuffer): VecSumBuffer =
    b.mergeWith(o)

  // clone: the returned ArrayData must not alias the live buffer
  // (the KmvBuffer.toSortedArray discipline)
  override def eval(b: VecSumBuffer): Any =
    if (b.arr == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.arr.clone())

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val d = if (b.arr == null) 0 else b.arr.length
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * d)
    bb.putInt(d)
    bb.putLong(b.n)
    var i = 0
    while (i < d) { bb.putDouble(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    val b = new VecSumBuffer
    b.n = bb.getLong()
    if (d > 0) {
      b.arr = new Array[Double](d)
      var i = 0
      while (i < d) { b.arr(i) = bb.getDouble(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"
}

/** The hashed-feature bucket array of the classifier family
  * ([[graft.operators.TextAnalysis.featureBuckets]]'s native
  * spelling): per token, bucket = first-8-hex-chars-of-md5 mod dim
  * (the h32 oracle contract — value-identical to
  * `pmod(conv(substring(md5(tok),1,8),16,10), dim)`, replayed digit
  * by digit in DuckDB); with `ngrams = 2`, every adjacent
  * space-joined token PAIR hashes into the same bucket space,
  * appended after the unigrams in document order.
  *
  * One digest per feature straight off the UTF-8 bytes — the Column
  * spelling paid three expression nodes per token (md5 → 32-char hex
  * string, substring, conv's radix parse) plus the interpreted
  * higher-order-function lambda machinery per element; this is the
  * same per-token md5 with none of that. Null tokens yield null
  * elements; a null token array yields null (both as before).
  */
case class HashedBuckets(child: Expression, dim: Int, ngrams: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0, s"hashed_buckets: dim must be > 0, got $dim")
  require(ngrams == 1 || ngrams == 2,
    s"hashed_buckets: ngrams must be 1 or 2, got $ngrams")

  override def dataType: DataType = ArrayType(IntegerType,
    containsNull = true)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_buckets requires array<string>, got $t")
    }

  // first 4 digest bytes as the unsigned 32-bit value conv() parses
  // from the first 8 hex chars, mod dim
  private def bucketOf(md: java.security.MessageDigest): Int = {
    val d = md.digest()
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % dim).toInt
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = SimHashMd5.digests.get()
    val outLen = if (ngrams == 2 && n >= 2) 2 * n - 1 else n
    val out = new Array[Any](outLen)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        out(i) = bucketOf(md)
      }
      i += 1
    }
    if (ngrams == 2 && n >= 2) {
      i = 0
      while (i < n - 1) {
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          md.reset()
          md.update(arr.getUTF8String(i).getBytes)
          md.update(' '.toByte)
          md.update(arr.getUTF8String(i + 1).getBytes)
          out(n + i) = bucketOf(md)
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HashedBuckets =
    copy(child = c)
  override def prettyName: String = "hashed_buckets"
}

/** Σ weights(b) over a bucket array — the trained-scorer dot product
  * (`aggregate(bks, 0L, (acc, b) => acc + element_at(wLit, b + 1))`
  * without the per-element interpreted lambda): exact integer sum,
  * order-free. Null array → null; a null element poisons the sum to
  * null (the fold's semantics); an out-of-range bucket raises (the
  * ANSI element_at contract — unreachable from [[HashedBuckets]],
  * which bounds buckets by construction).
  */
case class BucketDot(child: Expression, weights: Array[Long])
    extends UnaryExpression with CodegenFallback {
  require(weights.nonEmpty, "bucket_dot: empty weight table")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_dot requires array<int>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val b = arr.getInt(i)
      if (b < 0 || b >= weights.length) throw new IllegalArgumentException(
        s"bucket_dot: bucket $b outside the ${weights.length}-entry " +
          "weight table")
      acc += weights(b)
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): BucketDot =
    copy(child = c)
  override def prettyName: String = "bucket_dot"
}

/** Mutable per-group gradient buffer for [[BucketHistAgg]]: one
  * fixed-length long array (the weight table's shape).
  */
final class BucketHistBuffer(val dim: Int) {
  private[expressions] var arr: Array[Long] = null

  def add(bks: ArrayData, c: Long): Unit = {
    if (arr == null) arr = new Array[Long](dim)
    val n = bks.numElements()
    var i = 0
    while (i < n) {
      // null elements are unreachable from HashedBuckets over real
      // tokens; skipping matches explode-then-sum dropping the null
      // bucket row before any weight update reads it
      if (!bks.isNullAt(i)) arr(bks.getInt(i)) += c
      i += 1
    }
  }

  def mergeWith(o: BucketHistBuffer): BucketHistBuffer = {
    if (o.arr == null) return this
    if (arr == null) { arr = o.arr; return this }
    var i = 0
    while (i < dim) { arr(i) += o.arr(i); i += 1 }
    this
  }
}

/** Per-bucket weighted occurrence sums in ONE aggregation pass — the
  * gradient accumulator of [[graft.operators.TextAnalysis
  * .learnHashedLinear]]: grad[b] = Σ_rows c_row · (occurrences of b
  * in the row's bucket array), the exact integer the explode →
  * groupBy(bucket) → sum spelling computes, without materializing
  * one row per feature occurrence or shuffling a per-bucket key —
  * per-partition state and exchange payload are `dim` longs flat
  * (map-side partials merge element-wise). Order-free exact int64
  * sums, so the result is bit-identical under any partitioning.
  * Null bucket arrays and null weights contribute nothing (explode
  * of a null array emits no rows).
  */
case class BucketHistAgg(buckets: Expression, weight: Expression,
    dim: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[BucketHistBuffer] {
  require(dim > 0, s"bucket_hist: dim must be > 0, got $dim")

  override def children: Seq[Expression] = buckets :: weight :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketHistAgg =
    copy(buckets = newChildren(0), weight = newChildren(1))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (buckets.dataType, weight.dataType) match {
      case (ArrayType(IntegerType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (bt, wt) => TypeCheckResult.TypeCheckFailure(
        s"bucket_hist requires (array<int>, bigint), got ($bt, $wt)")
    }
  }

  override def createAggregationBuffer(): BucketHistBuffer =
    new BucketHistBuffer(dim)

  override def update(b: BucketHistBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): BucketHistBuffer = {
    val bks = buckets.eval(input)
    if (bks != null) {
      val c = weight.eval(input)
      if (c != null) b.add(bks.asInstanceOf[ArrayData],
        c.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: BucketHistBuffer,
      o: BucketHistBuffer): BucketHistBuffer = b.mergeWith(o)

  override def eval(b: BucketHistBuffer): Any =
    if (b.arr == null)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Long](dim))
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      b.arr.clone())

  override def serialize(b: BucketHistBuffer): Array[Byte] = {
    val has = b.arr != null
    val bb = java.nio.ByteBuffer.allocate(4 + (if (has) 8 * dim else 0))
    bb.putInt(if (has) dim else 0)
    if (has) { var i = 0; while (i < dim) { bb.putLong(b.arr(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BucketHistBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    val b = new BucketHistBuffer(dim)
    if (d > 0) {
      b.arr = new Array[Long](dim)
      var i = 0
      while (i < d) { b.arr(i) = bb.getLong(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BucketHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BucketHistAgg =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_hist"
}
