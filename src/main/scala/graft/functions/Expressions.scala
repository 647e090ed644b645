package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen for the engine's
  * two hot scalar kernels. Preference order from the build brief: built-in
  * functions first, then a codegen `Expression` where the built-in shape is
  * interpreted — both of these replace higher-order-function pipelines
  * (`aggregate`/`transform` lambdas evaluate interpreted, outside codegen).
  *
  * Cross-engine contract: [[CharPolyHash]] computes exactly
  * `fold(chars, 0, (acc, c) => (acc * 31 + codepoint(c)) % 1000000007)` —
  * the same value as [[graft.llm.XHash.duckCharHash]]'s DuckDB fold and the
  * SQL `aggregate(split(s,''),...)` form (for BMP text; the driver corpus
  * is ASCII). [[LongDot]] is the exact integer dot product of two
  * `array<bigint>` columns, the kernel under every cosine in graft.llm.
  */
object GraftKernels {
  val P: Long = 1000000007L

  // Hyperplane-LSH geometry (shared with graft.llm.XHash, which delegates
  // here so the formula exists exactly once): NPlanes deterministic
  // pseudo-random integer planes over EmbDim dims, Weyl-style, centered
  // on 0 — both engines can embed them as literals.
  val EmbDim = 64
  val NPlanes = 32
  def planeWeight(p: Int, d: Int): Long =
    ((p.toLong * EmbDim + d) * 2654435761L) % 2000003L - 1000001L

  // null elements contribute 0 (defensive — scaled embeddings are
  // non-null by construction; a null coordinate is "no contribution")
  def planeDots(se: ArrayData): ArrayData = {
    val n = math.min(se.numElements(), EmbDim)
    val out = new Array[Long](NPlanes)
    var p = 0
    while (p < NPlanes) {
      var acc = 0L
      var d = 0
      while (d < n) {
        if (!se.isNullAt(d)) acc += se.getLong(d) * planeWeight(p, d)
        d += 1
      }
      out(p) = acc
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def charPolyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Rolling k-codepoint window hashes of `s`: out(i) ==
    * charPolyHash(s.substring-by-codepoints(i, i + k)) for every window
    * start i in [0, n − k], via the standard polynomial roll
    * `h' = ((h − cp_out·31^(k−1)) · 31 + cp_in) mod P`. Empty array when
    * the text has fewer than k codepoints. One O(n) pass per doc vs the
    * O(n·k) re-fold of hashing each window independently — the kernel
    * under [[GramHashes]] / the exact-substring dedup gram stream. */
  def gramHashes(s: String, k: Int): Array[Long] = {
    val cps = new Array[Int](math.max(s.length, 1))
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n < k) return Array.emptyLongArray
    var pow = 1L // 31^(k-1) mod P: the outgoing codepoint's coefficient
    i = 1
    while (i < k) { pow = pow * 31L % P; i += 1 }
    val out = new Array[Long](n - k + 1)
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * 31L + cps(i)) % P; i += 1 }
    out(0) = acc
    i = 1
    while (i <= n - k) {
      acc = (acc - cps(i - 1) * pow % P + P) % P
      acc = (acc * 31L + cps(i + k - 1)) % P
      out(i) = acc
      i += 1
    }
    out
  }

  /** Winnowing fingerprint selection from a WORD-hash array: builds the
    * word-3-gram shingle hashes inline (`((wh(i)·131 + wh(i+1)) % P ·131
    * + wh(i+2)) % P` — the exact [[graft.llm.XHash.sparkShingles]]
    * formula), then for every FULL window of `w` consecutive shingle
    * positions keeps the shingle with the minimum
    * `enc(pos) = h·2^20 + (2^20 − 1 − pos)` (ties break to the RIGHTMOST
    * occurrence — the standard robust-winnowing rule), returning the
    * DISTINCT selected hashes (sorted — consumers treat the result as a
    * set). Bit-identical to the windowed-SQL form it replaces (`min(enc)
    * OVER (rows w−1 preceding)`, `wmin DIV 2^20`, distinct): hashes are
    * in [0, P) so enc stays non-negative and Java `/` equals Spark
    * `DIV`; LlmSpec pins the row-set equality against the retained
    * window form. Empty when the doc has fewer than `w` shingles.
    * Why shingles are built IN-kernel rather than taken as input: the
    * SQL shingle form is a higher-order `transform(...)`, which Spark
    * evaluates INTERPRETED — fed to a generator it is re-evaluated per
    * inferred filter and measured SLOWER (112 s) than the windowed
    * shuffle it replaced (62 s); from the codegen'd word-hash array the
    * whole chain compiles (12 s; family-recall profile, sf1, r12). */
  def winnowFps(wh: ArrayData, w: Int): Array[Long] = {
    val nw = wh.numElements()
    val n = nw - 2 // shingle count
    if (n < w) return Array.emptyLongArray
    val sgs = new Array[Long](n)
    var s = 0
    while (s < n) {
      // null word hashes cannot occur (graft_wordhashes is null-free);
      // getLong on an impossible null would read 0, a valid hash value
      sgs(s) = ((wh.getLong(s) * 131L + wh.getLong(s + 1)) % P * 131L
        + wh.getLong(s + 2)) % P
      s += 1
    }
    val tmp = new Array[Long](n - w + 1)
    var cnt = 0
    var p = w - 1
    while (p < n) {
      var best = Long.MaxValue
      var i = p - w + 1
      while (i <= p) {
        val e = sgs(i) * 1048576L + (1048575L - i)
        if (e < best) best = e
        i += 1
      }
      val fh = best / 1048576L
      if (cnt == 0 || tmp(cnt - 1) != fh) { tmp(cnt) = fh; cnt += 1 }
      p += 1
    }
    java.util.Arrays.sort(tmp, 0, cnt)
    var out = 1
    var j = 1
    while (j < cnt) {
      if (tmp(j) != tmp(out - 1)) { tmp(out) = tmp(j); out += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(tmp, out)
  }

  def longDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** The n nearest centroids of a scaled-long embedding, as one compiled
    * argmin scan over the packed centroid list — the kernel under
    * [[graft.llm.Similarity.assignCells]]. `cells` is
    * `array<struct<cent_id bigint, cse array<bigint>, cn2 bigint>>`
    * (the whole trained centroid table collected into ONE row and
    * broadcast); nearness is the exact integer squared-Euclidean argmin
    * `cn2 − 2·se·cse` with ascending-`cent_id` tie-break — bit-identical
    * to the `row_number() OVER (ORDER BY dscore, cent_id) <= n` shape it
    * replaces, but without materializing a (vector × cell) row per
    * candidate: the join-then-rank form copied both 64-long arrays into
    * every one of the N·k intermediate rows (≈350 M rows at 500 k
    * vectors), which dominated IVF training/assignment cost; this form
    * touches each candidate in-register and emits only the n winners. */
  def nearestCells(se: ArrayData, cells: ArrayData, n: Int): ArrayData = {
    val k = cells.numElements()
    val nn = math.max(0, math.min(n, k))
    val bd = new Array[Long](math.max(nn, 1))
    val bi = new Array[Long](math.max(nn, 1))
    var filled = 0
    val dim = se.numElements()
    var c = 0
    while (c < k) {
      val st = cells.getStruct(c, 3)
      val cid = st.getLong(0)
      val cse = st.getArray(1)
      val cn2 = st.getLong(2)
      var dot = 0L
      val m = math.min(dim, cse.numElements())
      var d = 0
      while (d < m) { dot += se.getLong(d) * cse.getLong(d); d += 1 }
      val dist = cn2 - 2L * dot
      if (nn > 0 && (filled < nn || dist < bd(nn - 1) ||
          (dist == bd(nn - 1) && cid < bi(nn - 1)))) {
        var pos = if (filled < nn) filled else nn - 1
        while (pos > 0 && (bd(pos - 1) > dist ||
            (bd(pos - 1) == dist && bi(pos - 1) > cid))) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bd(pos) = dist; bi(pos) = cid
        if (filled < nn) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, filled))
  }

  // Per-bit affine vote hashes for SimHash (same Weyl family as
  // XHash.A/B, extended to SimBits): bit j's vote is the PARITY of
  // (h·A_j + B_j) mod P. Voting on the raw bits of h was structurally
  // biased — h < P < 2^30, so bits 30/31 are constant-zero and bits
  // 24..29 lean zero, which degenerated the high band into an all-pairs
  // candidate generator (measured: band 3 held the ENTIRE sf0.1 corpus
  // under one key). Affine parity is unbiased for every bit.
  def simA(j: Int): Long = (j * 2654435761L + 1) % P
  def simB(j: Int): Long = (j * 40503L + 17) % P

  /** SimHash geometry — the Manku/Jain/Das Sarma '07 production triple:
    * a 64-bit fingerprint, hamming radius 3, banded as 4 blocks of
    * 16 bits (pigeonhole: ≤3 flipped bits leave ≥1 block intact, so the
    * band equi-join is a complete candidate generator for ham ≤ 3). The
    * original 32-bit / 4×8-bit-band shape was a measured scale bug: an
    * 8-bit key gives only 256 buckets per band, so bucket population
    * grows as N/256 and the band self-join is Θ(N²/1024) BY CONSTRUCTION
    * — at the generated sf1 (500 k docs) it emitted 1.59 BILLION
    * candidate pairs and OOM'd the run. With 16-bit keys the bucket
    * count scales with fingerprint space (65 536/band), holding expected
    * bucket load at N/65 536 — sub-quadratic pair volume until corpus
    * sizes where the corpus-relative stop-bucket cap takes over. */
  val SimBits = 64
  val SimBands = 4
  val SimBandBits: Int = SimBits / SimBands // 16
  val SimBandMask: Long = (1L << SimBandBits) - 1 // 65535

  def simhashFp(wh: ArrayData): Long = {
    val n = wh.numElements()
    val cnt = new Array[Int](SimBits)
    var i = 0
    while (i < n) {
      val h = wh.getLong(i)
      var j = 0
      while (j < SimBits) {
        if (((h * simA(j) + simB(j)) % P & 1L) != 0L) cnt(j) += 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < SimBits) {
      // bit j set iff the +1/-1 vote sum is strictly positive: 2*cnt > n
      if (2 * cnt(j) > n) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** SimHash ([[SimBits]]-bit) over the rolling byte-3-gram hashes of a payload string
    * (ASCII payloads: codepoint == byte — the [[graft.llm.Multimodal]]
    * decodeStub contract), all in one pass: window hash
    * `((b0*131 + b1) % P * 131 + b2) % P` (the shared shingle formula over
    * byte values) feeds the per-bit majority vote directly — no
    * intermediate array is ever materialized. Strings shorter than 3
    * bytes have no 3-grams and fingerprint to 0. */
  def byteSimHash32(s: String): Long = {
    val cnt = new Array[Int](SimBits)
    var n = 0
    var b0 = 0L
    var b1 = 0L
    var seen = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (seen >= 2) {
        val sg = ((b0 * 131L + b1) % P * 131L + cp) % P
        var j = 0
        while (j < SimBits) {
          if (((sg * simA(j) + simB(j)) % P & 1L) != 0L) cnt(j) += 1
          j += 1
        }
        n += 1
      }
      b0 = b1
      b1 = cp
      seen += 1
      i += Character.charCount(cp)
    }
    var fp = 0L
    var j = 0
    while (j < SimBits) {
      if (2 * cnt(j) > n) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** `graft_charhash(str)`: rolling polynomial hash of a string, codegen'd. */
case class CharPolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  // literal inputs fold to constants at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "graft_charhash"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.charPolyHash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $str = $c.toString();
         |long ${ev.value}_acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  ${ev.value}_acc = (${ev.value}_acc * 31L + $cp) % ${GraftKernels.P}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

/** `graft_shingles(wh)` — the UDTF tier (custom `Generator`): one output
  * row per DISTINCT word-3-gram shingle hash of a word-hash array,
  * `sg = ((wh(i)*131 + wh(i+1)) % P * 131 + wh(i+2)) % P` for each window
  * i, deduplicated per input row. Replaces the three-pass interpreted
  * pipeline `explode_outer(array_distinct(transform(sequence(...), ...)))`
  * (one lambda evaluation per element, plus an intermediate array) with a
  * single compiled loop per document — the hottest path in the dedup
  * suite.
  *
  * Two deliberate properties:
  *  - same value set as [[graft.llm.XHash.sparkShingles]] +
  *    `array_distinct` (and DuckDB's `list_distinct(list_transform(...))`
  *    mirror), so swapping it into a pipeline changes no query result;
  *  - NOT an `ExplodeBase`, so `InferFiltersFromGenerate` does not apply —
  *    no inferred `size(...) > 0` filter gets pushed below the projection
  *    to re-inline the word-hash pipeline into the scan (the quadratic
  *    re-evaluation the explode_outer trick was guarding against).
  *
  * Arrays with fewer than 3 elements generate nothing (callers filter
  * `size(wh) >= 3` anyway — both engines agree shingling is undefined
  * there). Null elements cannot occur (word hashes are md5-derived,
  * non-null by construction); windows touching one are skipped
  * defensively. */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(Seq(StructField("sg", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.catalogString}")
  }
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val wh = arr.asInstanceOf[ArrayData]
    val n = wh.numElements()
    if (n < 3) return Nil
    val p = GraftKernels.P
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n - 2)
    var i = 0
    while (i <= n - 3) {
      if (!wh.isNullAt(i) && !wh.isNullAt(i + 1) && !wh.isNullAt(i + 2)) {
        val sg = ((wh.getLong(i) * 131L + wh.getLong(i + 1)) % p * 131L
          + wh.getLong(i + 2)) % p
        if (seen.add(sg)) out += InternalRow(sg)
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Word-hash kernel shared by eval and codegen. Top-level class (not
  * nested in an object) so `addReferenceObj` can name it as a plain Java
  * type in generated code; serializable so the expression ships to
  * executors. Contract: identical values to the SQL form
  * `transform(split(text, ' '), w -> conv(substring(md5(w),1,14),16,10) % P)`
  * — per token, the first 56 bits (14 hex digits = 7 bytes, big-endian)
  * of md5 over the token's UTF-8 bytes, mod P. Split semantics mirror
  * Spark's `split(text, ' ')` exactly (limit -1: trailing empty tokens
  * kept; '' yields ['']). */
final class WordHashKernel extends Serializable {
  @transient private lazy val mdTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): ArrayData = {
    val tokens = s.toString.split(" ", -1)
    val md = mdTL.get()
    val out = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val d = md.digest(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = v % GraftKernels.P // v < 2^56, so already non-negative
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

object WordHashKernel {
  val instance = new WordHashKernel
}

/** `graft_wordhashes(text)`: the word-hash array primitive under every
  * MinHash/SimHash/ngram pipeline, as one compiled pass per document —
  * split on ' ', md5 each token, first 56 bits mod P. Value-identical to
  * the HOF form `transform(split(text,' '), w -> conv(substring(md5(w),
  * 1,14),16,10) % P)` (and the DuckDB mirror), but without the
  * interpreted lambda, the per-token expression-tree evaluation, and the
  * hex-string round-trip — the measured bottleneck of the whole dedup
  * suite's scan stage. */
case class WordHashes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordhashes"

  override protected def nullSafeEval(input: Any): Any =
    WordHashKernel.instance.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ker = ctx.addReferenceObj("wordHashKernel", WordHashKernel.instance,
      classOf[WordHashKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ker.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordHashes =
    copy(child = newChild)
}

/** `graft_scaledemb(embedding)`: float embedding → exact scaled longs
  * (`floor(double(x) * 1e6 + 0.5)`), one compiled pass per row. The
  * float→double widening is exact, so both engines compute identical
  * longs (same contract as the HOF form in XHash.sparkScaledEmb, kept as
  * the oracle mirror/parity model). Null ELEMENTS propagate to null
  * output elements, exactly as `transform` and the DuckDB
  * `list_transform` mirror do — the output's containsNull mirrors the
  * input's, so the common non-null schema keeps the primitive fast path.
  * Feeds every embedding scan (near-dup LSH, all three kNN indexes,
  * k-means training). */
case class ScaledEmb(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${dt.catalogString}")
  }
  private lazy val inType = child.dataType.asInstanceOf[ArrayType]
  private lazy val isFloat = inType.elementType == FloatType
  override def dataType: DataType =
    ArrayType(LongType, containsNull = inType.containsNull)
  override def prettyName: String = "graft_scaledemb"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(d * 1000000.0 + 0.5).toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val get = if (isFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |int $n = $c.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    double $d = $get;
         |    $out[$i] = (long) java.lang.Math.floor($d * 1000000.0 + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ScaledEmb =
    copy(child = newChild)
}

/** `graft_chunks(wh, width)` — Generator (UDTF tier): one output row per
  * non-overlapping `width`-element chunk of a word-hash array, each
  * hashed with the rolling fold `acc = (acc*131 + h) % P` (the CCNet-ish
  * chunk key under q_llm_dedup_chunks). NOT deduplicated — chunk-level
  * dedup counts repeats. `width` must be a foldable positive integer.
  * Replaces the interpreted `transform(sequence(...),
  * aggregate(slice(...)))` pipeline with a single compiled loop per doc;
  * like [[ShingleHashes]], it is not an `ExplodeBase`, so
  * `InferFiltersFromGenerate` cannot re-inline the word-hash pipeline
  * into the scan. A ragged tail chunk hashes its remaining elements,
  * matching `slice`'s truncation. Empty arrays generate nothing; a chunk
  * containing a null element is skipped defensively (word-hash arrays
  * are non-null by construction — same stance as [[ShingleHashes]]).
  *
  * Contract note — the value-identity with the HOF form holds for n >= 1
  * ONLY: for an EMPTY input array this generator emits zero rows, while
  * `transform(sequence(0, (size-1) div 10), ...)` emits one chunk hash 0
  * (`sequence(0, 0)` yields `[0]` when size = 0). Callers today always
  * filter `size(wh) >= 1` first (split() yields at least one token), so
  * the divergence is unreachable — but a future caller without the filter
  * must not assume the two forms agree at n = 0. */
case class ChunkHashes(child: Expression, width: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = width

  override def elementSchema: StructType =
    StructType(Seq(StructField("ch", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (width.foldable && width.dataType == IntegerType &&
          width.eval() != null && width.eval().asInstanceOf[Int] > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable positive INT width")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.catalogString}")
  }
  override def prettyName: String = "graft_chunks"

  private lazy val w: Int = width.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Nil
    val wh = arr.asInstanceOf[ArrayData]
    val n = wh.numElements()
    if (n == 0) return Nil
    val p = GraftKernels.P
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]((n - 1) / w + 1)
    var start = 0
    while (start < n) {
      val end = math.min(start + w, n)
      var acc = 0L
      var ok = true
      var i = start
      while (i < end) {
        if (wh.isNullAt(i)) ok = false
        else acc = (acc * 131L + wh.getLong(i)) % p
        i += 1
      }
      if (ok) out += InternalRow(acc)
      start += w
    }
    out
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChunkHashes =
    copy(child = newLeft, width = newRight)
}

/** `graft_gramhashes(text, k)` — `array<bigint>` of the sliding
  * `k`-codepoint window hashes of `text`: element `i` (0-based) is
  * EXACTLY `graft_charhash(substring(text, i + 1, k))` — the charhash
  * polynomial is degree-fixed per window, so each position's value comes
  * from the standard rolling update
  * `h' = ((h − cp_out·31^(k−1)) · 31 + cp_in) mod P`
  * instead of re-folding k codepoints per position. Windows are in
  * codepoint units, the same unit `length()`/`substring()` count in.
  *
  * This is the exact-substring-dedup gram stream
  * (`graft.llm.Dedup.substringCoverageOf`), consumed as
  * `posexplode(graft_gramhashes(text, k))`: the form it replaces
  * (`explode(sequence(1, n−k+1))` + `graft_charhash(substring(text,p,k))`)
  * materialized an O(n) position array per doc and did O(n·k) hash work
  * (each position re-copies and re-folds a k-char substring); this is a
  * single O(n) compiled pass per doc whose posexplode emits the identical
  * row set, so the swap changes no query result — the DuckDB oracle keeps
  * the substr() form and the hash gate pins equality. Deliberately a
  * SCALAR expression + builtin posexplode rather than a custom Generator:
  * a `CodegenFallback` Generator (the [[ShingleHashes]] shape) evaluates
  * interpreted and severs whole-stage codegen right at the widest point
  * of the plan — measured 1.8× SLOWER than the explode form it was meant
  * to beat at generated sf1 — while posexplode over a codegen'd array
  * keeps the whole gram stage inside WholeStageCodegen. Texts shorter
  * than k yield an empty array (posexplode then generates nothing,
  * matching the oracle's `WHERE n >= k` gate). */
case class GramHashes(child: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = width

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (width.foldable && width.dataType == IntegerType &&
          width.eval() != null && width.eval().asInstanceOf[Int] > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable positive INT width")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${dt.catalogString}")
  }
  override def prettyName: String = "graft_gramhashes"

  private lazy val k: Int = width.eval().asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, w: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(GraftKernels.gramHashes(
        text.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) =>
      // one static kernel call: the loop is JIT-compiled Scala, the
      // expression stays inside whole-stage codegen
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.GraftKernels.gramHashes($c.toString(), $k));
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(child = newLeft, width = newRight)
}

/** `graft_winnowfps(wh, w)` — distinct winnowing fingerprints of a
  * WORD-hash array (see [[GraftKernels.winnowFps]] for the exact
  * selection rule, the in-kernel shingle construction, and the
  * equivalence argument vs the windowed-SQL
  * form). Deliberately a SCALAR codegen expression returning an array
  * (consumed as `explode(graft_winnowfps(...))`), not a custom
  * Generator: a `CodegenFallback` Generator severs whole-stage codegen
  * at the widest plan point (the measured 1.8× trap — see
  * [[GramHashes]]), while this stays inside the scan projection and the
  * builtin explode handles the fan-out. The selection SHRINKS the
  * stream (~2/(w+1) of positions, then per-doc distinct), which is what
  * makes winnowing the index you can afford at 100 TB. */
case class WinnowFps(child: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = width

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (width.foldable && width.dataType == IntegerType &&
          width.eval() != null && width.eval().asInstanceOf[Int] > 0)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable positive INT window width")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.catalogString}")
  }
  override def prettyName: String = "graft_winnowfps"

  private lazy val w: Int = width.eval().asInstanceOf[Int]

  override protected def nullSafeEval(sgs: Any, wd: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(GraftKernels.winnowFps(
        sgs.asInstanceOf[ArrayData], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.GraftKernels.winnowFps($c, $w));
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowFps =
    copy(child = newLeft, width = newRight)
}

/** `graft_simhash(array<bigint>)`: [[GraftKernels.SimBits]]-bit SimHash
  * fingerprint of a word-hash array — per-bit majority vote (`bit j set
  * iff sum over words of ±1(parity(h·A_j+B_j)) > 0`), one compiled pass
  * per document.
  *
  * Replaces the relational form (explode every word, SimBits
  * sum-aggregations, shuffle of SimBits columns per doc): the vote is a
  * per-document fold, so a
  * scalar expression computes it where the word-hash array is already in
  * hand — zero row explosion, zero aggregation shuffle. The DuckDB oracle
  * keeps the unnest+sum form; both compute the same majority, so results
  * stay hash-identical (asserted in spec and by the oracle gate). */
case class SimHash32(child: Expression) extends UnaryExpression {
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.simhashFp(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val bits = GraftKernels.SimBits
      val aLits = (0 until bits).map(GraftKernels.simA(_).toString + "L").mkString(", ")
      val bLits = (0 until bits).map(GraftKernels.simB(_).toString + "L").mkString(", ")
      s"""
         |int $n = $c.numElements();
         |int[] $cnt = new int[$bits];
         |long[] $sa = new long[]{$aLits};
         |long[] $sb = new long[]{$bLits};
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h * $sa[$j] + $sb[$j]) % ${GraftKernels.P}L & 1L) != 0L) $cnt[$j]++;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if (2 * $cnt[$j] > $n) $fp |= 1L << $j;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `graft_bytesimhash(str)`: perceptual media fingerprint — SimHash
  * ([[GraftKernels.SimBits]]-bit) over the payload's rolling byte-3-gram
  * hashes, one compiled pass per
  * row ([[GraftKernels.byteSimHash32]]). The content-level complement to
  * `q_llm_media_dedup`'s exact md5: small byte perturbations (re-encode
  * headers, trims, single-field edits) leave most 3-grams — and so most
  * fingerprint bits — intact, which banded matching then catches. The
  * DuckDB oracle reproduces it relationally (byte array → shingle unnest →
  * SimBits majority sums); a HOF composition of the same pieces
  * (`graft_simhash` over the shingle-transform of the ascii array) is the
  * in-Spark parity model (spec-asserted). */
case class ByteSimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "graft_bytesimhash"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.byteSimHash32(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val b0 = ctx.freshName("b0")
      val b1 = ctx.freshName("b1")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val sg = ctx.freshName("sg")
      val j = ctx.freshName("j")
      val fp = ctx.freshName("fp")
      s"""
         |String $str = $c.toString();
         |int[] $cnt = new int[${GraftKernels.SimBits}];
         |long[] ${sg}_a = new long[]{${(0 until GraftKernels.SimBits)
            .map(GraftKernels.simA(_).toString + "L").mkString(", ")}};
         |long[] ${sg}_b = new long[]{${(0 until GraftKernels.SimBits)
            .map(GraftKernels.simB(_).toString + "L").mkString(", ")}};
         |int $n = 0;
         |long $b0 = 0L, $b1 = 0L;
         |int $seen = 0;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  if ($seen >= 2) {
         |    long $sg = (($b0 * 131L + $b1) % ${GraftKernels.P}L * 131L + $cp)
         |      % ${GraftKernels.P}L;
         |    for (int $j = 0; $j < ${GraftKernels.SimBits}; $j++) {
         |      if ((($sg * ${sg}_a[$j] + ${sg}_b[$j]) % ${GraftKernels.P}L & 1L) != 0L) $cnt[$j]++;
         |    }
         |    $n++;
         |  }
         |  $b0 = $b1;
         |  $b1 = (long) $cp;
         |  $seen++;
         |  $i += Character.charCount($cp);
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < ${GraftKernels.SimBits}; $j++) {
         |  if (2 * $cnt[$j] > $n) $fp |= 1L << $j;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSimHash32 =
    copy(child = newChild)
}

/** `graft_planedots(se)`: all [[GraftKernels.NPlanes]] hyperplane dot
  * products of a scaled-long embedding in one compiled pass per row —
  * `dots[p] = Σ_d se[d] · w(p,d)` with the Weyl-formula weights computed
  * inline (no plane table exists at all).
  *
  * Replaces the matrix-multiply-by-join shape (posexplode each vector to
  * 64 rows, join a broadcast 2048-row plane table, two aggregations) that
  * q_llm_dedup_embed used: that shape existed because a 32×64-term
  * unrolled PROJECTION overflows the 64 KB codegen method limit — a
  * compiled loop has no such limit and removes the explode and both
  * aggregation shuffles. Exact long arithmetic; the DuckDB oracle keeps
  * its unrolled literal-weight sums (integer addition is associative, so
  * fold shape is irrelevant). */
case class PlaneDots(child: Expression) extends UnaryExpression {
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_planedots"

  override protected def nullSafeEval(input: Any): Any =
    GraftKernels.planeDots(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), ${GraftKernels.EmbDim});
         |long[] $out = new long[${GraftKernels.NPlanes}];
         |for (int $p = 0; $p < ${GraftKernels.NPlanes}; $p++) {
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$c.isNullAt($d)) {
         |      long $w = (($p * ${GraftKernels.EmbDim}L + $d) * 2654435761L) % 2000003L - 1000001L;
         |      $acc += $c.getLong($d) * $w;
         |    }
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}

/** `graft_dot(array<bigint>, array<bigint>)`: exact integer dot product. */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def foldable: Boolean = left.foldable && right.foldable
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftKernels.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** `graft_nearest_cells(se, cells, n)`: the ids of the `n` nearest
  * trained centroids for one embedding — the coarse-quantizer assignment
  * kernel (see [[GraftKernels.nearestCells]] for the exact argmin
  * contract). Evaluated per corpus row against the ONE-row packed
  * centroid broadcast, so assignment is a single whole-stage-codegen
  * projection instead of an N·k-row join + window rank. */
case class NearestCells(se: Expression, cells: Expression, n: Expression)
    extends TernaryExpression {
  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def first: Expression = se
  override def second: Expression = cells
  override def third: Expression = n
  override def checkInputDataTypes(): TypeCheckResult = {
    val cellsOk = cells.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && isLongArray(fs(1).dataType) &&
          fs(2).dataType == LongType
      case _ => false
    }
    if (isLongArray(se.dataType) && cellsOk && n.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<STRUCT<BIGINT, " +
        s"ARRAY<BIGINT>, BIGINT>>, INT), got ${se.dataType.catalogString}, " +
        s"${cells.dataType.catalogString}, ${n.dataType.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override protected def nullSafeEval(seV: Any, cellsV: Any, nV: Any): Any =
    GraftKernels.nearestCells(seV.asInstanceOf[ArrayData],
      cellsV.asInstanceOf[ArrayData], nV.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.GraftKernels.nearestCells($a, $b, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCells =
    copy(se = newFirst, cells = newSecond, n = newThird)
}

/** `graft_wordcount(s)` — fused single-space token count, the codegen
  * replacement [[FuseWordCount]] swaps in for `size(split(s, ' '))`.
  * Exact semantics proof: `split(s, ' ', -1)` (regex " ", keep trailing
  * empties) yields exactly `count(' ' in s) + 1` segments for EVERY
  * string — leading/trailing/consecutive spaces produce empty segments
  * that size() counts, and the empty string yields [""] = 1. So the
  * array never needs to exist: one byte scan over the UTF8String (0x20
  * bytes in UTF-8 are always the space character — multi-byte sequences
  * use bytes >= 0x80) replaces regex split + array allocation + size. */
case class WordCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "graft_wordcount"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var (i, n) = (0, 1)
    while (i < b.length) { if (b(i) == ' '.toByte) n += 1; i += 1 }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |int ${ev.value}_n = 1;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  if ($b[$i] == (byte) 0x20) ${ev.value}_n++;
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordCount =
    copy(child = newChild)
}
