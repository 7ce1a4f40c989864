package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the string-side text ops. Same rationale as
  * [[VecKernel]]: the declarative `transform`/`filter` higher-order forms
  * evaluate interpreted with boxed lambdas; these loops produce value-
  * identical results (locked by the DuckDB oracles) inside whole-stage
  * codegen.
  */
object TextKernel {
  private val Space = UTF8String.fromString(" ")

  /** k-token shingle strings: shingle i = tokens[i..i+k-1] joined with " ";
    * fewer than k tokens → one shingle of the whole list (the declarative
    * `otherwise` branch of [[graft.ops.Dedup.shingles]]).
    */
  def shingleStrings(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n >= k) {
      val m = n - k + 1
      val out = new Array[UTF8String](m)
      val parts = new Array[UTF8String](k)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(j); j += 1 }
      new GenericArrayData(Array(UTF8String.concatWs(Space, parts: _*)))
    }
  }

  /** `trim(regexp_replace(lower(text), "\s+", " "))` in one byte scan:
    * lowercase (UTF8String.toLowerCase — same as Spark's `lower`), collapse
    * every ASCII-whitespace run (Java regex `\s` = space \t \n \x0B \f \r;
    * safe on UTF-8 bytes — multi-byte code points never contain ASCII
    * values) to one space, drop the leading/trailing collapsed space.
    */
  def normalizeWsLower(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val out = new Array[Byte](bytes.length)
    var len = 0
    var inWs = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      if (isWs) inWs = true
      else {
        if (inWs && len > 0) { out(len) = ' '; len += 1 }
        inWs = false
        out(len) = b
        len += 1
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, len))
  }

  /** per-lexicon token-occurrence counts in one pass (the declarative form
    * is one interpreted `filter(toks, isInCollection(lex))` per lexicon).
    * The lookup map sends a word to every lexicon containing it, so shared
    * words ("de", "la") vote for each — identical to independent filters.
    */
  def lexiconCounts(toks: ArrayData,
      lookup: java.util.HashMap[UTF8String, Array[Int]],
      nLex: Int): ArrayData = {
    val counts = new Array[Int](nLex)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val hit = lookup.get(toks.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** true iff `s` starts with any non-null prefix (robots.txt disallow
    * check; the `exists(prefixes, startswith)` form evaluates interpreted).
    */
  def startsWithAny(s: UTF8String, prefixes: ArrayData): Boolean = {
    val n = prefixes.numElements()
    var i = 0
    while (i < n) {
      if (!prefixes.isNullAt(i) && s.startsWith(prefixes.getUTF8String(i)))
        return true
      i += 1
    }
    false
  }

  /** [[graft.ops.TextOps.portableHash]] of one token, bit-identical to the
    * declarative `ascii(substr(tok||"xx",k,1))` arithmetic: Spark-4 `ascii`
    * is the full Unicode CODEPOINT of the first character (é → 233,
    * 中 → 20013; int 0 when the position is past the padded end), `substr`
    * is character-indexed, and the combination runs in INT arithmetic before
    * the long cast, so even the (theoretical) 271k-char-token overflow wraps
    * the same way.
    */
  def portableTokenHash(tok: UTF8String): Long = {
    val numChars = tok.numChars()
    var c0 = 0; var c1 = 0; var c2 = 0
    var off = 0
    var idx = 0
    while (idx < 3) {
      val c =
        if (idx < numChars) {
          val cp = tok.codePointFrom(off)
          off += UTF8String.numBytesForFirstByte(tok.getByte(off))
          cp
        } else if (idx < numChars + 2) 'x'.toInt // the "xx" padding
        else 0 // substr past the padded end → "" → ascii 0
      if (idx == 0) c0 = c else if (idx == 1) c1 = c else c2 = c
      idx += 1
    }
    (c0 * 961 + c1 * 31 + c2 + numChars * 7919).toLong
  }

  /** Rolling polynomial fingerprint over per-token portable hashes in ONE
    * pass: Σ_i pmod(h_i · w_{i mod |w|}, p), folded mod p ascending — the
    * exact arithmetic of the declarative
    * `pmod(aggregate(zip_with(transform(toks, portableHash), sequence(0,
    * n-1), (h,i) => pmod(h·w[i%8], p)), 0L, (acc,x) => pmod(acc+x, p)), p)`
    * it replaces (three interpreted HOF passes per row), so the DuckDB
    * oracle values are unchanged.
    */
  def rollingFp(toks: ArrayData, weights: Array[Long], p: Long): Long = {
    var acc = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = portableTokenHash(toks.getUTF8String(i))
      val v = java.lang.Math.floorMod(h * weights(i % weights.length), p)
      acc = java.lang.Math.floorMod(acc + v, p)
      i += 1
    }
    acc // already in [0, p) — the declarative trailing pmod is a no-op
  }

  /** One left-to-right non-overlapping BPE merge pass: every adjacent
    * (l, r) collapses to `merged`; the scan resumes AFTER the merged
    * symbol, so "a a a" under (a, a) → "aa a", exactly the reference BPE
    * behavior. Single pass, no regex, no per-element array copies.
    */
  def mergePair(syms: ArrayData, l: UTF8String, r: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (i + 1 < n && s.equals(l) && syms.getUTF8String(i + 1).equals(r)) {
        out += merged
        i += 2
      } else {
        out += s
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Hashed-bag-of-words linear score in ONE pass:
    * bias + Σ_token weights(portableHash(token) mod dim). All-integer
    * (tick) arithmetic — order-independent, engine-exact.
    */
  def linearScoreTicks(toks: ArrayData, weights: Array[Long], bias: Long): Long = {
    val dim = weights.length
    var acc = bias
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = portableTokenHash(toks.getUTF8String(i))
      acc += weights(java.lang.Math.floorMod(h, dim.toLong).toInt)
      i += 1
    }
    acc
  }

  def buildLookup(lexicons: Seq[Seq[String]]): java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    lexicons.zipWithIndex.foreach { case (lex, i) =>
      lex.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }
}

/** `array<string>` tokens → `array<string>` k-shingles. */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernel.shingleStrings(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.shingleStrings($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
  override def prettyName: String = "shingle_strings"
}

/** lowercase + whitespace-collapse + trim in one scan. */
case class NormalizeWsLower(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernel.normalizeWsLower(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.normalizeWsLower($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWsLower =
    copy(child = newChild)
  override def prettyName: String = "normalize_ws_lower"
}

/** `array<string>` tokens → `array<int>` per-lexicon occurrence counts. */
case class LexiconCounts(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val lookup = TextKernel.buildLookup(lexicons)

  override def nullSafeEval(v: Any): Any =
    TextKernel.lexiconCounts(v.asInstanceOf[ArrayData], lookup, lexicons.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // RAW type only: addReferenceObj emits this string as a Java cast, and
    // Janino's generics support is partial — a parameterized type here can
    // fail codegen compile and silently drop the whole span to interpreted
    // mode. The kernel signature provides the type safety.
    val lookupRef = ctx.addReferenceObj("lexLookup", lookup, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel.lexiconCounts($c, $lookupRef, ${lexicons.length})")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconCounts =
    copy(child = newChild)
  override def prettyName: String = "lexicon_counts"
}

/** `array<string>` tokens → hashed linear classifier score in ticks. */
case class LinearScoreTicks(child: Expression, weights: Array[Long], bias: Long)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernel.linearScoreTicks(v.asInstanceOf[ArrayData], weights, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("linearWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel.linearScoreTicks($c, $wRef, ${bias}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearScoreTicks =
    copy(child = newChild)
  override def prettyName: String = "linear_score_ticks"
}

/** `array<string>` tokens → rolling polynomial fingerprint (long). */
case class RollingFp(child: Expression, weights: Array[Long], p: Long)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernel.rollingFp(v.asInstanceOf[ArrayData], weights, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("rollingFpWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel.rollingFp($c, $wRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
  override def prettyName: String = "rolling_fp"
}

/** `array<string>` symbols → symbols with every non-overlapping (l, r)
  * adjacency merged left-to-right into one symbol — one BPE merge step
  * (Sennrich, Haddow & Birch 2016: greedy leftmost, a merged symbol can
  * immediately pair again with the NEXT input symbol but never re-splits).
  */
case class MergePair(child: Expression, l: String, r: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)
  @transient private lazy val mU = UTF8String.fromString(l + r)

  override def nullSafeEval(v: Any): Any =
    TextKernel.mergePair(v.asInstanceOf[ArrayData], lU, rU, mU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "org.apache.spark.unsafe.types.UTF8String"
    val lRef = ctx.addReferenceObj("bpeL", lU, t)
    val rRef = ctx.addReferenceObj("bpeR", rU, t)
    val mRef = ctx.addReferenceObj("bpeM", mU, t)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel.mergePair($c, $lRef, $rRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
  override def prettyName: String = "bpe_merge_pair"
}

/** (string, array<string>) → starts-with-any (boolean). */
case class StartsWithAny(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any, prefixes: Any): Any =
    TextKernel.startsWithAny(s.asInstanceOf[UTF8String],
      prefixes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p) =>
      s"graft.functions.TextKernel.startsWithAny($s, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StartsWithAny =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "starts_with_any"
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def shingleStrings(toks: Column, k: Int): Column =
    ColumnBridge.column(ShingleStrings(ColumnBridge.expression(toks), k))

  def normalizeWsLower(text: Column): Column =
    ColumnBridge.column(NormalizeWsLower(ColumnBridge.expression(text)))

  def lexiconCounts(toks: Column, lexicons: Seq[Seq[String]]): Column =
    ColumnBridge.column(LexiconCounts(ColumnBridge.expression(toks), lexicons))

  def startsWithAny(s: Column, prefixes: Column): Column =
    ColumnBridge.column(StartsWithAny(
      ColumnBridge.expression(s), ColumnBridge.expression(prefixes)))

  def rollingFp(toks: Column, weights: Array[Long], p: Long): Column =
    ColumnBridge.column(RollingFp(ColumnBridge.expression(toks), weights, p))

  def mergePair(syms: Column, l: String, r: String): Column =
    ColumnBridge.column(MergePair(ColumnBridge.expression(syms), l, r))

  def linearScoreTicks(toks: Column, weights: Array[Long], bias: Long): Column =
    ColumnBridge.column(LinearScoreTicks(ColumnBridge.expression(toks), weights, bias))
}
