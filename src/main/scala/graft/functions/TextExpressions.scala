package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word-shingling: distinct (first-occurrence order) word
  * n-grams of a string in one pass. The higher-order-function
  * formulation (`transform(sequence(...), i => array_join(slice(...)))`
  * + `array_distinct`) builds the same result interpreted — one boxed
  * lambda call per gram plus an O(n·width) slice copy each, and it
  * forces the row out of WholeStageCodegen. This expression stays in
  * the codegen pipeline and calls one tight JIT-compiled kernel per
  * row (tokenize, slide a window, dedup via an insertion-ordered set).
  *
  * Shingling feeds every n-gram operator on the corpus hot path
  * (decontamination probes, Jaccard/MinHash pipelines), where per-row
  * cost multiplies by 10⁹ documents — kernel-versus-interpreted is the
  * difference that shows at 100 TB.
  *
  * Token definition matches `TextAnalysis.tokens` (split on `\s+`,
  * drop empties): the whitespace class below is exactly Java regex
  * `\s`, so results are interchangeable with the HOF path and with
  * `string_split_regex(text, '\s+')` oracles.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  // the companion's static forwarder keeps the kernel reachable from
  // generated Java; the row never leaves WholeStageCodegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  // Java regex \s — NOT Character.isWhitespace, which adds Unicode
  // space classes and would diverge from the `\s+`-split oracles
  private[functions] def isWhitespace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One-pass kernel: tokenize, slide an `n` window, first-occurrence
    * dedup. Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWhitespace(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd word n-gram enumeration WITHOUT dedup: every sliding
  * n-gram of the string, in order, duplicates preserved. The counting
  * counterpart to [[WordShingles]] (which dedups for set-semantics
  * consumers like Jaccard/MinHash): frequency-oriented consumers —
  * heavy-hitter sketches, n-gram language models — need the
  * multiplicities, so dedup here would be a correctness bug, not an
  * optimization. Same tokenizer, same codegen discipline. */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "gram width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_grams expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  /** One-pass kernel: tokenize, emit every sliding n-gram. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && WordShingles.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !WordShingles.isWhitespace(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd token-membership counter: how many whitespace tokens of
  * the input are members of a fixed word set. Replaces the
  * `size(filter(toks, t => array_contains(lit(words), t)))` HOF chain
  * — which runs interpreted, boxes every token, and linear-scans the
  * word list per token — with one JIT pass and an O(1) hash probe per
  * token. Quality scoring and language ID call this once per stopword
  * list per row, on every document of the corpus: it is the text
  * tier's hottest scalar loop. The word set rides along as a codegen
  * reference object (`ctx.addReferenceObj`), not inlined source, so
  * arbitrarily large lexica compile to the same kernel. */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty, "word set must not be empty")

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(s.add)
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_set_hits expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenSetHits.compute(input.asInstanceOf[UTF8String], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetHits.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

object TokenSetHits {
  /** One-pass kernel: walk tokens, O(1) set probe each. */
  def compute(text: UTF8String, words: java.util.HashSet[String]): Int = {
    val s = text.toString
    var hits = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && WordShingles.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !WordShingles.isWhitespace(s.charAt(i))) i += 1
      if (i > start && words.contains(s.substring(start, i))) hits += 1
    }
    hits
  }
}

/** Codegen'd repetition statistics: total, distinct, and max-frequency
  * counts of the word n-grams of a string, in one pass. The pure-SQL
  * alternative (sort the gram array per row, fold with `aggregate` to
  * count runs) sorts and walks the array interpreted — measured ~7 s at
  * sf0.1 where this kernel's open-addressed counting pass is the usual
  * kernel-vs-interpreted order faster. Returns
  * struct(n_grams, n_distinct, top_count), all BIGINT; fewer than `n`
  * tokens yields (0, 0, 0). */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "gram width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_stats expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = GramStats.schema

  override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramStats.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  /** One-pass kernel: tokenize, count each sliding n-gram in a hash
    * map, track the max. No sort, no per-gram lambda. */
  def compute(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && WordShingles.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !WordShingles.isWhitespace(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](m * 2)
    val sb = new java.lang.StringBuilder()
    var top = 0
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.toLong, counts.size.toLong, top.toLong))
  }
}

/** Codegen'd per-document character-entropy kernel: one pass over the
  * string's code points → struct(n_chars, n_distinct, micro_entropy).
  * Shannon entropy over the doc's own character distribution is the
  * classic cheap gibberish/binary-spill detector (natural text sits in
  * a narrow band; base64 blobs and key-mash score high, repeated-char
  * spam scores near 0).
  *
  * Determinism contract (the q55 convention): each character's
  * information content −log₂(c/n) is quantized ONCE to BIGINT
  * micro-bits, then the per-doc average is an integer sum and floor
  * division — the sum is order-free (associative), so HashMap
  * iteration order can't leak into the result and any engine with
  * log2 replays it bit-for-bit.
  *
  * Map-side only, no shuffle: at 100 TB this fuses into the scan that
  * feeds it, unlike the relational explode-chars → two-level-aggregate
  * formulation (which shuffles the full character stream). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = CharEntropy.schema

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("micro_entropy", LongType, nullable = false)))

  /** One-pass kernel: count code points in a hash map, then fold the
    * integer micro-bit contributions. Positive-domain Math.round
    * (floor(x+½)) coincides with round-half-away used by SQL engines. */
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, java.lang.Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      counts.merge(cp, 1L, java.lang.Long.sum(_, _))
      n += 1
    }
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      val microBits = Math.round(
        -(Math.log(c.toDouble / n) / Math.log(2.0)) * 1e6)
      acc += c * microBits
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, acc / n))
  }
}

/** Codegen'd text normalization kernel: per code point, (1) Unicode
  * lowercase, (2) fullwidth→ASCII shift (U+FF01–FF5E minus 0xFEE0,
  * ideographic space U+3000 → space), (3) an EXPLICIT fold table —
  * curated Latin-1 + Latin-Extended-A accent strips (à→a … ž→z) and
  * the multi-char ligature/sharp folds (ß→ss, æ→ae, œ→oe, ﬁ→fi,
  * ﬂ→fl, þ→th) — else the code point passes through unchanged.
  *
  * The fold table IS the contract (engine-parity character map): the
  * DuckDB oracle replays the identical map as lower() + a replace
  * chain + translate(), so cross-engine agreement is by construction,
  * not by hoping two Unicode libraries agree on full NFKC. Production
  * corpora wanting full NFKC/ICU folding swap the kernel body behind
  * the same Expression seam. Map-side only — fuses into the scan that
  * feeds langid/quality/shingling, which all assume folded text for
  * non-ASCII corpora. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** (source-chars, replacement) — every source char folds to the same
    * replacement string. Lowercase sources only: the kernel lowercases
    * BEFORE the lookup, so uppercase variants fold through their
    * lowercase form. Kept in one literal so the oracle's translate/
    * replace arguments can be read off line by line. */
  private val foldPairs: Seq[(String, String)] = Seq(
    "àáâãäå" -> "a", "èéêë" -> "e", "ìíîï" -> "i", "òóôõöø" -> "o",
    "ùúûü" -> "u", "ç" -> "c", "ñ" -> "n", "ýÿ" -> "y", "ð" -> "d",
    "āăą" -> "a", "ćĉċč" -> "c", "ďđ" -> "d", "ēĕėęě" -> "e",
    "ĝğġģ" -> "g", "ĥħ" -> "h", "ĩīĭįı" -> "i", "ĵ" -> "j", "ķ" -> "k",
    "ĺļľł" -> "l", "ńņň" -> "n", "ōŏő" -> "o", "ŕŗř" -> "r",
    "śŝşš" -> "s", "ţťŧ" -> "t", "ũūŭůűų" -> "u", "ŵ" -> "w",
    "ŷ" -> "y", "źżž" -> "z",
    "ß" -> "ss", "æ" -> "ae", "œ" -> "oe", "ﬁ" -> "fi", "ﬂ" -> "fl",
    "þ" -> "th")

  private val foldMap: java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String]()
    foldPairs.foreach { case (srcs, rep) =>
      srcs.foreach(ch => m.put(ch.toInt, rep))
    }
    m
  }

  def fold(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var cp = Character.toLowerCase(s.codePointAt(i))
      i += Character.charCount(cp)
      if (cp == 0x3000) cp = 0x20                       // ideographic space
      else if (cp >= 0xFF01 && cp <= 0xFF5E) cp -= 0xFEE0 // fullwidth ASCII
      val rep = foldMap.get(cp)
      if (rep ne null) sb.append(rep) else sb.appendCodePoint(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd character k-gram SET: every k-char sliding window of the
  * string, first-occurrence dedup — the payload-axis counterpart of
  * [[WordShingles]] for byte-stream/clip detection, where "tokens" do
  * not exist and the window slides per character. A string shorter
  * than k (including empty) yields exactly one gram, the whole
  * string — matching `substring(text, i, k)` enumeration with
  * `i ∈ [1, greatest(len-k+1, 1)]`, the relational form any SQL
  * oracle replays.
  *
  * Map-side kernel, no per-row HOF interpretation: the clip sketch
  * multiplies by corpus size, where kernel-versus-interpreted is the
  * 100 TB difference (the [[WordShingles]] rationale on the char
  * axis). */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "char shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_shingles expects a string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  /** One-pass kernel: slide a k-char window, first-occurrence dedup.
    * Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val s = text.toString
    val m = s.length - k + 1
    if (m <= 0)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < m) { seen.add(s.substring(i, i + k)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** Column API for the codegen'd shingler: distinct word n-grams of a
    * string column, first-occurrence order. */
  def word_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Column API for the codegen'd char k-gram set: every sliding
    * k-char window of a string column, first-occurrence order. */
  def char_shingles(text: Column, k: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), k))

  /** Column API for the codegen'd non-dedup gram enumerator: every
    * sliding word n-gram of a string column, multiplicities kept. */
  def word_grams(text: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(text), n))

  /** Column API for the codegen'd repetition counter:
    * struct(n_grams, n_distinct, top_count) of the word n-grams. */
  def gram_stats(text: Column, n: Int): Column =
    ColumnBridge.column(GramStats(ColumnBridge.expression(text), n))

  /** Column API for the codegen'd token-membership counter: number of
    * whitespace tokens of `text` that are members of `words`. */
  def token_set_hits(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetHits(ColumnBridge.expression(text), words))

  /** Column API for the codegen'd character-entropy kernel:
    * struct(n_chars, n_distinct, micro_entropy). */
  def char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  /** Column API for the codegen'd normalization kernel: lowercase +
    * fullwidth shift + explicit accent/ligature fold (see
    * [[NormalizeText]] for the parity contract). */
  def normalize_text(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
