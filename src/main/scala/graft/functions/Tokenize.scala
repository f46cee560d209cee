package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic GREEDY LONGEST-MATCH tokenizer vocabulary — the
  * broadcast-side state of [[TokenCounts]] / [[TokenIds]]. Training
  * pipelines meter documents in TOKENS, not characters (packing windows,
  * mixture budgets, per-source caps are all token-denominated), and the
  * simplest deterministic tokenizer whose semantics both engines can
  * replay exactly is greedy longest-match against a fixed vocabulary:
  * at each position take the LONGEST vocabulary entry that matches;
  * when none does, emit one single-character UNKNOWN token (the
  * byte-fallback of byte-level BPE, at character granularity so the
  * walk is expressible over SQL `substring`).
  *
  * Character-consistent by construction: matching compares UTF-8 BYTES
  * (token boundaries of valid UTF-8 are character boundaries, so byte
  * equality IS character equality), and the unknown fallback advances
  * one full UTF-8 CHARACTER — never splitting a code point — which keeps
  * the walk identical to a character-indexed replay (`substring(text,
  * pos, len)` in DuckDB, `String` slicing in the spec's driver-side
  * replay).
  *
  * The per-length hash tables are rebuilt lazily per JVM (the object
  * ships serialized inside the plan like any broadcast literal); lookup
  * cost per position is one hash probe per DISTINCT token length,
  * longest first — O(#lengths), independent of vocabulary size.
  */
final class TokenVocab(val tokens: Array[String]) extends Serializable {
  require(tokens.nonEmpty, "empty vocabulary")
  require(tokens.distinct.length == tokens.length,
    s"vocabulary has duplicate tokens")
  require(tokens.forall(_.nonEmpty), "vocabulary tokens must be non-empty")

  @transient @volatile
  private var built: (Array[Int], Array[java.util.HashMap[UTF8String, Integer]]) = _

  private def structures: (Array[Int], Array[java.util.HashMap[UTF8String, Integer]]) = {
    var b = built
    if (b == null) synchronized {
      b = built
      if (b == null) {
        val byLen = tokens.zipWithIndex
          .map { case (t, i) => (UTF8String.fromString(t), i) }
          .groupBy(_._1.numBytes())
        val ls = byLen.keys.toArray.sorted(Ordering[Int].reverse)
        val ms = ls.map { l =>
          val m = new java.util.HashMap[UTF8String, Integer]()
          byLen(l).foreach { case (u, i) => m.put(u, Integer.valueOf(i)) }
          m
        }
        b = (ls, ms)
        built = b
      }
    }
    b
  }

  /** Longest vocabulary match at byte offset `pos` of `text`: packed
    * `(byteLen << 32) | id`, or -1 when nothing matches. The probed key
    * is a zero-copy address view into the text's bytes. */
  def longestMatchAt(text: UTF8String, pos: Int): Long = {
    val (lens, maps) = structures
    val nb = text.numBytes()
    var i = 0
    while (i < lens.length) {
      val l = lens(i)
      if (pos + l <= nb) {
        val view = UTF8String.fromAddress(
          text.getBaseObject, text.getBaseOffset + pos, l)
        val id = maps(i).get(view)
        if (id != null) return (l.toLong << 32) | id.intValue().toLong
      }
      i += 1
    }
    -1L
  }
}

/** Static kernels behind [[TokenCounts]] / [[TokenIds]] — tight byte
  * loops the generated code calls directly (the [[VecCodec.int8Codes]] /
  * [[ShingleKernel]] pattern: no interpreted lambdas in the hot path;
  * Catalyst HOFs never enter whole-stage codegen). */
object TokenizeKernel {

  /** `[n_tokens, n_unknown]` of the greedy walk over `text`. */
  def greedyCounts(text: UTF8String, vocab: TokenVocab): ArrayData = {
    val nb = text.numBytes()
    var pos = 0
    var n = 0L
    var unk = 0L
    while (pos < nb) {
      val m = vocab.longestMatchAt(text, pos)
      if (m >= 0L) pos += (m >>> 32).toInt
      else {
        pos += UTF8String.numBytesForFirstByte(text.getByte(pos))
        unk += 1L
      }
      n += 1L
    }
    new GenericArrayData(Array(n, unk))
  }

  /** The token-id SEQUENCE of the greedy walk (vocabulary index, -1 for
    * an unknown character) — the form a downstream embedding lookup or
    * n-gram-over-ids stage consumes. */
  def greedyIds(text: UTF8String, vocab: TokenVocab): ArrayData = {
    val nb = text.numBytes()
    var pos = 0
    var out = new Array[Int](math.max(8, nb / 4))
    var n = 0
    while (pos < nb) {
      if (n == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      val m = vocab.longestMatchAt(text, pos)
      if (m >= 0L) {
        out(n) = m.toInt
        pos += (m >>> 32).toInt
      } else {
        out(n) = -1
        pos += UTF8String.numBytesForFirstByte(text.getByte(pos))
      }
      n += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }
}

/** One fused walk for MODEL SERVING: tokenize AND accumulate a per-token
  * weight sum in a single pass — `[n_tokens, n_unknown, w_sum]`. The
  * weight table is indexed by vocabulary id (the broadcast side of a
  * trained quality/langid classifier); an unknown character contributes
  * `unkW`. No id array materializes: scoring a document is one byte walk
  * with one array load per token, so a 100-TB corpus scores in a single
  * map-side scan with no shuffle at all. */
object TokenScoreKernel {
  def greedyScore(text: UTF8String, vocab: TokenVocab,
      weights: Array[Long], unkW: Long): ArrayData = {
    val nb = text.numBytes()
    var pos = 0
    var n = 0L
    var unk = 0L
    var s = 0L
    while (pos < nb) {
      val m = vocab.longestMatchAt(text, pos)
      if (m >= 0L) {
        s += weights(m.toInt)
        pos += (m >>> 32).toInt
      } else {
        s += unkW
        unk += 1L
        pos += UTF8String.numBytesForFirstByte(text.getByte(pos))
      }
      n += 1L
    }
    new GenericArrayData(Array(n, unk, s))
  }
}

/** `token_score(text)` → `array<bigint> [n_tokens, n_unknown, w_sum]`
  * under the constructor-bound vocabulary and per-id weight table — the
  * serving form of a trained token-weight classifier (quality filter,
  * langid): the model is vocabulary-sized, rides the plan as a reference
  * object like the vocabulary itself, and scoring stays inside
  * WholeStageCodegen. Integer weights keep the score hash-exact across
  * engines (no float summation order). */
case class TokenScore(child: Expression, vocab: Seq[String],
    weights: Seq[Long], unkWeight: Long) extends UnaryExpression {
  require(weights.length == vocab.length,
    s"token_score: ${weights.length} weights for ${vocab.length} vocab entries")

  @transient private lazy val index = new TokenVocab(vocab.toArray)
  @transient private lazy val wArr = weights.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_score needs string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_score"

  override protected def nullSafeEval(input: Any): Any =
    TokenScoreKernel.greedyScore(
      input.asInstanceOf[UTF8String], index, wArr, unkWeight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refV = ctx.addReferenceObj("tokVocab", index, classOf[TokenVocab].getName)
    val refW = ctx.addReferenceObj("tokWeights", wArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenScoreKernel.greedyScore($c, $refV, $refW, ${unkWeight}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenScore =
    copy(child = newChild)
}

/** `token_counts(text)` → `array<bigint> [n_tokens, n_unknown]` under the
  * constructor-bound vocabulary — the hot-path form for token-budget
  * metering (packing, mixing, per-source caps): counts only, no id array
  * materialized. `doGenCode` inlines a static kernel call with the
  * vocabulary as a plan reference object, so the walk runs inside
  * WholeStageCodegen. */
case class TokenCounts(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  @transient private lazy val index = new TokenVocab(vocab.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts needs string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenizeKernel.greedyCounts(input.asInstanceOf[UTF8String], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokVocab", index, classOf[TokenVocab].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeKernel.greedyCounts($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

/** `token_ids(text)` → `array<int>` of vocabulary indexes (-1 = unknown
  * character) — the materialized tokenization for downstream stages that
  * consume the sequence itself. */
case class TokenIds(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  @transient private lazy val index = new TokenVocab(vocab.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ids needs string, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_ids"

  override protected def nullSafeEval(input: Any): Any =
    TokenizeKernel.greedyIds(input.asInstanceOf[UTF8String], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokVocab", index, classOf[TokenVocab].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeKernel.greedyIds($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenIds =
    copy(child = newChild)
}

object Tokenize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `[n_tokens, n_unknown]` counts of the greedy walk. */
  def tokenCounts(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(text), vocab))

  /** Token-id sequence of the greedy walk (-1 = unknown char). */
  def tokenIds(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(TokenIds(ColumnBridge.expression(text), vocab))

  /** `[n_tokens, n_unknown, w_sum]` of the walk under a per-id weight
    * table — fused tokenize+score for trained token-weight models. */
  def tokenScore(text: Column, vocab: Seq[String], weights: Seq[Long],
      unkWeight: Long): Column =
    ColumnBridge.column(
      TokenScore(ColumnBridge.expression(text), vocab, weights, unkWeight))
}
