package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-side BPE ENCODE (q255) — the missing half of q182's merge
  * LEARNER: apply an ordered, learned merge list to every document in one
  * map-only pass and count the resulting symbols.
  *
  * Per document: split on single spaces, split each token into code-point
  * symbols, then apply each merge in LIST ORDER as one left-to-right
  * non-overlapping pass (exactly the semantics q182's space-doubling
  * `replace` realizes, and what the DuckDB oracle replays) and return the
  * TOTAL symbol count across tokens.
  *
  * Why an expression: the composable form needs a per-token lambda
  * applying K merges — K interpreted higher-order passes per row (the
  * CodegenFallback trap the repo's expression layer exists for). This
  * walks each document once with primitive loops; the merge list is baked
  * into the expression instance at plan time (bounded — K learned merges,
  * the `limit(nlist)` collect discipline), so executors get it inside the
  * serialized plan, no join and no broadcast variable.
  *
  * Reference: the merge-application loop in Sennrich et al. 2016's
  * published BPE (greedy leftmost, merges in learned order) — re-derived
  * here; no reference-repo counterpart (the reference has no tokenizer).
  */
case class BpeDocSymbols(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val m1: Array[String] = merges.map(_._1).toArray
  @transient private lazy val m2: Array[String] = merges.map(_._2).toArray

  /** Symbols after applying the merge list to one token. */
  private def encodedLen(token: String): Int = {
    if (token.isEmpty) return 0
    // Code-point symbolization — matches substring(token, i, 1) in both
    // engines' SQL (code-point indexed, not UTF-16 units).
    var syms = new Array[String](token.codePointCount(0, token.length))
    var i = 0
    var cp = 0
    while (i < token.length) {
      val c = token.codePointAt(i)
      syms(cp) = new String(Character.toChars(c))
      cp += 1
      i += Character.charCount(c)
    }
    var n = syms.length
    var k = 0
    while (k < m1.length && n >= 2) {
      val a = m1(k); val b = m2(k)
      // One greedy left-to-right non-overlapping pass, in place.
      var r = 0; var w = 0
      while (r < n) {
        if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
          syms(w) = a + b; r += 2
        } else {
          syms(w) = syms(r); r += 1
        }
        w += 1
      }
      n = w
      k += 1
    }
    n
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) total += encodedLen(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Total BPE symbols of a space-tokenized document under an ordered
    * merge list. */
  def bpe_doc_symbols(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeDocSymbols(expression(text), merges))
}
