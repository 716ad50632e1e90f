package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ImageDHashExpr, ImageFeaturesExpr, ImageResizeExpr, MinHashSigExpr, PolyHashExpr, SimHashExpr, WordShingleExpr}

/** Registration of graft's native expressions as SQL functions, via the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or on an already-running session:
  * GraftExtensions.register(spark)
  * // then:
  * spark.sql("SELECT simhash64(tokens), word_shingles(tokens, 3) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // whole-operator extension: the as-of merge join's planner strategy
    // and its pushdown/pruning optimizer rule (graft.plans.*)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinOptimizations)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  /** A foldable `array(array(left, right), ...)` merge table for the BPE
    * SQL face, evaluated at registration time (the merge table is a
    * MODEL — a plan-time constant — exactly as the Scala API embeds it). */
  private def mergesArg(e: Expression, fn: String): Seq[(String, String)] = {
    if (!e.foldable || !e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      throw new IllegalArgumentException(
        s"$fn expects a foldable array(array(left, right), ...) merge table, got $e")
    val arr = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { i =>
      val p = arr.getArray(i)
      if (p == null || p.numElements() != 2)
        throw new IllegalArgumentException(
          s"$fn: merge entry $i must be a 2-element array(left, right)")
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }
  }

  /** Optional literal-INT k with a default (the kll_* aggregate faces). */
  private def optK(args: Seq[Expression], idx: Int, default: Int,
                   fn: String): Int =
    if (args.size > idx) intArg(args(idx), fn) else default

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingleExpr].getName, "word_shingles"),
      { case Seq(tokens, n) => WordShingleExpr(tokens, intArg(n, "word_shingles"))
        case args => throw new IllegalArgumentException(
          s"word_shingles(tokens, n) expects 2 args, got ${args.size}") }),
    (FunctionIdentifier("char_grams"),
      new ExpressionInfo(classOf[graft.functions.CharGramsExpr].getName, "char_grams"),
      { case Seq(text, n) =>
          graft.functions.CharGramsExpr(text, intArg(n, "char_grams"))
        case args => throw new IllegalArgumentException(
          s"char_grams(text, n) expects 2 args, got ${args.size}") }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      { case Seq(tokens) => SimHashExpr(tokens)
        case args => throw new IllegalArgumentException(
          s"simhash64(tokens) expects 1 arg, got ${args.size}") }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      { case Seq(shingles, n) =>
          MinHashSigExpr(shingles, intArg(n, "minhash_sig"))
        case args => throw new IllegalArgumentException(
          s"minhash_sig(shingles, numHashes) expects 2 args, got ${args.size}") }),
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
      { case Seq(s) => PolyHashExpr(s)
        case args => throw new IllegalArgumentException(
          s"poly_hash(str) expects 1 arg, got ${args.size}") }),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProductExpr].getName, "vec_dot"),
      { case Seq(a, b) => graft.functions.DotProductExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_dot(a, b) expects 2 args, got ${args.size}") }),
    (FunctionIdentifier("image_features"),
      new ExpressionInfo(classOf[ImageFeaturesExpr].getName, "image_features"),
      { case Seq(payload) => ImageFeaturesExpr(payload)
        case args => throw new IllegalArgumentException(
          s"image_features(payload) expects 1 arg, got ${args.size}") }),
    (FunctionIdentifier("image_dhash"),
      new ExpressionInfo(classOf[ImageDHashExpr].getName, "image_dhash"),
      { case Seq(payload) => ImageDHashExpr(payload)
        case args => throw new IllegalArgumentException(
          s"image_dhash(payload) expects 1 arg, got ${args.size}") }),
    (FunctionIdentifier("image_resize"),
      new ExpressionInfo(classOf[ImageResizeExpr].getName, "image_resize"),
      { case Seq(payload, w, h) => ImageResizeExpr(payload,
          intArg(w, "image_resize"), intArg(h, "image_resize"))
        case args => throw new IllegalArgumentException(
          s"image_resize(payload, width, height) expects 3 args, got ${args.size}") }),
    (FunctionIdentifier("audio_features"),
      new ExpressionInfo(classOf[graft.functions.AudioFeaturesExpr].getName, "audio_features"),
      { case Seq(payload) => graft.functions.AudioFeaturesExpr(payload)
        case args => throw new IllegalArgumentException(
          s"audio_features(payload) expects 1 arg, got ${args.size}") }),
    (FunctionIdentifier("pcm_wav"),
      new ExpressionInfo(classOf[graft.functions.PcmWavExpr].getName, "pcm_wav"),
      { case Seq(period, amp, n) => graft.functions.PcmWavExpr(period, amp, n)
        case args => throw new IllegalArgumentException(
          s"pcm_wav(period, amp, n_samples) expects 3 args, got ${args.size}") }),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[graft.functions.KllQuantileExpr].getName, "kll_quantile"),
      { case Seq(sk, q) => graft.functions.KllQuantileExpr(sk, q)
        case args => throw new IllegalArgumentException(
          s"kll_quantile(sketch, q) expects 2 args, got ${args.size}") }),
    (FunctionIdentifier("kll_rank"),
      new ExpressionInfo(classOf[graft.functions.KllRankExpr].getName, "kll_rank"),
      { case Seq(sk, v) => graft.functions.KllRankExpr(sk, v)
        case args => throw new IllegalArgumentException(
          s"kll_rank(sketch, value) expects 2 args, got ${args.size}") }),
    // aggregate faces: the analyzer wraps a bare AggregateFunction in an
    // AggregateExpression, so the whole mergeable-percentile rollup
    // (sketch fine -> merge coarse -> quantile query) is expressible in
    // pure SQL; values coerce to DOUBLE like percentile_approx's input
    (FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[graft.functions.KllSketchAgg].getName, "kll_sketch"),
      { case args @ (value +: _) if args.size <= 2 =>
          graft.functions.KllSketchAgg(
            org.apache.spark.sql.catalyst.expressions.Cast(
              value, org.apache.spark.sql.types.DoubleType),
            optK(args, 1, graft.functions.KllSketchAgg.DefaultK, "kll_sketch"))
        case args => throw new IllegalArgumentException(
          s"kll_sketch(value[, k]) expects 1-2 args, got ${args.size}") }),
    (FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[graft.functions.KllMergeAgg].getName, "kll_merge"),
      { case args @ (sketch +: _) if args.size <= 2 =>
          graft.functions.KllMergeAgg(sketch,
            optK(args, 1, graft.functions.KllSketchAgg.DefaultK, "kll_merge"))
        case args => throw new IllegalArgumentException(
          s"kll_merge(sketch[, k]) expects 1-2 args, got ${args.size}") }),
    (FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[graft.functions.BpeEncodeExpr].getName, "bpe_encode"),
      { case Seq(text, merges) =>
          graft.functions.BpeEncodeExpr(text, mergesArg(merges, "bpe_encode"))
        case args => throw new IllegalArgumentException(
          s"bpe_encode(text, array(array(l, r), ...)) expects 2 args, got ${args.size}") })
  )

  /** Imperative registration for sessions created without the extensions
    * conf (e.g. notebooks): installs the same functions into the session's
    * registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      Bridge.registerFunction(spark, ident, info, builder)
    }
}
