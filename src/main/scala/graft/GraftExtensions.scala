package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType
import graft.ops.DotProduct
import graft.sketch.{CountMinAgg, CountMinEstimate, CountMinMergeAgg, DDSketch,
  DDSketchAgg, DDSketchFraction, DDSketchFromProto, DDSketchMergeAgg,
  DDSketchQuantile, DDSketchStats, DDSketchStdVar, DDSketchToProto}

/** SparkSessionExtensions hook registering graft's native expressions in
  * the SQL function registry, so `spark.sql` text can use the engine's
  * sketch and vector primitives directly:
  *
  * {{{
  *   SELECT ddsketch_quantile(ddsketch_agg(v), 0.9) FROM t GROUP BY k
  *   SELECT graft_dot(embedding, embedding) FROM embeddings
  * }}}
  *
  * Enabled by [[GraftSession]] via `spark.sql.extensions`; any external
  * session can opt in with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("ddsketch_agg"),
      info("ddsketch_agg", "ddsketch_agg(value[, alpha]) - DDSketch of a double column"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => DDSketchAgg(Cast(v, DoubleType), DDSketch.DefaultAlpha)
        case Seq(v, a) => DDSketchAgg(Cast(v, DoubleType), litDouble(a, "alpha"))
        case _ => throw new IllegalArgumentException("ddsketch_agg(value[, alpha])")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_merge_agg"),
      info("ddsketch_merge_agg", "ddsketch_merge_agg(sketch) - merge DDSketch blobs"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchMergeAgg(s)
        case _ => throw new IllegalArgumentException("ddsketch_merge_agg(sketch)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_quantile"),
      info("ddsketch_quantile", "ddsketch_quantile(sketch, q) - value at quantile"),
      (args: Seq[Expression]) => args match {
        // SQL numeric literals arrive as DECIMAL — cast to the double the
        // expression evaluates
        case Seq(s, q) => DDSketchQuantile(s, Cast(q, DoubleType))
        case _ => throw new IllegalArgumentException("ddsketch_quantile(sketch, q)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_stats"),
      info("ddsketch_stats", "ddsketch_stats(sketch) - count/sum/min/max/avg/p* struct"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchStats(s)
        case _ => throw new IllegalArgumentException("ddsketch_stats(sketch)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_from_proto"),
      info("ddsketch_from_proto",
        "ddsketch_from_proto(bytes) - import a DataDog-proto DDSketch as graft sketch bytes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchFromProto(s)
        case _ => throw new IllegalArgumentException("ddsketch_from_proto(bytes)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_to_proto"),
      info("ddsketch_to_proto",
        "ddsketch_to_proto(sketch) - export a graft sketch as DataDog-proto bytes"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchToProto(s)
        case _ => throw new IllegalArgumentException("ddsketch_to_proto(sketch)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_fraction"),
      info("ddsketch_fraction",
        "ddsketch_fraction(sketch, lo, hi) - fraction of read-backs in [lo, hi]"),
      (args: Seq[Expression]) => args match {
        case Seq(s, lo, hi) =>
          DDSketchFraction(s, Cast(lo, DoubleType), Cast(hi, DoubleType))
        case _ => throw new IllegalArgumentException("ddsketch_fraction(sketch, lo, hi)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_stdvar"),
      info("ddsketch_stdvar", "ddsketch_stdvar(sketch) - read-back population variance"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchStdVar(s, isStdDev = false)
        case _ => throw new IllegalArgumentException("ddsketch_stdvar(sketch)")
      }))

    ext.injectFunction((FunctionIdentifier("ddsketch_stddev"),
      info("ddsketch_stddev", "ddsketch_stddev(sketch) - read-back population stddev"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => DDSketchStdVar(s, isStdDev = true)
        case _ => throw new IllegalArgumentException("ddsketch_stddev(sketch)")
      }))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("graft_dot(a, b)")
      }))

    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      info("winnow_fps",
        "winnow_fps(text, k, w) - winnowed k-gram fingerprint set (48-bit longs)"),
      (args: Seq[Expression]) => args match {
        case Seq(t, k, w) =>
          graft.ops.WinnowFps(t, litDouble(k, "k").toInt, litDouble(w, "w").toInt)
        case _ => throw new IllegalArgumentException("winnow_fps(text, k, w)")
      }))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig",
        "minhash_sig(text, k, w) - k-lane MinHash signature over word w-gram shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(t, k, w) =>
          graft.ops.MinHashSig(t, litDouble(k, "k").toInt, litDouble(w, "w").toInt)
        case _ => throw new IllegalArgumentException("minhash_sig(text, k, w)")
      }))

    ext.injectFunction((FunctionIdentifier("cms_agg"),
      info("cms_agg", "cms_agg(value[, depth, width]) - Count-Min frequency sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => CountMinAgg(v).toAggregateExpression()
        case Seq(v, d, w) =>
          CountMinAgg(v, litDouble(d, "depth").toInt, litDouble(w, "width").toInt)
            .toAggregateExpression()
        case _ => throw new IllegalArgumentException("cms_agg(value[, depth, width])")
      }))

    ext.injectFunction((FunctionIdentifier("cms_merge_agg"),
      info("cms_merge_agg", "cms_merge_agg(cms) - merge Count-Min sketch blobs"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => CountMinMergeAgg(s).toAggregateExpression()
        case _ => throw new IllegalArgumentException("cms_merge_agg(cms)")
      }))

    ext.injectFunction((FunctionIdentifier("fnv1a64"),
      info("fnv1a64",
        "fnv1a64(str) - FNV-1a 64-bit over UTF-8 bytes as signed long (reference TID hash)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.ops.Fnv1a64(s)
        case _ => throw new IllegalArgumentException("fnv1a64(str)")
      }))

    ext.injectFunction((FunctionIdentifier("java_hash64"),
      info("java_hash64",
        "java_hash64(str) - 31-polynomial 64-bit string hash (reference index fingerprint hash)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.ops.JavaHash64(s)
        case _ => throw new IllegalArgumentException("java_hash64(str)")
      }))

    ext.injectFunction((FunctionIdentifier("fpc_tokenize"),
      info("fpc_tokenize",
        "fpc_tokenize(line) - reference-parity log tokenizer: struct(items, level, json_fp)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.ops.FpcTokenize(s, 15)
        case _ => throw new IllegalArgumentException("fpc_tokenize(line)")
      }))

    ext.injectFunction((FunctionIdentifier("xxh64"),
      info("xxh64",
        "xxh64(str) - XXH64 (seed 0) over UTF-8 bytes as signed long (reference span-fingerprint hash)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.ops.Xxh64Str(s)
        case _ => throw new IllegalArgumentException("xxh64(str)")
      }))

    ext.injectFunction((FunctionIdentifier("cms_est"),
      info("cms_est", "cms_est(cms, value) - point frequency estimate"),
      (args: Seq[Expression]) => args match {
        case Seq(s, v) => CountMinEstimate(s, v)
        case _ => throw new IllegalArgumentException("cms_est(cms, value)")
      }))
  }
}
