package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT unicode_sanitize(title) ...")` works for users
  * who never touch the Column API — the last piece of "a user of the
  * reference could switch": their ad-hoc SQL keeps the custom
  * cleansing/hashing functions.
  *
  * Two entry points for Spark's two registration moments:
  *  - `GraftExtensions` for NEW sessions:
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    or `SparkSession.builder().withExtensions(new GraftExtensions)`;
  *  - `GraftFunctions.register(spark)` for an EXISTING session
  *    (extensions are applied only at session construction).
  */
object GraftFunctions {

  private def info(cls: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(cls.getName, null, name, usage, "")

  private val unicodeSanitizeBuilder: Seq[Expression] => Expression = {
    case Seq(c) => UnicodeSanitizeExpr(c)
    case args => throw new IllegalArgumentException(
      s"unicode_sanitize expects 1 argument, got ${args.length}")
  }

  private val md5PrefixBuilder: Seq[Expression] => Expression = {
    case Seq(c, Literal(digits: Int, _)) => Md5PrefixExpr(c, digits)
    case Seq(c, Literal(digits: Long, _)) => Md5PrefixExpr(c, digits.toInt)
    case _ => throw new IllegalArgumentException(
      "md5_prefix expects (col, integer-literal hex digit count 1..15)")
  }

  private val dotProductBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProductExpr(a, b)
    case args => throw new IllegalArgumentException(
      s"dot_product expects 2 array<double> arguments, got ${args.length}")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("unicode_sanitize"),
      info(classOf[UnicodeSanitizeExpr], "unicode_sanitize",
        "unicode_sanitize(str) - repairs mojibake/unicode-escape damage to a fixpoint"),
      unicodeSanitizeBuilder),
    (FunctionIdentifier("md5_prefix"),
      info(classOf[Md5PrefixExpr], "md5_prefix",
        "md5_prefix(str, digits) - first `digits` hex chars of md5(str) as a BIGINT (1..15)"),
      md5PrefixBuilder),
    (FunctionIdentifier("dot_product"),
      info(classOf[DotProductExpr], "dot_product",
        "dot_product(arr1, arr2) - left-to-right dot product of two array<double>; " +
          "NULL on length mismatch or null elements"),
      dotProductBuilder),
    (FunctionIdentifier("bitmap_distinct"),
      info(classOf[BitmapDistinctExpr], "bitmap_distinct",
        "bitmap_distinct(key) - exact mergeable distinct count over any 64-bit " +
          "integral keys (compressed bitmap OR merge; no distinct-value shuffle)"),
      {
        case Seq(c) => BitmapDistinctExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_distinct expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_sketch"),
      info(classOf[BitmapSketchExpr], "bitmap_sketch",
        "bitmap_sketch(key) - re-aggregable exact distinct sketch (compressed " +
          "binary bitmap) over any 64-bit integral keys; merge with bitmap_merge_count"),
      {
        case Seq(c) => BitmapSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_merge_count"),
      info(classOf[BitmapMergeCountExpr], "bitmap_merge_count",
        "bitmap_merge_count(sketch) - exact distinct count from OR-merged " +
          "bitmap_sketch values"),
      {
        case Seq(c) => BitmapMergeCountExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_merge_count expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_and_count"),
      info(classOf[BitmapAndCountExpr], "bitmap_and_count",
        "bitmap_and_count(sk1, sk2) - exact intersection cardinality of two " +
          "bitmap_sketch values (overlap/retention from the sketch table)"),
      {
        case Seq(a, b) => BitmapAndCountExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"bitmap_and_count expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_andnot_count"),
      info(classOf[BitmapAndNotCountExpr], "bitmap_andnot_count",
        "bitmap_andnot_count(sk1, sk2) - exact set-difference cardinality " +
          "|A \\ B| of two bitmap_sketch values (new/churned audiences from " +
          "the sketch table)"),
      {
        case Seq(a, b) => BitmapAndNotCountExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"bitmap_andnot_count expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_merge_sketch"),
      info(classOf[BitmapMergeSketchExpr], "bitmap_merge_sketch",
        "bitmap_merge_sketch(sketch) - OR-merge fine sketches into a STORED " +
          "coarser sketch (bytes identical to sketching the facts directly)"),
      {
        case Seq(c) => BitmapMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_sketch_coded"),
      info(classOf[CodedBitmapSketchExpr], "bitmap_sketch_coded",
        "bitmap_sketch_coded(code, dict_id) - exact distinct sketch over " +
          "dictionary codes whose bytes CARRY the dictionary lineage id, so " +
          "merges across rebuilt/independent dictionaries fail loudly"),
      {
        case Seq(c, id) => CodedBitmapSketchExpr(c, id)
        case args => throw new IllegalArgumentException(
          s"bitmap_sketch_coded expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_merge_count_coded"),
      info(classOf[CodedBitmapMergeCountExpr], "bitmap_merge_count_coded",
        "bitmap_merge_count_coded(sketch) - exact distinct count from " +
          "OR-merged coded sketches; dictionary lineages reconciled fail-loud"),
      {
        case Seq(c) => CodedBitmapMergeCountExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_merge_count_coded expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_merge_sketch_coded"),
      info(classOf[CodedBitmapMergeSketchExpr], "bitmap_merge_sketch_coded",
        "bitmap_merge_sketch_coded(sketch) - OR-merge fine coded sketches " +
          "into a STORED coarser coded sketch (lineage tag preserved)"),
      {
        case Seq(c) => CodedBitmapMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_merge_sketch_coded expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_and_count_coded"),
      info(classOf[CodedBitmapAndCountExpr], "bitmap_and_count_coded",
        "bitmap_and_count_coded(sk1, sk2) - exact intersection cardinality " +
          "of two coded sketches, lineage-checked per row"),
      {
        case Seq(a, b) => CodedBitmapAndCountExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"bitmap_and_count_coded expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_andnot_count_coded"),
      info(classOf[CodedBitmapAndNotCountExpr], "bitmap_andnot_count_coded",
        "bitmap_andnot_count_coded(sk1, sk2) - exact set-difference " +
          "cardinality |A \\ B| of two coded sketches, lineage-checked per " +
          "row (new/churned string keys from the coded sketch table)"),
      {
        case Seq(a, b) => CodedBitmapAndNotCountExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"bitmap_andnot_count_coded expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_max_code_coded"),
      info(classOf[CodedBitmapMaxCodeExpr], "bitmap_max_code_coded",
        "bitmap_max_code_coded(sketch) - largest set code in a coded sketch " +
          "(null when empty); the dictionary-audit range probe"),
      {
        case Seq(c) => CodedBitmapMaxCodeExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_max_code_coded expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("bitmap_dict_id_coded"),
      info(classOf[CodedBitmapDictIdExpr], "bitmap_dict_id_coded",
        "bitmap_dict_id_coded(sketch) - the dictionary-lineage id embedded " +
          "in coded sketch bytes (null for the unset-empty sentinel)"),
      {
        case Seq(c) => CodedBitmapDictIdExpr(c)
        case args => throw new IllegalArgumentException(
          s"bitmap_dict_id_coded expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("hll_merge_sketch"),
      info(classOf[HllMergeSketchExpr], "hll_merge_sketch",
        "hll_merge_sketch(sketch) - max-merge fine HLL sketches into a STORED " +
          "coarser sketch (bytes identical to sketching the keys directly)"),
      {
        case Seq(c) => HllMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"hll_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("vhist_merge_sketch"),
      info(classOf[VhistMergeSketchExpr], "vhist_merge_sketch",
        "vhist_merge_sketch(sketch) - count-add fine value histograms into a " +
          "STORED coarser sketch (unit-checked; bytes identical to direct)"),
      {
        case Seq(c) => VhistMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"vhist_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("hll_distinct"),
      info(classOf[HllDistinctExpr], "hll_distinct",
        "hll_distinct(key) - HyperLogLog distinct-count estimate (~1.6% error, " +
          "4 KiB state) over integral/string/binary keys — the approximate twin " +
          "of bitmap_distinct for unbounded domains"),
      {
        case Seq(c) => HllDistinctExpr(c)
        case args => throw new IllegalArgumentException(
          s"hll_distinct expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("hll_sketch"),
      info(classOf[HllSketchExpr], "hll_sketch",
        "hll_sketch(key) - re-aggregable 4 KiB HLL register sketch; " +
          "merge with hll_merge_count"),
      {
        case Seq(c) => HllSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"hll_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("hll_merge_count"),
      info(classOf[HllMergeCountExpr], "hll_merge_count",
        "hll_merge_count(sketch) - distinct-count estimate from max-merged " +
          "hll_sketch values"),
      {
        case Seq(c) => HllMergeCountExpr(c)
        case args => throw new IllegalArgumentException(
          s"hll_merge_count expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("vhist_sketch"),
      info(classOf[VhistSketchExpr], "vhist_sketch",
        "vhist_sketch(value[, unit]) - exact mergeable value-histogram sketch " +
          "over an integral metric domain (quantile leg of the sketch algebra); " +
          "the 2-arg form pre-buckets floor(value/unit) INSIDE the expression " +
          "and tags the unit in the sketch bytes so merges can never mix units"),
      {
        case Seq(c) => VhistSketchExpr(c)
        case Seq(c, u) => VhistSketchUnitExpr(c, u)
        case args => throw new IllegalArgumentException(
          s"vhist_sketch expects 1 or 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("vhist_merge_quantile"),
      info(classOf[VhistMergeQuantileExpr], "vhist_merge_quantile",
        "vhist_merge_quantile(sketch, q) - EXACT q-quantile (discrete lower rule) " +
          "from count-added vhist_sketch values"),
      {
        case Seq(c, q) => VhistMergeQuantileExpr(c, q)
        case args => throw new IllegalArgumentException(
          s"vhist_merge_quantile expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("vhist_quantile"),
      info(classOf[VhistQuantileExpr], "vhist_quantile",
        "vhist_quantile(value, q) - one-shot EXACT q-quantile over integral values"),
      {
        case Seq(c, q) => VhistQuantileExpr(c, q)
        case args => throw new IllegalArgumentException(
          s"vhist_quantile expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_sketch"),
      info(classOf[KmvSketchExpr], "kmv_sketch",
        "kmv_sketch(key, k) - mergeable bottom-k uniform-sample sketch of the " +
          "distinct STRING keys (md5-prefix hash; sample leg of the sketch algebra)"),
      {
        case Seq(c, k) => KmvSketchExpr(c, k)
        case args => throw new IllegalArgumentException(
          s"kmv_sketch expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_merge_sketch"),
      info(classOf[KmvMergeSketchExpr], "kmv_merge_sketch",
        "kmv_merge_sketch(sketch) - bottom-k union of fine sketches into a STORED " +
          "coarser sketch (k-checked; bytes identical to sketching the keys directly)"),
      {
        case Seq(c) => KmvMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_merge_estimate"),
      info(classOf[KmvMergeEstimateExpr], "kmv_merge_estimate",
        "kmv_merge_estimate(sketch) - distinct-count estimate from merged kmv " +
          "sketches (EXACT below k; integer-exact (k-1)*2^60/h_k at k)"),
      {
        case Seq(c) => KmvMergeEstimateExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_merge_estimate expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_keys"),
      info(classOf[KmvKeysExpr], "kmv_keys",
        "kmv_keys(sketch) - the sampled keys (ascending hash order) as " +
          "array<string>, for posexplode into sample rows"),
      {
        case Seq(c) => KmvKeysExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_keys expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("cms_sketch"),
      info(classOf[CmsSketchExpr], "cms_sketch",
        "cms_sketch(key[, weight]) - mergeable count-min frequency sketch " +
          "(d=4, w=2048) over STRING keys (frequency leg of the sketch algebra; " +
          "estimate >= true); the 2-arg form cell-adds a non-negative weight, so " +
          "sketches build from already-aggregated (key, count) relations"),
      {
        case Seq(c) => CmsSketchExpr(c)
        case Seq(c, w) => CmsSketchWeightedExpr(c, w)
        case args => throw new IllegalArgumentException(
          s"cms_sketch expects 1 or 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("cms_merge_sketch"),
      info(classOf[CmsMergeSketchExpr], "cms_merge_sketch",
        "cms_merge_sketch(sketch) - cell-add fine CMS sketches into a STORED " +
          "coarser sketch (bytes identical to sketching the facts directly)"),
      {
        case Seq(c) => CmsMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"cms_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("cms_est"),
      info(classOf[CmsEstExpr], "cms_est",
        "cms_est(sketch, key) - count-min frequency estimate (>= true count) " +
          "for a key, per row"),
      {
        case Seq(sk, k) => CmsEstExpr(sk, k)
        case args => throw new IllegalArgumentException(
          s"cms_est expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_estimate"),
      info(classOf[KmvEstimateExpr], "kmv_estimate",
        "kmv_estimate(sketch) - the kmv distinct estimate as a per-row scalar"),
      {
        case Seq(c) => KmvEstimateExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_estimate expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_jaccard_bp"),
      info(classOf[KmvJaccardBpExpr], "kmv_jaccard_bp",
        "kmv_jaccard_bp(sk1, sk2) - Jaccard similarity of two same-k kmv " +
          "sketches' key sets in integer basis points, per row"),
      {
        case Seq(a, b) => KmvJaccardBpExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"kmv_jaccard_bp expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_intersect_estimate"),
      info(classOf[KmvIntersectEstimateExpr], "kmv_intersect_estimate",
        "kmv_intersect_estimate(sk1, sk2) - intersection-cardinality estimate " +
          "of two same-k kmv sketches (exact while the union sample is exact)"),
      {
        case Seq(a, b) => KmvIntersectEstimateExpr(a, b)
        case args => throw new IllegalArgumentException(
          s"kmv_intersect_estimate expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_union_estimate"),
      info(classOf[KmvUnionEstimateExpr], "kmv_union_estimate",
        "kmv_union_estimate(array<sketch>) - j-way union-cardinality " +
          "estimate off same-k kmv sketches, per row"),
      {
        case Seq(c) => KmvUnionEstimateExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_union_estimate expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("kmv_intersect_all_estimate"),
      info(classOf[KmvIntersectAllEstimateExpr], "kmv_intersect_all_estimate",
        "kmv_intersect_all_estimate(array<sketch>) - j-way " +
          "intersection-cardinality estimate off same-k kmv sketches, per row"),
      {
        case Seq(c) => KmvIntersectAllEstimateExpr(c)
        case args => throw new IllegalArgumentException(
          s"kmv_intersect_all_estimate expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("dds_sketch"),
      info(classOf[DdsSketchExpr], "dds_sketch",
        "dds_sketch(value, alpha) - mergeable relative-error quantile sketch " +
          "(DDSketch log buckets) over DOUBLE values; any quantile from the " +
          "merged sketch is within alpha of the truth"),
      {
        case Seq(c, a) => DdsSketchExpr(c, a)
        case args => throw new IllegalArgumentException(
          s"dds_sketch expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("dds_merge_quantile"),
      info(classOf[DdsMergeQuantileExpr], "dds_merge_quantile",
        "dds_merge_quantile(sketch, q) - q-quantile estimate (within the " +
          "sketches' alpha) from count-added dds_sketch values"),
      {
        case Seq(c, q) => DdsMergeQuantileExpr(c, q)
        case args => throw new IllegalArgumentException(
          s"dds_merge_quantile expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("dds_merge_sketch"),
      info(classOf[DdsMergeSketchExpr], "dds_merge_sketch",
        "dds_merge_sketch(sketch) - count-add fine DDSketches into a STORED " +
          "coarser sketch (bytes identical to sketching the values directly)"),
      {
        case Seq(c) => DdsMergeSketchExpr(c)
        case args => throw new IllegalArgumentException(
          s"dds_merge_sketch expects 1 argument, got ${args.length}")
      }),
    (FunctionIdentifier("dds_quantile"),
      info(classOf[DdsQuantileExpr], "dds_quantile",
        "dds_quantile(value, alpha, q) - one-shot relative-error q-quantile " +
          "estimate over DOUBLE values"),
      {
        case Seq(c, a, q) => DdsQuantileExpr(c, a, q)
        case args => throw new IllegalArgumentException(
          s"dds_quantile expects 3 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("cms_est_all"),
      info(classOf[CmsEstAllExpr], "cms_est_all",
        "cms_est_all(sketch, keys) - count-min estimates for an " +
          "ARRAY<STRING> of keys with ONE sketch decode, per row"),
      {
        case Seq(sk, keys) => CmsEstAllExpr(sk, keys)
        case args => throw new IllegalArgumentException(
          s"cms_est_all expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("dds_quantiles"),
      info(classOf[DdsQuantilesExpr], "dds_quantiles",
        "dds_quantiles(sketch, array(q1, q2, ...)) - multiple quantile " +
          "estimates off stored DDSketch bytes with ONE decode, per row"),
      {
        case Seq(c, qs) => DdsQuantilesExpr(c, qs)
        case args => throw new IllegalArgumentException(
          s"dds_quantiles expects 2 arguments, got ${args.length}")
      }),
    (FunctionIdentifier("dds_quantile_of"),
      info(classOf[DdsQuantileOfExpr], "dds_quantile_of",
        "dds_quantile_of(sketch, q) - q-quantile estimate as a per-row scalar " +
          "off stored DDSketch bytes (read a sketch table without re-aggregation)"),
      {
        case Seq(c, q) => DdsQuantileOfExpr(c, q)
        case args => throw new IllegalArgumentException(
          s"dds_quantile_of expects 2 arguments, got ${args.length}")
      }))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}

/** `spark.sql.extensions` entry point (new sessions): the custom SQL
  * functions plus the range-join rewrite
  * ([[graft.plans.RangeJoinRewrite]] — naive interval predicates
  * become bucket equi-joins instead of nested-loop joins). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (id, inf, builder) =>
      ext.injectFunction((id, inf, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
