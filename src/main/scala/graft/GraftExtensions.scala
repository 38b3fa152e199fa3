package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{DotProduct, L2Squared, LshSigs, SketchExprs, VecExprs}

/** SparkSessionExtensions entry point: makes every graft native function
  * available to ANY session — including plain `spark.sql` users — via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * This is the supported plugin seam for a library extending Spark: no
  * session-side registration calls needed, works under spark-submit and
  * thrift-server alike. The in-code `VecExprs.register`/
  * `SketchExprs.register` helpers do the same idempotently for sessions
  * built without the config (the Verify/Bench path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def f(name: String, cls: Class[_], builder: Seq[Expression] => Expression) =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    f("graft_dot", classOf[DotProduct], es => DotProduct(es.head, es(1)))
    f("graft_l2", classOf[L2Squared], es => L2Squared(es.head, es(1)))
    f("graft_lsh_sigs", classOf[LshSigs], VecExprs.lshSigsBuilder)
    f("graft_simhash16", classOf[SketchExprs.SimHash16],
      es => SketchExprs.SimHash16(es.head))
    f("graft_simhash_wide", classOf[SketchExprs.SimHashWide],
      es => SketchExprs.SimHashWide(es.head))
    f("graft_minhash_sig", classOf[SketchExprs.MinHashSig],
      es => SketchExprs.MinHashSig(es.head))
    f("graft_bitmap_and_count", classOf[SketchExprs.BitmapAndCount],
      es => SketchExprs.BitmapAndCount(es.head, es(1)))
    f("graft_bloom_agg", classOf[BloomFilterAggregate],
      es => new BloomFilterAggregate(es.head, es(1), es(2)))
    f("graft_might_contain", classOf[BloomFilterMightContain],
      es => BloomFilterMightContain(es.head, es(1)))
  }
}
