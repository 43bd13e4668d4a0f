package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BpeTokenCount, DotProduct, NormalizeWord, SimHash64, TokenizeNormalize}

/** `SparkSessionExtensions` installer — the config-driven alternative to
  * `Graft.install`: add `spark.sql.extensions=graft.GraftExtensions` to
  * any session (spark-submit, thrift server, notebooks) and the custom
  * functions resolve in SQL with no code changes. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) = {
    val _ = usage // the non-deprecated ctor has no usage slot; kept for call-site docs
    new ExpressionInfo(classOf[GraftExtensions].getName, name)
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("normalize_word"),
      info("normalize_word", "byte-exact reference word normalization"),
      (es: Seq[Expression]) => NormalizeWord(es.head)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("tokenize_normalize"),
      info("tokenize_normalize", "fused whitespace tokenize + normalize generator"),
      (es: Seq[Expression]) => TokenizeNormalize(es.head)))
    e.injectFunction((FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count", "greedy longest-match subword count over the committed merges fixture"),
      (es: Seq[Expression]) => BpeTokenCount(es.head)))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "native dense dot product over two array<double> columns"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
  }
}
