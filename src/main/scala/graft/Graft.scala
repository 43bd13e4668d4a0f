package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.Shim
import graft.functions.{BpeTokenCount, DotProduct, NormalizeWord, SimHash64, TokenizeNormalize}

/** Library entry point: installs graft's custom catalyst functions into a
  * session's SQL surface, so `spark.sql("SELECT normalize_word(x) ...")`
  * works alongside the Column API. Idempotent. */
object Graft {
  def install(spark: SparkSession): SparkSession = {
    Shim.registerFunction(spark, "normalize_word", es => NormalizeWord(es.head))
    Shim.registerFunction(spark, "simhash64", es => SimHash64(es.head))
    Shim.registerFunction(spark, "tokenize_normalize", es => TokenizeNormalize(es.head))
    Shim.registerFunction(spark, "bpe_token_count", es => BpeTokenCount(es.head))
    Shim.registerFunction(spark, "dot_product", es => DotProduct(es(0), es(1)))
    spark
  }
}
