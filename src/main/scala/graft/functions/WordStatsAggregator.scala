package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2 UDF/UDAF row): a custom
  * `Aggregator[IN, BUF, OUT]` computing word-group statistics in one
  * pass — (group size, total occurrences, max occurrences, longest
  * word length). Demonstrates the typed Dataset aggregation path with a
  * product-encoded mutable-free buffer; merge is associative+commutative
  * so Spark plans the usual partial/final phases. */
object WordStatsAggregator
    extends Aggregator[(String, Long), WordStatsBuf, WordStats] {

  override def zero: WordStatsBuf = WordStatsBuf(0L, 0L, 0L, 0L)

  override def reduce(b: WordStatsBuf, in: (String, Long)): WordStatsBuf =
    WordStatsBuf(
      b.nWords + 1,
      b.totalCnt + in._2,
      math.max(b.maxCnt, in._2),
      math.max(b.maxLen, in._1.length.toLong))

  override def merge(a: WordStatsBuf, b: WordStatsBuf): WordStatsBuf =
    WordStatsBuf(a.nWords + b.nWords, a.totalCnt + b.totalCnt,
      math.max(a.maxCnt, b.maxCnt), math.max(a.maxLen, b.maxLen))

  override def finish(r: WordStatsBuf): WordStats =
    WordStats(r.nWords, r.totalCnt, r.maxCnt, r.maxLen)

  override def bufferEncoder: Encoder[WordStatsBuf] = Encoders.product[WordStatsBuf]
  override def outputEncoder: Encoder[WordStats] = Encoders.product[WordStats]
}

case class WordStatsBuf(nWords: Long, totalCnt: Long, maxCnt: Long, maxLen: Long)
case class WordStats(n_words: Long, total_cnt: Long, max_cnt: Long, max_word_len: Long)
