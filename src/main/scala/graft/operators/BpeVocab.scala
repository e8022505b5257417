package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
  * arXiv:1508.07909) expressed Spark-first.
  *
  * The classic algorithm is a loop over a WORD-FREQUENCY table, not the
  * corpus: each iteration counts adjacent symbol pairs weighted by word
  * frequency, picks the most frequent pair, and fuses every adjacent
  * occurrence of it. That structure maps onto Spark cleanly and scales to a
  * 100 TB corpus because the corpus is touched exactly once (the word-count
  * aggregation); every learn iteration runs over the distinct-word table —
  * vocabulary-sized (millions of rows, KBs per row), not corpus-sized — as
  *   one keyed aggregation (pair counts) +
  *   one 1-row argmax (`orderBy.limit(1)` = TakeOrderedAndProject, a
  *   per-partition top-1 then a single-row merge — NOT a global sort) +
  *   one per-row array fold (the merge rewrite, no shuffle).
  * The only data that ever reaches the driver is the winning pair, one row
  * per iteration — that is the algorithm's sequential dependency, not a
  * shortcut.
  *
  * Ties on pair frequency break lexicographically (left, then right) so the
  * learned vocabulary is deterministic across runs and cluster layouts.
  */
object BpeVocab {

  /** One learned merge: `left`+`right` fused at `rank` (0-based priority),
    * with the weighted adjacency count that won the iteration.
    */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** End-of-word sentinel appended as its own symbol so merges can capture
    * suffix boundaries ("est</w>") — the paper's formulation.
    */
  val EndMarker = "</w>"

  /** Corpus → word-frequency table: the single corpus-sized pass. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence for a word: its characters plus [[EndMarker]]. */
  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndMarker)))

  /** Adjacent-pair counts over a (symbols, freq) table: one keyed shuffle on
    * the pair, partial-aggregated map-side. Columns `(lhs, rhs, cnt)`.
    */
  private def pairCounts(symbols: DataFrame): DataFrame =
    symbols
      .filter(size(col("symbols")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("symbols")) - 1),
        i => struct(element_at(col("symbols"), i).as("lhs"),
                    element_at(col("symbols"), i + 1).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("freq").as("cnt"))

  /** Iteration-0 pair statistics (characters + end marker) for a (word,
    * freq) table — the first aggregation [[learn]] runs, exposed for the
    * oracle-checked `bpe_pair_counts` query.
    */
  def initialPairCounts(wordFreq: DataFrame): DataFrame =
    pairCounts(wordFreq.select(initialSymbols(col("word")).as("symbols"), col("freq")))

  /** Fuse every adjacent (left,right) occurrence, leftmost-first: a linear
    * left fold over the symbol array ("aaa" + (a,a) → ["aa","a"], matching
    * the reference algorithm's non-overlapping greedy scan). Pure per-row
    * expression — no shuffle, no driver involvement.
    */
  private def fusePair(symbols: Column, left: String, right: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merges from a (word, freq) table. Returns merges in
    * rank order. `checkpointEvery` cuts the growing fold-expression lineage
    * so iteration N doesn't re-evaluate iterations 0..N-1.
    */
  def learn(wordFreq: DataFrame, nMerges: Int, checkpointEvery: Int = 4): Seq[Merge] = {
    var symbols = Reuse.lineageCut(wordFreq
      .select(initialSymbols(col("word")).as("symbols"), col("freq")))
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = pairCounts(symbols)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, c)
        symbols = symbols.select(fusePair(col("symbols"), l, r).as("symbols"), col("freq"))
        rank += 1
        if (rank % checkpointEvery == 0) symbols = Reuse.lineageCut(symbols)
      }
    }
    merges.result()
  }

  /** Encode one word with a learned merge table (rank map): repeatedly fuse
    * the lowest-rank adjacent pair until none applies. Pure JVM function —
    * the per-row kernel for [[encode]].
    */
  def encodeWord(ranks: Map[(String, String), Int], word: String): Seq[String] = {
    var syms = word.map(_.toString) :+ EndMarker
    var done = false
    while (syms.length >= 2 && !done) {
      val best = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
        .sortBy(identity)
        .headOption
      best match {
        case Some((_, i)) =>
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        case None => done = true
      }
    }
    syms
  }

  /** Tokenize a text column into BPE symbols under a learned merge table.
    * The merge table is driver-held (vocab-sized) and broadcast inside the
    * closure; the rewrite itself is embarrassingly parallel per row.
    */
  def encode(docs: DataFrame, merges: Seq[Merge], textCol: String = "text",
             outCol: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf { text: String =>
      if (text == null) null
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap(encodeWord(ranks, _))
    }
    docs.withColumn(outCol, enc(col(textCol)))
  }
}
