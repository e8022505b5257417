package graft.queries

import java.lang.Double.doubleToRawLongBits

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IEEE signed-zero normalization between the engine and the DuckDB
  * oracle (the r7 `embed_covariance` red row).
  *
  * The asymmetry: DuckDB's `round()` preserves the sign of zero
  * (`round(-1e-9, 6) → -0.0`), while every engine-side rounding path —
  * Spark's `functions.round` and the driver-side
  * `BigDecimal.setScale(6, HALF_UP)` used by `embed_covariance` — goes
  * through `BigDecimal`, which cannot represent `-0.0` and emits `+0.0`.
  * A true value of ≈ -1e-9 therefore hash-mismatches on the zero's sign
  * alone, with both engines numerically correct.
  *
  * The fix is on the oracle side: `round(x, 6) + 0.0`, because IEEE 754
  * round-to-nearest defines `(-0.0) + (+0.0) = +0.0`. These tests pin
  * the three facts the fix relies on, bit-for-bit.
  */
class SignedZeroSpec extends SparkSpec {

  private val PosZeroBits = doubleToRawLongBits(0.0)

  test("IEEE: -0.0 + 0.0 is +0.0 (the oracle-side normalizer)") {
    assert(doubleToRawLongBits(-0.0 + 0.0) === PosZeroBits)
    // and it is the identity everywhere else, including +0.0 and negatives
    assert(doubleToRawLongBits(0.0 + 0.0) === PosZeroBits)
    assert(-1.5e-6 + 0.0 === -1.5e-6)
  }

  test("Spark round() emits +0.0 for tiny-negative and -0.0 inputs") {
    val row = spark
      .range(1)
      .select(
        round(lit(-1e-9), 6).as("tiny"),
        round(lit(-0.0), 6).as("negzero"),
        round(lit(-1.5e-6), 6).as("nonzero"))
      .head()
    assert(doubleToRawLongBits(row.getDouble(0)) === PosZeroBits)
    assert(doubleToRawLongBits(row.getDouble(1)) === PosZeroBits)
    assert(row.getDouble(2) === -2e-6) // HALF_UP away from zero, sign kept
  }

  test("the embed_covariance emit path maps a planted -1e-9 entry to +0.0") {
    // exactly the expression at the covariance emit: BigDecimal HALF_UP
    def emit(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doubleToRawLongBits(emit(-1e-9)) === PosZeroBits)
    assert(doubleToRawLongBits(emit(0.0)) === PosZeroBits)
    assert(emit(-0.0000015) === -0.000002)
  }

  /** For each `round(` in the collapsed SQL, walk the balanced parens to
    * its own closing `)` and return (textAfterClose, fullMatchContext).
    * Collapsing first means a round() split across source lines cannot
    * evade the guard (the old per-line grep could be dodged by a
    * newline between `6)` and `AS col`).
    */
  private def roundTails(collapsed: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var from = 0
    while ({ from = collapsed.indexOf("round(", from); from >= 0 }) {
      var i     = from + "round(".length
      var depth = 1
      while (depth > 0 && i < collapsed.length) {
        collapsed.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        i += 1
      }
      val tail = collapsed.substring(i, math.min(i + 60, collapsed.length))
      val ctx  = collapsed.substring(math.max(0, from - 10), math.min(i + 30, collapsed.length))
      out += ((tail, ctx))
      from = from + "round(".length
    }
    out.result()
  }

  test("oracle SQL: every bare round() output column is unsigned by proof") {
    val sql = graft.SparkEntry.oracleSql("embed_covariance")
    assert(sql.contains("round(covar_pop(a.v, b.v), 6) + 0.0"))

    // A round() whose close is immediately followed by `AS <type>)` is a
    // CAST target: integers and DECIMALs cannot represent -0.0, so the
    // cast itself normalizes. DOUBLE/FLOAT/REAL are deliberately NOT
    // here — a `CAST(round(..) AS DOUBLE) AS col` keeps the signed zero
    // and must fail the guard until reviewed.
    val SignlessCastTypes: Set[String] =
      Set("BIGINT", "UBIGINT", "HUGEINT", "INT", "INTEGER", "SMALLINT",
        "TINYINT", "DECIMAL", "VARCHAR", "BOOLEAN")

    // Default-deny: a `round(...) AS col` without the `+ 0.0` normalizer
    // is allowed ONLY for (query, col) pairs proven unsigned — ratios of
    // nonnegative counts, [0,1] fractions, norms/RMS/quantiles of
    // positive domains, ln(x+1) with x >= 0. Pairs, not bare names, so a
    // future signed column that happens to reuse a name like `score`
    // in another query is still denied by default.
    val UnsignedPairs: Set[String] = Set(
      // BM25: ln((n-df+0.5)/(df+0.5) + 1) >= ln(1) = 0, tf weights >= 0
      "bm25_search:score",
      // ratios of nonnegative counts / [0,1] fractions
      "boilerplate_per_source:doc_share", "bpe_encode_stats:fertility",
      "corpus_datacard:en_share", "dedup_dup_ngram_fraction:dup_fraction",
      "dedup_savings_report:savings_ratio", "ngram_novelty:novelty",
      "pack_boundary_stats:spanning_fraction", "q8_market_share:mkt_share",
      "split_ngram_leakage:leak_fraction", "lexical_diversity:avg_ttr",
      "quality_percentile_by_source_exact:pct_rank", "token_zipf_fit:r2",
      "text_quality:avg_token_len", "text_quality:stopword_ratio",
      "text_quality_classifier:clf_score", // sigmoid output in (0,1)
      "text_repetition_filters:dup_line_frac",
      "text_repetition_filters:dup_line_char_frac",
      "text_repetition_filters:symbol_word_ratio",
      "text_repetition_filters:mean_word_len",
      "text_repetition_filters:alpha_word_frac",
      "quality_threshold_sweep:threshold", // generate_series 0..10 / 10
      "sample_temperature:w_tau07", "sample_temperature:w_tau03",
      "source_quality_report:avg_chars", "events_transition_counts:n_pairs",
      // Jaccard in [0,1] (shared verify CTE across the dedup family)
      "dedup_cluster_sizes:jac", "dedup_clusters:jac",
      "dedup_cross_source:jac", "dedup_drop_list:jac",
      "dedup_estimate_vs_exact:jac", "dedup_minhash_estimate:jac",
      "dedup_minhash_lsh:jac", "dedup_ngram_jaccard:jac",
      "dedup_savings_report:jac", "dedup_similarity_histogram:jac",
      "dedup_similarity_histogram:avg_jac", "dedup_threshold_sweep:jac",
      "lsh_band_stats:jac",
      // nonnegative magnitudes: variance shares, norms, squared dists,
      // pixel means, RMS, price quantiles, per-count averages
      "embed_dim_variance:var_share", "embed_norm_stats:min_norm",
      "embed_norm_stats:max_norm", "embed_norm_stats:avg_norm",
      "embed_ivfpq_knn:pq_dist", "embed_pq_knn:pq_dist",
      "embed_pq_recall:pq_dist",
      "mm_ppm_features:mean_r", "mm_ppm_features:mean_g",
      "mm_ppm_features:mean_b", "mm_ppm_resize:mean_r",
      "mm_ppm_resize:mean_g", "mm_ppm_resize:mean_b",
      "mm_video_frames:mean_r", "mm_video_frames:mean_g",
      "mm_video_frames:mean_b", "mm_wav_features:rms",
      "mm_wav_resample:rms",
      "orders_value_quartiles:c75", "orders_value_quartiles:c50",
      "orders_value_quartiles:c25",
      "q1_pricing_summary:avg_qty", "q1_pricing_summary:avg_price",
      "q1_pricing_summary:avg_disc",
      // tf * ln(n/df) with df <= n so ln >= 0
      "tfidf_top_terms:tfidf",
      // quality score = 0.5*min(len/100,1) + 0.5*(1 - stopword_ratio),
      // both halves in [0, 0.5] (shared CTE across the quality family)
      "corpus_datacard:qs", "curriculum_order:qs", "dedup_drop_list:qs",
      "dedup_savings_report:qs", "quality_lm_correlation:qs",
      "quality_threshold_sweep:qs", "sample_weighted:w",
      "quality_percentile_by_source:quality_score",
      "quality_percentile_by_source_exact:quality_score",
      "text_quality:quality_score",
      // more [0,1] fractions / nonnegative means over count domains
      "corpus_datacard:dup_rate", "corpus_datacard:mean_quality",
      "dedup_containment:containment", "embed_dim_variance:variance",
      "embed_ivf_recall:recall_at_k", "embed_ivf_recall_curve:mean_recall",
      "embed_matryoshka_recall:recall_at_k",
      "embed_mrl_rerank_recall:recall_at_k", "embed_pq_recall:recall_at_k",
      "embed_sq8_recall:recall_at_k", "embed_label_confusion:share",
      "langid_confusion:share", "source_quality_report:dup_rate",
      "source_quality_report:avg_tokens", "text_gram_entropy:ttr",
      "vocab_coverage_sweep:coverage")
    val offenders = for {
      (k, s) <- graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      collapsed = s.replaceAll("\\s+", " ")
      (tail, ctx) <- roundTails(collapsed)
      // `) + 0.0` immediately after the round's own close = normalized.
      if !tail.startsWith(" + 0.0")
      // the exact-decimal wrapper (sqlRx): round over a DECIMAL(38,18)
      // parsed from the double's shortest VARCHAR repr — exact HALF_UP,
      // and DECIMAL cannot carry -0.0, so it is normalized by construction
      if !ctx.contains("DECIMAL(38,18)")
      m <- "^ AS (\\w+)".r.findFirstMatchIn(tail)
      colName = m.group(1)
      if !SignlessCastTypes.contains(colName)
      if !UnsignedPairs.contains(s"$k:$colName")
    } yield s"$k: ...$ctx..."
    assert(
      offenders.isEmpty,
      s"bare signed round() in oracle SQL (normalize with `+ 0.0` or prove " +
        s"unsigned and allowlist):\n${offenders.mkString("\n")}")

    // and rounds that feed arithmetic (not directly aliased) must also
    // resolve to a `+ 0.0` somewhere before the alias — flag chains like
    // `round(a, 6) + round(b, 6) AS c` where -0.0 survives addition of
    // two negative zeros. A following comparison/ORDER BY/paren boundary
    // is fine: only SELECT-list outputs reach the hash compare.
    val chained = for {
      (k, s) <- graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      collapsed = s.replaceAll("\\s+", " ")
      (tail, ctx) <- roundTails(collapsed)
      if tail.startsWith(" + round(") && !tail.contains("+ 0.0")
      if tail.contains(" AS ")
    } yield s"$k: ...$ctx..."
    assert(chained.isEmpty,
      s"sum-of-rounds without normalizer:\n${chained.mkString("\n")}")
  }

  test("guard self-check: a planted multi-line bare signed round is caught") {
    // the exact evasion ADVICE r8 flagged: `round(...,` newline `6) AS x`
    val planted = "SELECT round(ln(x)/w,\n    6) AS brand_new_signed FROM t"
    val collapsed = planted.replaceAll("\\s+", " ")
    val hits = roundTails(collapsed).flatMap { case (tail, _) =>
      "^ AS (\\w+)".r.findFirstMatchIn(tail).map(_.group(1))
    }
    assert(hits === Seq("brand_new_signed"))
    // and the normalized form is NOT flagged
    val ok = "SELECT round(ln(x)/w, 6) + 0.0 AS fine FROM t"
    assert(roundTails(ok).forall { case (tail, _) => tail.startsWith(" + 0.0") })
  }
}
